from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig  # noqa: F401
from caiman_asr_tpu.models.state import EncoderState, PredNetState, RNNTState  # noqa: F401
