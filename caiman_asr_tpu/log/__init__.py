from caiman_asr_tpu.log.logger import MetricLogger, init_log
from caiman_asr_tpu.log.tee import tee_stdout_to_file

__all__ = ["MetricLogger", "init_log", "tee_stdout_to_file"]
