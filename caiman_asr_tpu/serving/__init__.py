from caiman_asr_tpu.serving.engine import StreamingEngine

__all__ = ["StreamingEngine"]
