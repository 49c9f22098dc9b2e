from caiman_asr_tpu.ops.lstm import init_lstm, run_lstm  # noqa: F401
