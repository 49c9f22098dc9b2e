from caiman_asr_tpu.latency.timestamp import (
    EOS,
    Never,
    PerWordTimestamp,
    SequenceTimestamp,
    Silence,
    WordTimestamps,
    frame_to_time,
    group_timestamps,
)

__all__ = [
    "EOS",
    "Never",
    "Silence",
    "PerWordTimestamp",
    "WordTimestamps",
    "SequenceTimestamp",
    "frame_to_time",
    "group_timestamps",
]
