"""Noise augmentation tests (reference: tests/data/ noise tests)."""

import numpy as np
import pytest

from caiman_asr_tpu.data.audio import blend_noise
from caiman_asr_tpu.data.noise import (
    NO_NOISE_SNR,
    NoiseDataset,
    NoiseSampler,
    NoiseSchedule,
)


def test_sampler_prob_and_range():
    rng = np.random.default_rng(0)
    s = NoiseSampler(prob=1.0, rng=rng, low=10, high=20)
    snrs = [s.draw()[0] for _ in range(50)]
    assert all(10 <= x <= 20 for x in snrs)
    s0 = NoiseSampler(prob=0.0, rng=rng)
    assert all(s0.draw()[0] == NO_NOISE_SNR for _ in range(10))


def test_schedule_ramp():
    bg = NoiseSampler(1.0, np.random.default_rng(0))
    bb = NoiseSampler(1.0, np.random.default_rng(0))
    sched = NoiseSchedule(100, 100, 30, 60, background=bg, babble=bb)
    sched.adjust_snrs(50)
    assert bg.get_range() == (30, 60)
    sched.adjust_snrs(150)  # halfway: high 60->45, bg low 30->15, babble low 30->22
    lo, hi = bg.get_range()
    assert hi == 45 and lo == 15
    lo_b, hi_b = bb.get_range()
    assert hi_b == 45 and 22 <= lo_b <= 23
    sched.adjust_snrs(500)
    assert bg.get_range() == (0.0, 30.0)
    assert bb.get_range() == (15.0, 30.0)


def test_blend_snr_accuracy():
    rng = np.random.default_rng(0)
    sig = rng.normal(size=16000).astype(np.float32)
    noise = rng.normal(size=8000).astype(np.float32) * 0.5
    out = blend_noise(rng, sig, noise, target_snr_db=10.0)
    added = out - sig
    snr = 10 * np.log10((sig**2).mean() / (added**2).mean())
    assert abs(snr - 10.0) < 0.5


def test_noise_dataset(tmp_path):
    import wave

    for i in range(3):
        with wave.open(str(tmp_path / f"n{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.random.default_rng(i).normal(size=800) * 3000)
                          .astype(np.int16).tobytes())
    ds = NoiseDataset(tmp_path, 16000)
    clip = ds.get(np.random.default_rng(0))
    assert clip.dtype == np.float32 and len(clip) == 800
    with pytest.raises(FileNotFoundError):
        NoiseDataset(tmp_path / "empty")
