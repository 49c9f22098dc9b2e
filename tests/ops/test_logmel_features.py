"""Frontend and feature-processing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.ops.features import (
    SpecAugmentConfig,
    spec_augment,
    stack_subsample_frames,
    stack_time,
)
from caiman_asr_tpu.ops.logmel import (
    LogMelConfig,
    LogMelFrontend,
    hann_window,
    mel_filterbank,
    normalize_batch,
)


def numpy_logmel(audio, cfg: LogMelConfig):
    """Independent numpy reference using np.fft.rfft (no dither)."""
    nz = cfg.n_initial_zeros
    audio = np.concatenate([np.zeros(nz, np.float32), audio])
    prev = np.concatenate([audio[:1], audio[:-1]])
    audio = audio - cfg.preemph * prev
    win = hann_window(cfg.win_length)
    T = cfg.num_frames(len(audio))
    frames = np.stack(
        [audio[t * cfg.hop_length : t * cfg.hop_length + cfg.win_length] for t in range(T)]
    )
    spec = np.fft.rfft(frames * win, n=cfg.n_fft, axis=1)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels)
    mel = power @ fb
    return np.log(np.maximum(mel, 1e-20)).T  # [n_mels, T]


def test_logmel_matches_numpy_fft():
    cfg = LogMelConfig(dither=0.0)
    rng = np.random.default_rng(0)
    S = 16000  # 1 second
    audio = rng.normal(size=(2, S)).astype(np.float32) * 0.1
    audio[1, 12000:] = 0.0
    lens = np.array([S, 12000], np.int32)

    fe = LogMelFrontend(cfg)
    feats, frame_lens = fe(audio, lens)
    feats = np.asarray(feats)

    want0 = numpy_logmel(audio[0], cfg)
    T0 = want0.shape[1]
    np.testing.assert_allclose(feats[0, :, :T0], want0, rtol=1e-3, atol=1e-3)

    # Frame lengths follow (len + nz - win) // hop + 1.
    nz = cfg.n_initial_zeros
    want_len = (lens + nz - cfg.win_length) // cfg.hop_length + 1
    np.testing.assert_array_equal(np.asarray(frame_lens), want_len)
    # Padding region is zeroed.
    assert np.all(feats[1, :, int(frame_lens[1]):] == 0.0)


def test_logmel_dither_changes_output_only_slightly():
    cfg = LogMelConfig(dither=1e-5)
    audio = np.random.default_rng(1).normal(size=(1, 8000)).astype(np.float32)
    fe = LogMelFrontend(cfg)
    f1, _ = fe(audio, np.array([8000]), jax.random.PRNGKey(0))
    f2, _ = fe(audio, np.array([8000]), jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    assert np.abs(np.asarray(f1) - np.asarray(f2)).mean() < 0.1


def test_normalize_batch_utterance_stats():
    rng = np.random.default_rng(2)
    feats = rng.normal(loc=3.0, scale=2.0, size=(2, 4, 50)).astype(np.float32)
    lens = np.array([50, 30], np.int32)
    feats[1, :, 30:] = 0.0
    out = np.asarray(normalize_batch(jnp.asarray(feats), jnp.asarray(lens)))
    # Valid region: per-feature mean ~0, std ~1.
    np.testing.assert_allclose(out[0].mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0].std(axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(out[1, :, :30].mean(axis=1), 0.0, atol=1e-5)
    assert np.all(out[1, :, 30:] == 0.0)


def test_normalize_batch_blend_endpoints():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(1, 4, 20)).astype(np.float32))
    lens = jnp.asarray([20])
    mean = jnp.asarray(rng.normal(size=4).astype(np.float32))
    std = jnp.asarray(rng.uniform(1, 2, size=4).astype(np.float32))
    ds_only = normalize_batch(feats, lens, mean, std, dataset_to_utt_ratio=1.0)
    want = (np.asarray(feats) - np.asarray(mean)[None, :, None]) / (
        np.asarray(std)[None, :, None] + 1e-9
    )
    np.testing.assert_allclose(np.asarray(ds_only), want, rtol=1e-5)
    utt_only = normalize_batch(feats, lens, mean, std, dataset_to_utt_ratio=0.0)
    np.testing.assert_allclose(
        np.asarray(utt_only), np.asarray(normalize_batch(feats, lens)), rtol=1e-5
    )


def test_stack_subsample_matches_naive():
    rng = np.random.default_rng(4)
    B, M, T = 2, 3, 10
    x = rng.normal(size=(B, M, T)).astype(np.float32)
    lens = np.array([10, 7], np.int32)
    got, got_lens = stack_subsample_frames(jnp.asarray(x), jnp.asarray(lens), 3, 3)
    # Naive: stack 3 shifted copies along features, take every 3rd frame.
    parts = [x]
    for n in (1, 2):
        t = np.zeros_like(x)
        t[:, :, :-n] = x[:, :, n:]
        parts.append(t)
    want = np.concatenate(parts, axis=1)[:, :, ::3]
    np.testing.assert_allclose(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(got_lens), [4, 3])


def test_stack_time_matches_naive():
    rng = np.random.default_rng(5)
    T, B, H = 9, 2, 4
    x = rng.normal(size=(T, B, H)).astype(np.float32)
    lens = np.array([9, 5], np.int32)
    got, got_lens = stack_time(jnp.asarray(x), jnp.asarray(lens), 2)
    parts = [x]
    t = np.zeros_like(x)
    t[:-1] = x[1:]
    parts.append(t)
    want = np.concatenate(parts, axis=2)[::2]
    np.testing.assert_allclose(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(got_lens), [5, 3])


def test_spec_augment_masks_and_preserves_shape():
    rng = np.random.default_rng(6)
    B, M, T = 3, 80, 100
    feats = jnp.asarray(rng.normal(size=(B, M, T)).astype(np.float32) + 5.0)
    lens = jnp.asarray([100, 80, 60])
    cfg = SpecAugmentConfig(freq_masks=2, max_freq=20, time_masks=0.1, max_time=0.03)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, lens, cfg))
    assert out.shape == (B, M, T)
    # Some entries must be zeroed, most must be untouched.
    zeros = (out == 0.0).mean()
    assert 0.005 < zeros < 0.9
    # Different key -> different mask.
    out2 = np.asarray(spec_augment(jax.random.PRNGKey(1), feats, lens, cfg))
    assert not np.allclose(out, out2)
