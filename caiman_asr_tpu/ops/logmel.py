"""Log-mel filterbank front-end, JAX/TPU-native.

Replaces the reference's NVIDIA-DALI GPU pipeline
(training/caiman_asr_train/data/dali/pipeline.py:359-470) with a jit-compiled
batched front-end. Semantics follow the reference graph:

  initial zero padding of ``sr * (window_size - window_stride)`` samples
  (pipeline.py:263-268 — the deployed ASR server pads the stream start the
  same way) -> dither (additive N(0,1) * coeff) -> pre-emphasis 0.97 with
  clamped border -> power spectrogram (n_fft 512, 25 ms window / 10 ms step,
  Hann window, no centering) -> 80-bin mel filterbank (Slaney scale,
  area-normalised, matching DALI MelFilterBank normalize=True) -> natural-log
  with a 1e-20 floor (DALI ToDecibels with multiplier ln(10) is exactly ln x,
  pipeline.py:297-302) -> per-feature normalization (see mel_normalization).

TPU-first notes: framing is a reshape-free strided gather that XLA turns into
an efficient windowed load; the DFT is evaluated as two real matmuls against
fixed cos/sin bases ([win, n_bins]), which lands on the MXU and, for the
512-point size used here, beats the generic FFT path while fusing with the
mel-projection matmul that follows.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LOG_CUTOFF = np.log(1e-20)


@dataclass(frozen=True)
class LogMelConfig:
    """Filterbank config (reference: configs/*.yaml filterbank_features)."""

    sample_rate: int = 16000
    window_size: float = 0.025
    window_stride: float = 0.01
    n_fft: int = 512
    n_mels: int = 80
    dither: float = 1e-5
    preemph: float = 0.97
    initial_padding: bool = True
    final_padding_secs: float = 0.0

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)

    @property
    def n_initial_zeros(self) -> int:
        return int(self.sample_rate * (self.window_size - self.window_stride))

    def num_frames(self, n_samples: int) -> int:
        """Frame count with center_windows=False (DALI semantics)."""
        return max(0, (n_samples - self.win_length) // self.hop_length + 1)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.stft / DALI defaults)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-scale, area-normalised triangular mel filterbank [n_bins, n_mels].

    Matches DALI MelFilterBank(normalize=True) / librosa(htk=False,
    norm='slaney').
    """
    fmax = fmax or sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        # Slaney: linear below 1 kHz, log above.
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        mel = f / f_sp
        above = f >= min_log_hz
        mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        f = m * f_sp
        above = m >= min_log_mel
        return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # Slaney area normalization: scale each filter to constant energy.
        fb[:, m] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def dft_bases(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases [win_length, n_bins] for matmul-based rFFT
    (window zero-padded to n_fft, so only the first win_length rows matter)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(win_length)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class LogMelFrontend:
    """Batched, jit-compiled log-mel feature extractor.

    Call with raw waveforms [B, S] (zero-padded) and sample lengths [B].
    Returns (feats [B, n_mels, T], frame_lens [B]).
    """

    def __init__(self, config: LogMelConfig = LogMelConfig()):
        self.config = config
        cos_b, sin_b = dft_bases(config.n_fft, config.win_length)
        win = hann_window(config.win_length)[:, None]
        # Fold window into the DFT bases, then fold the mel projection in:
        # power = (x@C)^2 + (x@S)^2; mel = power @ FB.
        self._cos = jnp.asarray(cos_b * win)
        self._sin = jnp.asarray(sin_b * win)
        self._fb = jnp.asarray(mel_filterbank(config.sample_rate, config.n_fft, config.n_mels))
        self._fn = jax.jit(self._compute)

    def __call__(self, audio, audio_lens, dither_rng=None):
        if dither_rng is None:
            dither_rng = jax.random.PRNGKey(0)
        return self._fn(jnp.asarray(audio), jnp.asarray(audio_lens), dither_rng)

    def _compute(self, audio, audio_lens, dither_rng):
        cfg = self.config
        B, S = audio.shape
        nz = cfg.n_initial_zeros if cfg.initial_padding else 0
        if nz:
            audio = jnp.pad(audio, ((0, 0), (nz, 0)))
            audio_lens = audio_lens + nz
        nf = int(cfg.final_padding_secs * cfg.sample_rate)
        if nf:
            # Final padding is *inside* each utterance: zeros appended at the
            # end of the valid region. With right-zero-padded batches the
            # samples are already zero there; only the length changes.
            audio = jnp.pad(audio, ((0, 0), (0, nf)))
            audio_lens = audio_lens + nf
        S = audio.shape[1]

        if cfg.dither != 0.0:
            noise = jax.random.normal(dither_rng, audio.shape, audio.dtype)
            mask = (
                lax.broadcasted_iota(jnp.int32, audio.shape, 1)
                < audio_lens[:, None]
            )
            audio = audio + jnp.where(mask, noise * cfg.dither, 0.0)

        # Pre-emphasis with clamped border: y[0] = x[0] - c*x[0].
        prev = jnp.concatenate([audio[:, :1], audio[:, :-1]], axis=1)
        audio = audio - cfg.preemph * prev

        # Frame: [B, T, win]. XLA lowers this gather to strided loads.
        T = cfg.num_frames(S)
        starts = jnp.arange(T) * cfg.hop_length
        idx = starts[:, None] + jnp.arange(cfg.win_length)[None, :]
        frames = audio[:, idx]  # [B, T, win]

        re = jnp.einsum("btw,wk->btk", frames, self._cos)
        im = jnp.einsum("btw,wk->btk", frames, self._sin)
        power = re * re + im * im
        mel = jnp.einsum("btk,km->btm", power, self._fb)
        logmel = jnp.log(jnp.maximum(mel, 1e-20))

        frame_lens = jnp.maximum(
            0, (audio_lens - cfg.win_length) // cfg.hop_length + 1
        ).astype(jnp.int32)
        # Zero padded frames (beyond each utterance's frame count).
        t_ix = lax.broadcasted_iota(jnp.int32, logmel.shape, 1)
        logmel = jnp.where(t_ix < frame_lens[:, None, None], logmel, 0.0)
        return jnp.moveaxis(logmel, 1, 2), frame_lens  # [B, n_mels, T]


def normalize_batch(
    feats: jax.Array,
    frame_lens: jax.Array,
    dataset_mean: Optional[jax.Array] = None,
    dataset_std: Optional[jax.Array] = None,
    dataset_to_utt_ratio: float | jax.Array = 0.0,
    eps: float = 1e-9,
) -> jax.Array:
    """Blended per-feature normalization.

    Reference: data/dali/mel_normalization.py:30-125. ``ratio`` = 1 uses
    dataset stats only (streaming-compatible inference mode); 0 uses
    per-utterance stats; in between, linear blend of the two normalised
    outputs (not of the stats).

    feats: [B, n_mels, T]; frame_lens: [B].
    """
    B, M, T = feats.shape
    mask = (
        lax.broadcasted_iota(jnp.int32, (B, 1, T), 2) < frame_lens[:, None, None]
    )
    n = jnp.maximum(frame_lens[:, None, None].astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=2, keepdims=True) / n
    var = jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=2, keepdims=True) / n
    # DALI fn.normalize uses population std with Bessel's correction off by
    # default? It uses ddof=0; follow that.
    utt = (feats - mean) * lax.rsqrt(var + eps)

    ratio = jnp.asarray(dataset_to_utt_ratio, jnp.float32)
    if dataset_mean is None:
        out = utt
    else:
        ds = (feats - dataset_mean[None, :, None]) / (
            dataset_std[None, :, None] + eps
        )
        out = ratio * ds + (1.0 - ratio) * utt
    return jnp.where(mask, out, 0.0)
