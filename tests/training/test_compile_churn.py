"""Pin the number of distinct train-step compilations on a realistic epoch.

Every distinct (padded batch shape, pack cap) pair is one XLA compile of the
full train step (pack_to is a static jit arg — ops/transducer_loss.py
`_packed_joint_scores` needs a static row cap; reference analogue:
apex packed TransducerJoint metadata, ref rnnt/loss.py:155-173). The loader
quantises batch shapes (data/loader.py:quantise) and `pack_cap` quantises
caps to >= dense_n/8, so the compile count must stay small on a realistic
duration distribution — this test pins it.
"""

import numpy as np

from caiman_asr_tpu.data.loader import quantise
from caiman_asr_tpu.models.config import PipelineConfig
from caiman_asr_tpu.models.rnnt import RNNTModelConfig
from caiman_asr_tpu.training.pack import enc_frame_lens, pack_cap

SR = 16000
MODEL_CFG = RNNTModelConfig(
    in_feats=240,
    enc_n_hid=32,
    enc_pre_rnn_layers=1,
    enc_post_rnn_layers=1,
    enc_stack_time_factor=2,
    pred_n_hid=32,
    pred_rnn_layers=1,
    joint_n_hid=32,
)


def _realistic_epoch(rng, n_utts):
    """LibriSpeech-like durations (lognormal, clipped 1-20 s) and token
    lengths (~2.8 subwords/s with per-utterance rate noise)."""
    durs = np.clip(rng.lognormal(mean=2.05, sigma=0.55, size=n_utts), 1.0, 20.0)
    rate = rng.normal(2.8, 0.4, size=n_utts).clip(1.2, 4.5)
    toks = np.maximum(1, (durs * rate).astype(np.int64))
    return durs, toks


def test_compile_keys_bounded_over_epoch():
    rng = np.random.default_rng(0)
    n_utts, B = 20_000, 32
    durs, toks = _realistic_epoch(rng, n_utts)

    # BucketingSampler order: sort by duration, batch contiguously, then
    # shuffle batch order (shape-irrelevant). data/sampler.py.
    order = np.argsort(durs)
    durs, toks = durs[order], toks[order]

    pipe = PipelineConfig()
    sample_quantum = int(2.0 * SR)  # loader defaults (data/loader.py:67-68)
    token_quantum = 32

    keys = set()
    for start in range(0, n_utts - B + 1, B):
        d = durs[start : start + B]
        u = toks[start : start + B]
        samples = (d * SR).astype(np.int64)
        max_s = quantise(int(samples.max()), sample_quantum, sample_quantum)
        max_u = quantise(int(u.max()), token_quantum, token_quantum)

        # dense lattice size from the PADDED shape, as train.py:376-412 does
        enc_t_pad = int(enc_frame_lens(np.asarray([max_s]), pipe, MODEL_CFG)[0])
        dense_n = B * enc_t_pad * (max_u + 1)
        enc = enc_frame_lens(samples, pipe, MODEL_CFG)
        nvalid = int(np.sum(enc * (u + 1)))
        cap = pack_cap(nvalid, dense_n)
        keys.add((max_s, max_u, cap))

    # 20k utts / 625 batches must compile only a handful of step variants.
    # Measured: ~30 keys with these quanta; pin with modest slack so a
    # regression (e.g. un-quantised caps -> one compile per batch) fails
    # loudly long before it hurts.
    assert len(keys) <= 60, f"{len(keys)} distinct compile keys: {sorted(keys)[:10]}"

    # And the cap quantisation itself: for one fixed shape, every possible
    # nvalid must map to <= ~8 distinct caps (pack.py bounds it by quantum
    # >= dense_n/8 plus the None branch).
    dense_n = 4_000_000
    caps = {pack_cap(nv, dense_n) for nv in range(1, dense_n, 9973)}
    assert len(caps) <= 9, f"{len(caps)} caps for one shape: {sorted(map(str, caps))}"
