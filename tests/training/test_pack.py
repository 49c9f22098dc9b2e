"""Host-side lattice-size arithmetic must match the device pipeline exactly
(an undercount would silently drop lattice positions — guarded by the
in-kernel overflow poison, but the host formula itself is tested here)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.data.loader import FeaturePipeline
from caiman_asr_tpu.models.config import PipelineConfig
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.training.pack import enc_frame_lens, lattice_nvalid, pack_cap

MODEL_CFG = RNNTModelConfig(
    in_feats=240,
    enc_n_hid=16,
    enc_pre_rnn_layers=1,
    enc_post_rnn_layers=1,
    enc_stack_time_factor=2,
    pred_n_hid=16,
    pred_rnn_layers=1,
    joint_n_hid=16,
)


@pytest.mark.slow
def test_host_enc_lens_match_device():
    pipe = PipelineConfig()
    fp = FeaturePipeline(pipe, train=False)
    model = RNNT(MODEL_CFG, n_classes=32)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B = 5
    audio_lens = np.asarray(
        [1600, 4000, 16000, 16001, 12345], np.int32
    )
    S = int(audio_lens.max())
    audio = rng.normal(size=(B, S)).astype(np.float32)
    for b in range(B):
        audio[b, audio_lens[b]:] = 0.0

    feats, frame_lens = fp(audio, audio_lens)
    U = 4
    txt = jnp.zeros((B, U), jnp.int32)
    (f, f_lens), _, _ = model.enc_pred(
        params, feats, frame_lens, txt, jnp.full((B,), U, jnp.int32), train=False
    )
    host = enc_frame_lens(audio_lens, pipe, MODEL_CFG)
    np.testing.assert_array_equal(np.asarray(f_lens), host)

    token_lens = np.asarray([4, 0, 2, 4, 1])
    assert lattice_nvalid(audio_lens, token_lens, pipe, MODEL_CFG) == int(
        np.sum(np.asarray(f_lens) * (token_lens + 1))
    )


def test_pack_cap_policy():
    assert pack_cap(100, 1_000_000, quantum=1024) == 1024
    # not worth it when cap is close to dense
    assert pack_cap(950_000, 1_000_000, quantum=1024) is None
    # cap never exceeds dense
    assert pack_cap(999_999, 1_000_000, quantum=1 << 20, threshold=1.1) == 1_000_000
    # default quantum scales with dense_n (bounds recompiles to <= ~7 caps):
    # dense_n = 1e6 -> quantum 125_000, so nvalid 100 rounds up to one step
    assert pack_cap(100, 1_000_000) == 125_000
    assert pack_cap(126_000, 1_000_000) == 250_000
    # small dense_n keeps the absolute PACK_QUANTUM floor
    assert pack_cap(10, 80_000) == 16_384
