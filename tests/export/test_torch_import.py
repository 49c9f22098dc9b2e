"""Torch .pt checkpoint converter: layout/gate-order equivalence against
torch.nn.LSTM itself, plus a full-checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from caiman_asr_tpu.export.torch_import import convert_checkpoint, convert_state_dict
from caiman_asr_tpu.export.checkpointer import load_checkpoint, apply_params
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.ops.lstm import run_lstm


def test_lstm_layout_matches_torch_forward():
    """The converted weights must make OUR recurrence reproduce torch's —
    this pins the [4H, in] layout and i,f,g,o gate order assumptions."""
    torch.manual_seed(0)
    I, H, L, T, B = 12, 16, 2, 9, 4
    tl = torch.nn.LSTM(I, H, num_layers=L)
    x = torch.randn(T, B, I)
    with torch.no_grad():
        ty, (th, tc) = tl(x)

    sd = {f"encoder.pre_rnn.lstm.{k}": v for k, v in tl.state_dict().items()}
    flat = convert_state_dict(sd)
    params = {}
    for k, v in flat.items():
        _, _, layer, field = k.split("/")
        params.setdefault(layer, {})[field] = jnp.asarray(v)

    y, (h_n, c_n), _ = run_lstm(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), th.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_n), tc.numpy(), rtol=1e-4, atol=1e-5)


def _torch_state_dict(cfg: RNNTModelConfig, n_classes: int, batch_norm: bool):
    """Synthesize a reference-shaped state_dict (module naming per
    reference rnnt/model.py + rnn.py)."""
    torch.manual_seed(1)
    sd = {}

    def lstm_stack(prefix, in_size, hid, layers):
        if batch_norm:
            for i in range(layers):
                one = torch.nn.LSTM(in_size if i == 0 else hid, hid)
                for k, v in one.state_dict().items():
                    sd[f"{prefix}.lstms.{i}.{k}"] = v
                bn = torch.nn.BatchNorm1d(hid)
                for k, v in bn.state_dict().items():
                    sd[f"{prefix}.batch_norms.{i}.{k}"] = v
        else:
            stack = torch.nn.LSTM(in_size, hid, num_layers=layers)
            for k, v in stack.state_dict().items():
                sd[f"{prefix}.lstm.{k}"] = v

    lstm_stack("encoder.pre_rnn", cfg.in_feats, cfg.enc_n_hid,
               cfg.enc_pre_rnn_layers)
    lstm_stack("encoder.post_rnn", cfg.enc_stack_time_factor * cfg.enc_n_hid,
               cfg.enc_n_hid, cfg.enc_post_rnn_layers)
    lstm_stack("prediction.dec_rnn", cfg.pred_n_hid, cfg.pred_n_hid,
               cfg.pred_rnn_layers)
    sd["prediction.embed.weight"] = torch.randn(n_classes - 1, cfg.pred_n_hid)
    for name, (o, i) in [("joint_enc", (cfg.joint_n_hid, cfg.enc_n_hid)),
                         ("joint_pred", (cfg.joint_n_hid, cfg.pred_n_hid))]:
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.1
        sd[f"{name}.bias"] = torch.randn(o) * 0.1
    sd["joint_net.2.weight"] = torch.randn(n_classes, cfg.joint_n_hid) * 0.1
    sd["joint_net.2.bias"] = torch.randn(n_classes) * 0.1
    return sd


@pytest.mark.slow
@pytest.mark.parametrize("batch_norm", [False, True])
def test_full_checkpoint_round_trip(tmp_path, batch_norm):
    cfg = RNNTModelConfig(
        in_feats=24, enc_n_hid=16, enc_pre_rnn_layers=2, enc_post_rnn_layers=2,
        enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
        enc_batch_norm=batch_norm, pred_batch_norm=batch_norm,
    )
    n_classes = 12
    sd = _torch_state_dict(cfg, n_classes, batch_norm)
    pt = tmp_path / "ref.pt"
    torch.save({"state_dict": sd, "ema_state_dict": sd, "step": 1234,
                "best_wer": 5.5}, pt)

    npz = tmp_path / "out.npz"
    meta = convert_checkpoint(str(pt), str(npz))
    assert meta["step"] == 1234

    loaded, ema, _, meta2 = load_checkpoint(npz)
    assert ema is not None and meta2["step"] == 1234
    model = RNNT(cfg, n_classes)
    params = apply_params(model.init(jax.random.PRNGKey(0)), loaded)
    # loaded weights drive a finite forward pass end to end
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3, 24)), jnp.float32)
    f, f_lens, _ = model.encode(params, x, jnp.full((3,), 8, jnp.int32))
    assert np.all(np.isfinite(np.asarray(f)))
    # spot-check one tensor survived verbatim
    np.testing.assert_array_equal(
        np.asarray(params["joint_fc"]["w"]), sd["joint_net.2.weight"].numpy()
    )
    if batch_norm:
        np.testing.assert_array_equal(
            np.asarray(params["encoder"]["pre_rnn"]["layer_0"]["bn"]["mean"]),
            sd["encoder.pre_rnn.batch_norms.0.running_mean"].numpy(),
        )


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unrecognised"):
        convert_state_dict({"mystery.weight": np.zeros((2, 2))})
