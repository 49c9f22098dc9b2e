"""torch_export: our .npz -> reference torch .pt (inverse of torch_import).

Pins (1) exact key-set compatibility with a genuine torch build of the
reference architecture (so the reference's strict load_state_dict
accepts the export), (2) lossless round-trip through
torch_import.convert_state_dict, (3) the file-level CLI round trip.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from caiman_asr_tpu.export.checkpointer import (  # noqa: E402
    flatten_named,
    save_checkpoint,
    unflatten_named,
)
from caiman_asr_tpu.export.torch_export import (  # noqa: E402
    export_checkpoint,
    export_state_dict,
)
from caiman_asr_tpu.export.torch_import import convert_state_dict  # noqa: E402
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig  # noqa: E402

N_CLASSES = 32
CFG = RNNTModelConfig(
    in_feats=24,
    enc_n_hid=16,
    enc_pre_rnn_layers=2,
    enc_post_rnn_layers=2,
    enc_stack_time_factor=2,
    pred_n_hid=8,
    pred_rnn_layers=2,
    joint_n_hid=16,
)


def _reference_torch_keys(cfg, n_classes, batch_norm=False):
    """state_dict keys of a real torch build of the reference architecture
    (rnnt/model.py:184-225 + rnn.py:100-196 naming)."""
    keys = set()
    stacks = [
        ("encoder.pre_rnn", cfg.in_feats, cfg.enc_n_hid, cfg.enc_pre_rnn_layers),
        ("encoder.post_rnn", cfg.enc_stack_time_factor * cfg.enc_n_hid,
         cfg.enc_n_hid, cfg.enc_post_rnn_layers),
        ("prediction.dec_rnn", cfg.pred_n_hid, cfg.pred_n_hid,
         cfg.pred_rnn_layers),
    ]
    for name, in_f, hid, layers in stacks:
        if batch_norm:
            for i in range(layers):
                lstm = torch.nn.LSTM(in_f if i == 0 else hid, hid, 1)
                keys |= {f"{name}.lstms.{i}.{k}" for k in lstm.state_dict()}
                bn = torch.nn.BatchNorm1d(in_f if i == 0 else hid)
                keys |= {f"{name}.batch_norms.{i}.{k}" for k in bn.state_dict()}
        else:
            lstm = torch.nn.LSTM(in_f, hid, layers)
            keys |= {f"{name}.lstm.{k}" for k in lstm.state_dict()}
    for name, i, o in [
        ("joint_enc", cfg.enc_n_hid, cfg.joint_n_hid),
        ("joint_pred", cfg.pred_n_hid, cfg.joint_n_hid),
        ("joint_net.2", cfg.joint_n_hid, n_classes),
    ]:
        keys |= {f"{name}.{k}"
                 for k in torch.nn.Linear(i, o).state_dict()}
    keys.add("prediction.embed.weight")
    return keys


@pytest.mark.parametrize("batch_norm", [False, True])
def test_exported_keys_load_into_reference_architecture(batch_norm):
    cfg = (
        dataclasses.replace(CFG, enc_batch_norm=True, pred_batch_norm=True)
        if batch_norm
        else CFG
    )
    model = RNNT(cfg, N_CLASSES)
    params = model.init(jax.random.PRNGKey(0))
    sd = export_state_dict(params)
    want = _reference_torch_keys(cfg, N_CLASSES, batch_norm)
    assert set(sd) == want
    # and shapes agree with the torch modules' own state dicts
    lstm = torch.nn.LSTM(cfg.in_feats, cfg.enc_n_hid, cfg.enc_pre_rnn_layers)
    if not batch_norm:
        for k, v in lstm.state_dict().items():
            assert sd[f"encoder.pre_rnn.lstm.{k}"].shape == tuple(v.shape)


def test_round_trip_through_torch_import():
    model = RNNT(CFG, N_CLASSES)
    params = model.init(jax.random.PRNGKey(1))
    back = unflatten_named(convert_state_dict(export_state_dict(params)))
    flat_a = flatten_named(params)
    flat_b = flatten_named(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_round_trip_batch_norm_variant():
    cfg = dataclasses.replace(CFG, enc_batch_norm=True, pred_batch_norm=True)
    model = RNNT(cfg, N_CLASSES)
    params = model.init(jax.random.PRNGKey(2))
    back = unflatten_named(convert_state_dict(export_state_dict(params)))
    flat_a = flatten_named(params)
    flat_b = flatten_named(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_pruned_heads_are_dropped():
    from caiman_asr_tpu.ops.pruned_loss import init_simple_params

    model = RNNT(CFG, N_CLASSES)
    params = model.init(jax.random.PRNGKey(3))
    params.update(
        init_simple_params(jax.random.PRNGKey(4), CFG.joint_n_hid, N_CLASSES)
    )
    sd = export_state_dict(params)
    assert not any(k.startswith("simple_") for k in sd)


def test_cli_file_round_trip(tmp_path):
    from caiman_asr_tpu.export.torch_import import convert_checkpoint

    model = RNNT(CFG, N_CLASSES)
    params = model.init(jax.random.PRNGKey(5))
    ema = jax.tree.map(lambda x: x * 0.5, params)
    npz = tmp_path / "ckpt.npz"
    save_checkpoint(str(npz), params, ema_params=ema,
                    meta={"step": 123, "best_wer": 7.5})
    pt = tmp_path / "ckpt.pt"
    meta = export_checkpoint(str(npz), str(pt))
    assert meta["step"] == 123

    ckpt = torch.load(str(pt), map_location="cpu", weights_only=False)
    assert ckpt["step"] == 123 and ckpt["best_wer"] == 7.5
    assert ckpt["ema_state_dict"] is not None

    # and torch_import reads its own inverse back losslessly
    npz2 = tmp_path / "back.npz"
    convert_checkpoint(str(pt), str(npz2))
    from caiman_asr_tpu.export.checkpointer import load_checkpoint

    back, back_ema, _, meta2 = load_checkpoint(str(npz2))
    flat_a, flat_b = flatten_named(params), flatten_named(back)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])
    flat_e = flatten_named(back_ema)
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]) * 0.5, flat_e[k], rtol=1e-6, atol=1e-7
        )
