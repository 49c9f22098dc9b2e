"""Checkpoint round-trip, resume, fine-tune, partial, corruption fallback,
and averaging tests (reference: tests/export/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.export import Checkpointer, average_checkpoints, save_checkpoint
from caiman_asr_tpu.export.checkpointer import (
    apply_params,
    flatten_named,
    load_checkpoint,
    unflatten_named,
)
from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
from caiman_asr_tpu.training.step import init_train_state


@pytest.fixture(scope="module")
def state_and_opt():
    model = RNNT(
        RNNTModelConfig(
            in_feats=8, enc_n_hid=12, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=12,
        ),
        n_classes=10,
    )
    opt = build_optimizer(OptimizerConfig())
    state = init_train_state(model, opt, jax.random.PRNGKey(3))
    return state, opt


def tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": np.zeros(2)}, "d": np.arange(4)}
    assert tree_equal(unflatten_named(flatten_named(tree)), tree)


def test_save_load_resume(tmp_path, state_and_opt):
    state, opt = state_and_opt
    ck = Checkpointer(tmp_path)
    ck.save(
        state.params, state.ema_params, state.opt_state,
        epoch=1, step=42, best_wer=0.5, is_last=True,
        meta={"tokenizer_kw": {"sampling": 0.05}, "logmel_norm_weight": 0.3},
    )
    path = ck.last_checkpoint()
    assert path is not None
    p, e, o, meta = ck.load_for_resume(
        path, state.params, state.ema_params, state.opt_state
    )
    assert tree_equal(p, state.params)
    assert tree_equal(e, state.ema_params)
    assert tree_equal(o, state.opt_state)
    assert meta["step"] == 42 and meta["best_wer"] == 0.5
    assert meta["tokenizer_kw"] == {"sampling": 0.05}


def test_fine_tune_prefers_ema(tmp_path, state_and_opt):
    state, opt = state_and_opt
    bumped_ema = jax.tree.map(lambda x: x + 1.0, state.ema_params)
    save_checkpoint(tmp_path / "ft.npz", state.params, bumped_ema, None, {})
    ck = Checkpointer(tmp_path)
    p, _ = ck.load_for_fine_tune(tmp_path / "ft.npz", state.params)
    assert tree_equal(p, bumped_ema)


def test_partial_load(tmp_path, state_and_opt):
    state, opt = state_and_opt
    partial = {"joint_fc": state.params["joint_fc"]}
    save_checkpoint(tmp_path / "p.npz", partial, None, None, {})
    loaded, _, _, _ = load_checkpoint(tmp_path / "p.npz")
    with pytest.raises(ValueError):
        apply_params(state.params, loaded)
    merged = apply_params(state.params, loaded, allow_partial=True)
    assert tree_equal(merged, state.params)


def test_corrupted_last_fallback(tmp_path, state_and_opt):
    state, opt = state_and_opt
    ck = Checkpointer(tmp_path)
    good = ck.save(state.params, None, None, 0, 10, 1.0)
    (tmp_path / "last.npz").write_bytes(b"garbage")
    assert ck.last_checkpoint() == good


def test_averaging(tmp_path, state_and_opt):
    state, opt = state_and_opt
    p2 = jax.tree.map(lambda x: x + 2.0, state.params)
    save_checkpoint(tmp_path / "a.npz", state.params, None, None, {})
    save_checkpoint(tmp_path / "b.npz", p2, None, None, {})
    avg, avg_ema, _ = average_checkpoints([tmp_path / "a.npz", tmp_path / "b.npz"])
    expect = jax.tree.map(lambda x: np.asarray(x) + 1.0, state.params)
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_extra_state_roundtrip(tmp_path):
    """Auxiliary arrays (e.g. the RSP carried state) ride the checkpoint
    under extra/ and come back bit-exact; weight loaders ignore them."""
    import numpy as np

    from caiman_asr_tpu.export.checkpointer import (
        load_checkpoint,
        load_extra,
        save_checkpoint,
    )

    params = {"m": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    extra = {
        "rsp/0": np.full((2, 4), 1.5, np.float32),
        "rsp/1": np.asarray([[3]], np.int32),
    }
    path = tmp_path / "ck.npz"
    save_checkpoint(path, params, meta={"step": 7}, extra=extra)
    got = load_extra(path)
    assert sorted(got) == ["rsp/0", "rsp/1"]
    np.testing.assert_array_equal(got["rsp/0"], extra["rsp/0"])
    np.testing.assert_array_equal(got["rsp/1"], extra["rsp/1"])
    p, ema, opt, meta = load_checkpoint(path)
    assert meta["step"] == 7 and "m" in p
    # a checkpoint without extra state loads as an empty dict
    save_checkpoint(tmp_path / "ck2.npz", params)
    assert load_extra(tmp_path / "ck2.npz") == {}


def test_rsp_controller_fast_forward():
    """fast_forward reproduces the RNG/counter position of a live run."""
    from caiman_asr_tpu.training.rsp import RSPController

    a = RSPController([5, 0, 3], delay=2, seed=9)
    live = [a.gates(s, 4).tolist() for s in range(20)]
    b = RSPController([5, 0, 3], delay=2, seed=9)
    b.fast_forward(12, 4)
    resumed = [b.gates(s, 4).tolist() for s in range(12, 20)]
    assert resumed == live[12:]
