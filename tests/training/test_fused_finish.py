"""Fused LAMB finish == the optax chain, leaf for leaf.

The fused path (training/fused_finish.py) re-derives the whole
clip -> adam -> weight-decay -> trust-ratio -> schedule -> lr-factor ->
EMA -> non-finite-skip pipeline as three bandwidth-minimal passes; these
tests pin it to the optax implementation it replaces, including the state
structure (checkpoint compatibility) and the skip gate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from caiman_asr_tpu.training.optimizer import (
    OptimizerConfig,
    build_optimizer,
    fused_spec_for,
)
from caiman_asr_tpu.training.fused_finish import (
    fused_lamb_ema_update,
    probe_supported,
)


def _tree(key, spec):
    """Random param-like tree: dict of modules -> dict of leaves."""
    out = {}
    for mod, shapes in spec.items():
        out[mod] = {}
        for name, shape in shapes.items():
            key, k = jax.random.split(key)
            out[mod][name] = jax.random.normal(k, shape, jnp.float32)
    return out


SPEC = {
    "encoder": {"w": (16, 24), "b": (24,)},
    "prediction": {"w": (8, 12)},
    "joint_fc": {"w": (12, 32), "b": (32,)},
}


def _optax_finish(params, ema, opt_state, grads, good, tx, ema_decay):
    """The pre-fusion reference semantics (training/step.py optax path)."""
    grads = jax.tree.map(jnp.nan_to_num, grads)
    grad_norm = optax.global_norm(grads)
    updates, new_opt = tx.update(grads, opt_state, params)
    new_p = optax.apply_updates(params, updates)
    new_e = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, new_p
    )
    pick = lambda a, b: jax.tree.map(lambda x, y: jnp.where(good, x, y), a, b)
    return (
        pick(new_p, params),
        pick(new_e, ema),
        pick(new_opt, opt_state),
        grad_norm,
    )


def _assert_close(a, b, rtol=2e-5, atol=2e-6, what=""):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=rtol, atol=atol, err_msg=what,
        )


@pytest.mark.parametrize("clip_norm", [1.0, None])
@pytest.mark.parametrize("factors", [None, {"encoder": 2.0, "prediction": 0.5}])
def test_fused_matches_optax_over_steps(clip_norm, factors):
    cfg = OptimizerConfig(clip_norm=clip_norm, warmup_steps=3, hold_steps=4,
                          half_life_steps=5)
    tx = build_optimizer(cfg, factors)
    spec = fused_spec_for(tx)
    assert spec is not None
    _, _, schedule = spec

    key = jax.random.PRNGKey(0)
    params = _tree(key, SPEC)
    ema = jax.tree.map(jnp.copy, params)
    opt_a = tx.init(params)
    opt_b = tx.init(params)
    assert probe_supported(opt_a)
    p_a, e_a = params, ema
    p_b, e_b = params, ema

    good = jnp.asarray(True)
    for step in range(6):
        gkey = jax.random.fold_in(key, 100 + step)
        grads = _tree(gkey, SPEC)
        if step == 2:
            # big grads: the global-norm clip must trigger on both paths
            grads = jax.tree.map(lambda g: g * 100.0, grads)
        p_a, e_a, opt_a, gn_a = _optax_finish(
            p_a, e_a, opt_a, grads, good, tx, cfg.ema)
        p_b, e_b, opt_b, gn_b = fused_lamb_ema_update(
            p_b, e_b, opt_b, grads, good, cfg, factors, schedule, cfg.ema)
        np.testing.assert_allclose(float(gn_a), float(gn_b), rtol=1e-6)
        _assert_close(p_a, p_b, what=f"params step {step}")
        _assert_close(e_a, e_b, what=f"ema step {step}")
        _assert_close(opt_a, opt_b, what=f"opt state step {step}")
    # counts actually advanced
    from caiman_asr_tpu.training.fused_finish import extract_opt_state

    adam_s, sched_s = extract_opt_state(opt_b)
    assert int(adam_s.count) == 6 and int(sched_s.count) == 6


def test_skip_gate_freezes_everything():
    cfg = OptimizerConfig()
    tx = build_optimizer(cfg, None)
    _, _, schedule = fused_spec_for(tx)
    key = jax.random.PRNGKey(1)
    params = _tree(key, SPEC)
    ema = jax.tree.map(lambda p: p * 0.9, params)
    opt = tx.init(params)
    # one good step first so moments are non-zero
    g1 = _tree(jax.random.fold_in(key, 7), SPEC)
    p1, e1, o1, _ = fused_lamb_ema_update(
        params, ema, opt, g1, jnp.asarray(True), cfg, None, schedule, cfg.ema)
    # then a bad step: everything must come back unchanged
    g2 = jax.tree.map(lambda g: g * jnp.nan, g1)
    p2, e2, o2, _ = fused_lamb_ema_update(
        p1, e1, o1, g2, jnp.asarray(False), cfg, None, schedule, cfg.ema)
    _assert_close(p1, p2, rtol=0, atol=0, what="params frozen")
    _assert_close(e1, e2, rtol=0, atol=0, what="ema frozen")
    _assert_close(o1, o2, rtol=0, atol=0, what="opt state frozen")


def test_skip_gate_inf_grads_no_clip():
    """Skipped step with INF gradients and clipping DISABLED: nan_to_num
    maps inf to ~3.4e38, whose square overflows nu2 to inf — the moment
    gate must be a predicate select, not `v + goodf*(nu2 - v)` (0*inf =
    NaN would permanently poison the adam second moment). Advisor r3."""
    cfg = OptimizerConfig(clip_norm=None)
    tx = build_optimizer(cfg, None)
    _, _, schedule = fused_spec_for(tx)
    key = jax.random.PRNGKey(4)
    params = _tree(key, SPEC)
    ema = jax.tree.map(lambda p: p * 0.9, params)
    opt = tx.init(params)
    g1 = _tree(jax.random.fold_in(key, 7), SPEC)
    p1, e1, o1, _ = fused_lamb_ema_update(
        params, ema, opt, g1, jnp.asarray(True), cfg, None, schedule, cfg.ema)
    g2 = jax.tree.map(lambda g: g * jnp.inf, g1)  # +/-inf entries
    p2, e2, o2, _ = fused_lamb_ema_update(
        p1, e1, o1, g2, jnp.asarray(False), cfg, None, schedule, cfg.ema)
    for leaf in jax.tree.leaves((p2, e2, o2)):
        assert np.all(np.isfinite(np.asarray(leaf, np.float64)))
    _assert_close(p1, p2, rtol=0, atol=0, what="params frozen")
    _assert_close(e1, e2, rtol=0, atol=0, what="ema frozen")
    _assert_close(o1, o2, rtol=0, atol=0, what="opt state frozen")
    # the optax reference agrees leaf-for-leaf on the same inputs
    opt_ref = tx.init(params)
    p1r, e1r, o1r, _ = _optax_finish(
        params, ema, opt_ref, g1, jnp.asarray(True), tx, cfg.ema)
    p2r, e2r, o2r, _ = _optax_finish(
        p1r, e1r, o1r, g2, jnp.asarray(False), tx, cfg.ema)
    _assert_close(p2, p2r, what="params vs optax")
    _assert_close(e2, e2r, what="ema vs optax")
    _assert_close(o2, o2r, what="opt vs optax")


def test_nonfinite_grads_do_not_poison():
    """inf/nan gradient entries hit the same nan_to_num envelope as the
    optax path (good stays True here: loss finite, grads poisoned)."""
    cfg = OptimizerConfig()
    tx = build_optimizer(cfg, None)
    _, _, schedule = fused_spec_for(tx)
    key = jax.random.PRNGKey(2)
    params = _tree(key, SPEC)
    ema = jax.tree.map(jnp.copy, params)
    opt_a = tx.init(params)
    opt_b = tx.init(params)
    grads = _tree(jax.random.fold_in(key, 3), SPEC)
    grads["encoder"]["w"] = grads["encoder"]["w"].at[0, 0].set(jnp.nan)
    good = jnp.asarray(True)
    pa, ea, oa, gna = _optax_finish(params, ema, opt_a, grads, good, tx, cfg.ema)
    pb, eb, ob, gnb = fused_lamb_ema_update(
        params, ema, opt_b, grads, good, cfg, None, schedule, cfg.ema)
    np.testing.assert_allclose(float(gna), float(gnb), rtol=1e-6)
    _assert_close(pa, pb)
    _assert_close(ea, eb)
    _assert_close(oa, ob)
    assert np.all(np.isfinite(np.asarray(pb["encoder"]["w"])))


def test_train_step_env_toggle_equivalence(monkeypatch, tmp_path):
    """End-to-end: make_train_step with the fused path ON vs OFF produces
    the same state evolution on a tiny model (integration wiring check)."""
    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.training.step import init_train_state, make_train_step

    cfg = RNNTModelConfig(
        in_feats=8, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
        enc_stack_time_factor=2, pred_n_hid=12, pred_rnn_layers=1,
        joint_n_hid=16,
    )
    model = RNNT(cfg, 24)
    ocfg = OptimizerConfig(warmup_steps=2, hold_steps=2, half_life_steps=2)
    rng = np.random.default_rng(0)
    T, B, U = 12, 3, 5
    batch = {
        "feats": jnp.asarray(rng.normal(size=(1, T, B, 8)), jnp.float32),
        "feat_lens": jnp.full((1, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, 22, (1, B, U)), jnp.int32),
        "txt_lens": jnp.full((1, B), U, jnp.int32),
    }
    scalars = {"delay_penalty": jnp.zeros(()), "star_penalty": jnp.zeros(()),
               "grad_noise_std": jnp.zeros(())}
    key = jax.random.PRNGKey(3)

    results = {}
    for env in ("1", "0"):
        monkeypatch.setenv("CAIMAN_FUSED_FINISH", env)
        tx = build_optimizer(ocfg, model.param_lr_factors())
        state = init_train_state(model, tx, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, blank_idx=23, donate=False)
        for _ in range(3):
            state, metrics = step(state, batch, key, scalars)
        results[env] = (state, metrics)
    s1, m1 = results["1"]
    s0, m0 = results["0"]
    _assert_close(s1.params, s0.params, what="params")
    _assert_close(s1.ema_params, s0.ema_params, what="ema")
    _assert_close(s1.opt_state, s0.opt_state, what="opt")
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m0["grad_norm"]),
                               rtol=1e-5)
    assert int(s1.step) == 3
