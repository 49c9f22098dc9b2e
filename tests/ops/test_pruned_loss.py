"""Pruned transducer loss tests (ops/pruned_loss.py).

Correctness anchors:
- the simple (factored) loss's per-cell scores equal a naive per-cell
  log-softmax over am + lm;
- the banded lattice with a full-width band equals the exact dense lattice
  (value AND gradients), across all penalty configurations;
- the full two-stage objective with prune_range >= U+1 and simple_scale=0
  equals the dense transducer loss from (f, g) exactly;
- pruning bounds satisfy the k2 feasibility invariants;
- a narrow band upper-bounds the exact NLL (pruning removes paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caiman_asr_tpu.ops.pruned_loss import (
    banded_rnnt_lattice,
    emit_posteriors,
    init_simple_params,
    prune_ranges,
    pruned_transducer_loss_from_fg,
    simple_lattice_scores,
)
from caiman_asr_tpu.ops.transducer_loss import (
    LossModifiers,
    _penalised_scores,
    rnnt_lattice,
    transducer_loss_from_fg,
)

# First entry (no modifiers) stays in the fast tier; the penalty variants
# each compile a distinct loss (~7-8 s on a 1-core host) and run as `slow`.
MODS = [
    LossModifiers(),
    pytest.param(LossModifiers(delay_penalty=0.1), marks=pytest.mark.slow),
    pytest.param(
        LossModifiers(eos_penalty=0.3, eos_idx=2, delay_penalty=0.05),
        marks=pytest.mark.slow,
    ),
    pytest.param(
        LossModifiers(star_penalty=-0.7, star_idx=3), marks=pytest.mark.slow
    ),
    pytest.param(
        LossModifiers(
            delay_penalty=0.1, eos_penalty=0.2, eos_idx=2,
            star_penalty=-0.5, star_idx=3,
        ),
        marks=pytest.mark.slow,
    ),
]


def _case(rng, B=3, T=9, U=5, K=13, ragged=True):
    labels = rng.integers(0, K - 1, size=(B, U)).astype(np.int32)
    if ragged:
        t_lens = rng.integers(U + 2, T + 1, size=B).astype(np.int32)
        u_lens = rng.integers(1, U + 1, size=B).astype(np.int32)
        t_lens[0], u_lens[0] = T, U
    else:
        t_lens = np.full(B, T, np.int32)
        u_lens = np.full(B, U, np.int32)
    return labels, t_lens, u_lens


def test_simple_scores_match_naive():
    rng = np.random.default_rng(0)
    B, T, U, K = 2, 6, 4, 9
    am = rng.normal(size=(B, T, K)).astype(np.float32) * 3
    lm = rng.normal(size=(B, U + 1, K)).astype(np.float32) * 3
    labels, _, _ = _case(rng, B=B, T=T, U=U, K=K)

    lp_b, lp_l = simple_lattice_scores(
        jnp.asarray(am), jnp.asarray(lm), jnp.asarray(labels), blank_idx=K - 1
    )
    lab_p = np.concatenate([labels, np.zeros((B, 1), np.int32)], axis=1)
    for b in range(B):
        for t in range(T):
            for u in range(U + 1):
                z = am[b, t] + lm[b, u]
                lp = z - np.log(np.exp(z - z.max()).sum()) - z.max()
                np.testing.assert_allclose(lp_b[b, t, u], lp[K - 1], atol=2e-5)
                np.testing.assert_allclose(
                    lp_l[b, t, u], lp[lab_p[b, u]], atol=2e-5
                )


@pytest.mark.parametrize("mods", MODS)
def test_full_band_equals_dense_lattice(mods):
    """ranges = 0, S = U+1: the banded lattice IS the dense lattice —
    value and custom-VJP gradients must match exactly."""
    rng = np.random.default_rng(1)
    B, T, U = 3, 9, 5
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U)
    lp_b = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    lp_l = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    null, emit = _penalised_scores(
        lp_b, lp_l, jnp.asarray(labels), jnp.asarray(t_lens), mods
    )
    ranges = jnp.zeros((B, T), jnp.int32)

    dense = rnnt_lattice(null, emit, jnp.asarray(t_lens), jnp.asarray(u_lens))
    banded = banded_rnnt_lattice(
        null, emit, ranges, jnp.asarray(t_lens), jnp.asarray(u_lens)
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(banded), rtol=1e-6)

    gd = jax.grad(lambda n, e: rnnt_lattice(
        n, e, jnp.asarray(t_lens), jnp.asarray(u_lens)).sum(), argnums=(0, 1)
    )(null, emit)
    gb = jax.grad(lambda n, e: banded_rnnt_lattice(
        n, e, ranges, jnp.asarray(t_lens), jnp.asarray(u_lens)).sum(),
        argnums=(0, 1),
    )(null, emit)
    for a, b in zip(gd, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_shifted_band_equals_dense_lattice():
    """A random feasible (non-trivial) band wide enough to cover the whole
    lattice row-by-row still reproduces the dense result when every valid
    cell lies inside the band."""
    rng = np.random.default_rng(2)
    B, T, U = 2, 7, 3
    S = U + 1  # full width, but exercise nonzero range starts on padded
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U)
    lp_b = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    lp_l = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    null, emit = _penalised_scores(
        lp_b, lp_l, jnp.asarray(labels), jnp.asarray(t_lens), LossModifiers()
    )
    # ranges must be 0 wherever u_len+1 == S (smax = 0) — the interesting
    # part is that prune_ranges output in this regime is all-zero and the
    # banded loss falls back to dense exactly.
    y = emit_posteriors(null, emit, jnp.asarray(t_lens), jnp.asarray(u_lens))
    ranges = prune_ranges(y, jnp.asarray(t_lens), jnp.asarray(u_lens), S)
    assert int(jnp.max(ranges)) == 0
    dense = rnnt_lattice(null, emit, jnp.asarray(t_lens), jnp.asarray(u_lens))
    banded = banded_rnnt_lattice(
        null, emit, ranges, jnp.asarray(t_lens), jnp.asarray(u_lens)
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(banded), rtol=1e-6)


def test_prune_ranges_feasible():
    rng = np.random.default_rng(3)
    B, T, U, S = 4, 12, 7, 3
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U)
    y = jnp.asarray(np.abs(rng.normal(size=(B, T, U + 1))).astype(np.float32))
    r = np.asarray(prune_ranges(y, jnp.asarray(t_lens), jnp.asarray(u_lens), S))
    for b in range(B):
        smax = max(0, int(u_lens[b]) + 1 - S)
        assert r[b, 0] == 0
        assert (np.diff(r[b]) >= 0).all(), "monotone"
        assert (np.diff(r[b]) <= S - 1).all(), "connectivity"
        assert (r[b] >= 0).all() and (r[b] <= smax).all()
        last = int(t_lens[b]) - 1
        # final window covers u = u_len
        assert r[b, last] + S - 1 >= int(u_lens[b]) or smax == 0
        # padded frames hold smax (pass-through shift d = 0)
        assert (r[b, last:] == smax).all()


@pytest.mark.slow
def test_narrow_band_upper_bounds_exact_nll():
    rng = np.random.default_rng(4)
    B, T, U, S = 3, 10, 6, 2
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U)
    lp_b = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    lp_l = jnp.asarray(rng.normal(size=(B, T, U + 1)).astype(np.float32))
    null, emit = _penalised_scores(
        lp_b, lp_l, jnp.asarray(labels), jnp.asarray(t_lens), LossModifiers()
    )
    y = emit_posteriors(null, emit, jnp.asarray(t_lens), jnp.asarray(u_lens))
    ranges = prune_ranges(y, jnp.asarray(t_lens), jnp.asarray(u_lens), S)
    # banded scores = dense scores gathered at the band
    j = np.arange(S)
    nb = np.stack(
        [
            np.take_along_axis(
                np.asarray(null)[b], np.asarray(ranges)[b][:, None] + j, axis=1
            )
            for b in range(B)
        ]
    )
    eb = np.stack(
        [
            np.take_along_axis(
                np.asarray(emit)[b],
                np.minimum(np.asarray(ranges)[b][:, None] + j, U), axis=1,
            )
            for b in range(B)
        ]
    )
    dense = np.asarray(
        rnnt_lattice(null, emit, jnp.asarray(t_lens), jnp.asarray(u_lens))
    )
    banded = np.asarray(
        banded_rnnt_lattice(
            jnp.asarray(nb), jnp.asarray(eb), ranges,
            jnp.asarray(t_lens), jnp.asarray(u_lens),
        )
    )
    assert np.all(banded >= dense - 1e-4), (banded, dense)
    assert np.isfinite(banded).all()
    g = jax.grad(
        lambda n, e: banded_rnnt_lattice(
            n, e, ranges, jnp.asarray(t_lens), jnp.asarray(u_lens)
        ).sum(),
        argnums=(0, 1),
    )(jnp.asarray(nb), jnp.asarray(eb))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


@pytest.mark.parametrize("mods", MODS)
def test_full_range_pruned_equals_dense_from_fg(mods):
    """prune_range >= U+1 and simple_scale = 0: the two-stage objective
    collapses to the exact dense loss — value and (f, g, w, b) grads."""
    rng = np.random.default_rng(5)
    B, T, U, K, H = 2, 7, 4, 11, 16
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U, K=K)
    f = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, U + 1, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, H)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    sp = init_simple_params(jax.random.PRNGKey(0), H, K)

    def dense(f, g, w, bb):
        return transducer_loss_from_fg(
            f, g, w, bb, jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), K - 1, mods,
        ).sum()

    def pruned(f, g, w, bb):
        return pruned_transducer_loss_from_fg(
            f, g, w, bb, sp, jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), K - 1, mods,
            prune_range=U + 1, simple_scale=0.0,
        ).sum()

    np.testing.assert_allclose(
        float(dense(f, g, w, bb)), float(pruned(f, g, w, bb)), rtol=1e-5
    )
    gd = jax.grad(dense, argnums=(0, 1, 2, 3))(f, g, w, bb)
    gp = jax.grad(pruned, argnums=(0, 1, 2, 3))(f, g, w, bb)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_pruned_objective_trains_simple_heads():
    """simple_scale > 0 sends gradient into the simple projections."""
    rng = np.random.default_rng(6)
    B, T, U, K, H = 2, 7, 4, 11, 16
    labels, t_lens, u_lens = _case(rng, B=B, T=T, U=U, K=K)
    f = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, U + 1, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, H)).astype(np.float32) * 0.3)
    bb = jnp.zeros((K,), jnp.float32)
    sp = init_simple_params(jax.random.PRNGKey(1), H, K)

    def obj(sp):
        return pruned_transducer_loss_from_fg(
            f, g, w, bb, sp, jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), K - 1, LossModifiers(),
            prune_range=2, simple_scale=0.5,
        ).sum()

    val = float(obj(sp))
    assert np.isfinite(val)
    gs = jax.grad(obj)(sp)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(gs)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0.0


@pytest.mark.slow
def test_pruned_train_step_smoke():
    """make_train_step(pruned_range>0) runs end-to-end and improves the
    objective on a tiny overfit batch."""
    import optax

    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.ops.pruned_loss import init_simple_params
    from caiman_asr_tpu.training.step import TrainState, make_train_step

    cfg = RNNTModelConfig(
        in_feats=8, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
        enc_stack_time_factor=2, pred_n_hid=16, pred_rnn_layers=1,
        joint_n_hid=16,
    )
    K = 7
    model = RNNT(cfg, n_classes=K)
    params = model.init(jax.random.PRNGKey(0))
    params.update(init_simple_params(jax.random.PRNGKey(1), 16, K))

    opt = optax.adam(3e-3)
    step = make_train_step(
        model, opt, blank_idx=K - 1, pruned_range=2, donate=False
    )
    state = TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    rng = np.random.default_rng(7)
    A, B, T, U = 1, 4, 12, 3
    batch = {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 8)).astype(np.float32)),
        "feat_lens": jnp.full((A, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, K - 1, size=(A, B, U)).astype(np.int32)),
        "txt_lens": jnp.full((A, B), U, jnp.int32),
    }
    scalars = {
        "delay_penalty": jnp.float32(0),
        "star_penalty": jnp.float32(0),
        "grad_noise_std": jnp.float32(0),
    }
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), scalars)
        losses.append(float(metrics["loss"]))
        assert int(metrics["skipped"]) == 0
    assert losses[-1] < losses[0]
