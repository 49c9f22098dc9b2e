"""Transducer loss equivalence tests.

Mirrors the reference's loss test strategy
(training/lib/tests/transducer/test_loss.py): compare against a naive
double-precision forward-backward DP implementing the reference CUDA kernel's
exact semantics (training/lib/csrc/transducer_loss.cu:100-263), parameterised
over delay/EOS/star penalties and ragged lengths; check gradients against
autodiff of a naive differentiable implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp

from caiman_asr_tpu.ops.transducer_loss import (
    LossModifiers,
    transducer_loss,
    transducer_loss_from_fg,
)


def naive_loss_numpy(logits, labels, t_lens, u_lens, blank_idx, mods):
    """Reference DP in float64, written directly from the recurrences in
    Sequence Transduction with RNNs (Graves 2012) Eq. 16-18 plus the
    reference's penalty semantics."""
    B, T, U1, K = logits.shape
    out = np.zeros(B)
    for b in range(B):
        F, G = int(t_lens[b]), int(u_lens[b]) + 1
        x = logits[b].astype(np.float64)
        logp = x - logsumexp(x, axis=-1, keepdims=True)
        lab = labels[b]

        def null(t, u):
            if u > 0 and lab[u - 1] == mods.star_idx:
                return mods.star_penalty
            return logp[t, u, blank_idx]

        def emit(t, u):
            dp = mods.delay_penalty * ((F - 1) / 2 - t)
            if lab[u] == mods.star_idx:
                return dp
            v = logp[t, u, lab[u]] + dp
            if lab[u] == mods.eos_idx:
                v += mods.eos_penalty * ((F - 1) / 2 - t)
            return v

        alpha = np.full((F, G), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(F):
            for u in range(G):
                if t == 0 and u == 0:
                    continue
                terms = []
                if t > 0:
                    terms.append(alpha[t - 1, u] + null(t - 1, u))
                if u > 0:
                    terms.append(alpha[t, u - 1] + emit(t, u - 1))
                alpha[t, u] = logsumexp(terms)
        out[b] = -(alpha[F - 1, G - 1] + null(F - 1, G - 1))
    return out


def naive_loss_jnp(logits, labels, t_lens, u_lens, blank_idx, mods):
    """Tiny differentiable python-loop version for gradient checking."""
    B, T, U1, K = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    losses = []
    for b in range(B):
        F, G = int(t_lens[b]), int(u_lens[b]) + 1
        lab = labels[b]

        def null(t, u):
            if u > 0 and int(lab[u - 1]) == mods.star_idx:
                return jnp.float32(mods.star_penalty)
            return logp[b, t, u, blank_idx]

        def emit(t, u):
            dp = mods.delay_penalty * ((F - 1) / 2 - t)
            if int(lab[u]) == mods.star_idx:
                return jnp.float32(dp)
            v = logp[b, t, u, lab[u]] + dp
            if int(lab[u]) == mods.eos_idx:
                v = v + mods.eos_penalty * ((F - 1) / 2 - t)
            return v

        alpha = {}
        alpha[(0, 0)] = jnp.float32(0.0)
        for t in range(F):
            for u in range(G):
                if t == 0 and u == 0:
                    continue
                terms = []
                if t > 0:
                    terms.append(alpha[(t - 1, u)] + null(t - 1, u))
                if u > 0:
                    terms.append(alpha[(t, u - 1)] + emit(t, u - 1))
                alpha[(t, u)] = (
                    terms[0]
                    if len(terms) == 1
                    else jnp.logaddexp(terms[0], terms[1])
                )
        losses.append(-(alpha[(F - 1, G - 1)] + null(F - 1, G - 1)))
    return jnp.stack(losses)


def make_case(rng, B=3, T=8, U=5, K=11, ragged=True):
    logits = rng.normal(size=(B, T, U + 1, K)).astype(np.float32)
    labels = rng.integers(0, K - 1, size=(B, U)).astype(np.int32)
    if ragged:
        t_lens = rng.integers(U + 2, T + 1, size=B).astype(np.int32)
        u_lens = rng.integers(1, U + 1, size=B).astype(np.int32)
        t_lens[0], u_lens[0] = T, U
    else:
        t_lens = np.full(B, T, np.int32)
        u_lens = np.full(B, U, np.int32)
    return logits, labels, t_lens, u_lens


MODS = [
    LossModifiers(),
    LossModifiers(delay_penalty=0.1),
    LossModifiers(eos_penalty=0.3, eos_idx=2, delay_penalty=0.05),
    LossModifiers(star_penalty=-0.7, star_idx=3),
    LossModifiers(
        delay_penalty=0.1, eos_penalty=0.2, eos_idx=2, star_penalty=-0.5, star_idx=3
    ),
]


@pytest.mark.slow
@pytest.mark.parametrize("mods", MODS)
def test_loss_matches_naive_dp(mods):
    rng = np.random.default_rng(0)
    logits, labels, t_lens, u_lens = make_case(rng)
    # Ensure star/eos tokens actually appear in some labels.
    labels[0, 1] = 3
    labels[0, 3] = 2
    want = naive_loss_numpy(logits, labels, t_lens, u_lens, 10, mods)
    got = transducer_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens), 10, mods,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mods", MODS[:2] + MODS[4:])
def test_grad_matches_naive_autodiff(mods):
    rng = np.random.default_rng(1)
    logits, labels, t_lens, u_lens = make_case(rng, B=2, T=6, U=3, K=7)
    labels[0, 1] = 3
    labels[1, 2] = 2

    def ours(lg):
        return transducer_loss(
            lg, jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens), 6, mods
        ).sum()

    def naive(lg):
        return naive_loss_jnp(lg, labels, t_lens, u_lens, 6, mods).sum()

    g_ours = jax.grad(ours)(jnp.asarray(logits))
    g_naive = jax.grad(naive)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_naive), rtol=1e-4, atol=1e-5
    )


def test_empty_transcript():
    """u_len = 0: loss is just the blank path."""
    rng = np.random.default_rng(2)
    logits, labels, t_lens, u_lens = make_case(rng, B=2, T=5, U=3, ragged=False)
    u_lens = np.zeros(2, np.int32)
    mods = LossModifiers()
    want = naive_loss_numpy(logits, labels, t_lens, u_lens, 10, mods)
    got = transducer_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens),
        jnp.asarray(u_lens), 10, mods,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_fg_matches_dense():
    """transducer_loss_from_fg == dense path through an explicit joint."""
    rng = np.random.default_rng(3)
    B, T, U, H, K = 2, 9, 4, 16, 13
    f = rng.normal(size=(B, T, H)).astype(np.float32)
    g = rng.normal(size=(B, U + 1, H)).astype(np.float32)
    w = (rng.normal(size=(K, H)) * 0.3).astype(np.float32)
    bias = rng.normal(size=(K,)).astype(np.float32) * 0.1
    labels = rng.integers(0, K - 1, size=(B, U)).astype(np.int32)
    t_lens = np.array([T, T - 2], np.int32)
    u_lens = np.array([U, U - 1], np.int32)
    mods = LossModifiers(delay_penalty=0.05)

    def dense(f, g, w, bias):
        h = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
        logits = jnp.einsum("btuh,kh->btuk", h, w) + bias
        return transducer_loss(
            logits, jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens),
            K - 1, mods,
        ).sum()

    def fused(f, g, w, bias):
        return transducer_loss_from_fg(
            f, g, w, bias, jnp.asarray(labels), jnp.asarray(t_lens),
            jnp.asarray(u_lens), K - 1, mods, t_chunk=4,
        ).sum()

    args = tuple(map(jnp.asarray, (f, g, w, bias)))
    np.testing.assert_allclose(dense(*args), fused(*args), rtol=2e-5, atol=1e-5)

    gd = jax.grad(dense, argnums=(0, 1, 2, 3))(*args)
    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_loss_is_proper_nll():
    """Loss must be >= 0 and finite; and jit-compilable."""
    rng = np.random.default_rng(4)
    logits, labels, t_lens, u_lens = make_case(rng)
    fn = jax.jit(
        lambda lg: transducer_loss(
            lg, jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens), 10
        )
    )
    loss = np.asarray(fn(jnp.asarray(logits)))
    assert np.all(np.isfinite(loss))
    assert np.all(loss > 0)


@pytest.mark.slow
def test_joint_dropout_applied_in_training_loss():
    """Training-path parity: the reference applies dropout between the joint
    ReLU and joint_fc (rnnt/model.py:227-238). With a dropout rng the loss
    must change (and differ across rngs); without one it is deterministic."""
    rng = np.random.default_rng(7)
    B, T, U, H, K = 2, 6, 3, 8, 12
    f = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U + 1, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, H)) * 0.3, jnp.float32)
    bias = jnp.zeros((K,), jnp.float32)
    labels = jnp.asarray(rng.integers(0, K - 2, (B, U)), jnp.int32)
    t_lens = jnp.full((B,), T, jnp.int32)
    u_lens = jnp.full((B,), U, jnp.int32)

    def loss(rng_key, rate):
        return transducer_loss_from_fg(
            f, g, w, bias, labels, t_lens, u_lens, K - 1,
            t_chunk=3, dropout_rng=rng_key, dropout_rate=rate,
        ).sum()

    base = float(loss(None, 0.0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    d1, d1b, d2 = float(loss(k1, 0.5)), float(loss(k1, 0.5)), float(loss(k2, 0.5))
    assert d1 == d1b  # same rng -> deterministic
    assert d1 != base and d2 != base and d1 != d2
    # rate 0 with an rng is a no-op
    assert float(loss(k1, 0.0)) == base
    # gradients flow through the dropout mask
    gr = jax.grad(lambda ff: transducer_loss_from_fg(
        ff, g, w, bias, labels, t_lens, u_lens, K - 1,
        t_chunk=3, dropout_rng=k1, dropout_rate=0.5).sum())(f)
    assert np.all(np.isfinite(np.asarray(gr)))


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_packed_lattice_loss_matches_dense(monkeypatch, fused):
    """pack_to path == dense path (values and grads) on a ragged batch,
    through the fp32 per-pass recompute AND the fused one-kernel backward
    (fp32 inputs -> both tight).

    The bf16-u slab paths (stored-u, N-chunked re-derive) are pinned OFF:
    their numerator rounding is covered by
    test_pallas_joint.test_vjp_parity."""
    import caiman_asr_tpu.ops.pallas_joint as pj

    monkeypatch.setattr(pj, "Z_STORE_LIMIT_BYTES", 0)
    monkeypatch.setattr(pj, "RECHUNK_LIMIT_BYTES", 0)
    monkeypatch.setattr(pj, "FUSED_BWD", fused)
    rng = np.random.default_rng(11)
    B, T, U, H, K = 3, 7, 4, 8, 12
    f = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U + 1, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, H)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, K - 2, (B, U)), jnp.int32)
    t_lens = jnp.asarray([7, 5, 3], jnp.int32)
    u_lens = jnp.asarray([4, 2, 1], jnp.int32)
    nvalid = int(sum(int(t) * (int(u) + 1) for t, u in zip(t_lens, u_lens)))

    def dense(f, g, w, bias):
        return transducer_loss_from_fg(
            f, g, w, bias, labels, t_lens, u_lens, K - 1, t_chunk=4,
        ).sum()

    def packed(f, g, w, bias):
        return transducer_loss_from_fg(
            f, g, w, bias, labels, t_lens, u_lens, K - 1,
            pack_to=nvalid + 5,  # a little slack, like the quantised cap
        ).sum()

    args = (f, g, w, bias)
    np.testing.assert_allclose(dense(*args), packed(*args), rtol=2e-4, atol=1e-4)
    gd = jax.grad(dense, argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(packed, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)

    # exact-cap packing (no slack) must also work
    np.testing.assert_allclose(
        dense(*args),
        transducer_loss_from_fg(
            f, g, w, bias, labels, t_lens, u_lens, K - 1, pack_to=nvalid
        ).sum(),
        rtol=2e-4, atol=1e-4,
    )
