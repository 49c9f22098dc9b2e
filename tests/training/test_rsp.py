"""Random state passing tests: controller gate sequences + state threading
through the rsp train step (reference: tests/train_utils/test_rsp.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from caiman_asr_tpu.training import OptimizerConfig, build_optimizer, make_train_step
from caiman_asr_tpu.training.rsp import (
    RSPController,
    is_rsp_on,
    rsp_delay_default,
    zero_rnnt_state,
)
from caiman_asr_tpu.training.step import init_train_state

from tests.training.test_step import BLANK, SCALARS, make_batch, tiny_model


def test_is_rsp_on():
    assert not is_rsp_on([99, 0])
    assert is_rsp_on([99, 0, 1])
    assert rsp_delay_default(100, 200, 50) == 450


def test_controller_pairs():
    # freq [0, 1]: every history is exactly 2 batches -> gates 0,1,0,1,...
    ctl = RSPController([0, 1], delay=0, seed=0)
    g = ctl.gates(step=10, n_micro=8)
    np.testing.assert_array_equal(g, [0, 1, 0, 1, 0, 1, 0, 1])


def test_controller_delay():
    ctl = RSPController([0, 1], delay=100, seed=0)
    assert ctl.gates(step=5, n_micro=4).sum() == 0
    assert ctl.gates(step=200, n_micro=4).sum() > 0


def test_controller_off():
    ctl = RSPController([99, 0], delay=0)
    assert ctl.gates(0, 16).sum() == 0


@pytest.mark.slow
def test_rsp_step_state_threading(rng):
    model = tiny_model()
    opt = build_optimizer(OptimizerConfig(lr=1e-3))
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, BLANK, rsp=True, donate=False)

    batch = make_batch(rng, A=2, B=4)
    rs0 = zero_rnnt_state(model, 4)

    gates_off = np.zeros(2, np.float32)
    gates_on = np.ones(2, np.float32)

    s1, m1, rs1 = step(state, batch, jax.random.PRNGKey(1), SCALARS, rs0, gates_off)
    assert np.isfinite(float(m1["loss"]))
    # state is populated after the step
    h = rs1.enc_state.post_rnn[0]
    assert float(jnp.abs(h).sum()) > 0.0

    # carrying state (gate=1) must change the loss vs fresh state
    _, m_off, _ = step(state, batch, jax.random.PRNGKey(2), SCALARS, rs1, gates_off)
    _, m_on, _ = step(state, batch, jax.random.PRNGKey(2), SCALARS, rs1, gates_on)
    assert abs(float(m_on["loss"]) - float(m_off["loss"])) > 1e-6


@pytest.mark.slow
def test_rsp_state_zeroed_on_nan(rng):
    model = tiny_model()
    opt = build_optimizer(OptimizerConfig(lr=1e-3))
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, BLANK, rsp=True, donate=False)
    batch = make_batch(rng, A=2, B=4)
    bad = dict(batch, feats=batch["feats"].at[0, 0, 0, 0].set(jnp.nan))
    rs0 = zero_rnnt_state(model, 4)
    _, m, rs = step(state, bad, jax.random.PRNGKey(1), SCALARS, rs0, np.zeros(2, np.float32))
    assert int(m["skipped"]) == 1
    assert all(float(jnp.abs(x).sum()) == 0.0 for x in jax.tree.leaves(rs))
