"""LSTM kernel equivalence tests vs torch.nn.LSTM (CPU).

Mirrors the reference's kernel-equivalence strategy
(training/lib/tests/custom_lstm/test_cuda.py): same weights -> same outputs,
final states, and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from caiman_asr_tpu.ops.lstm import (
    hard_sigmoid,
    hard_tanh,
    init_lstm,
    lstm_step,
    run_lstm,
)


def torch_lstm_from_params(params, input_size, hidden_size, num_layers):
    m = torch.nn.LSTM(input_size, hidden_size, num_layers)
    with torch.no_grad():
        for i in range(num_layers):
            layer = params[f"layer_{i}"]
            getattr(m, f"weight_ih_l{i}").copy_(torch.tensor(np.asarray(layer["w_ih"])))
            getattr(m, f"weight_hh_l{i}").copy_(torch.tensor(np.asarray(layer["w_hh"])))
            getattr(m, f"bias_ih_l{i}").copy_(torch.tensor(np.asarray(layer["b_ih"])))
            getattr(m, f"bias_hh_l{i}").copy_(torch.tensor(np.asarray(layer["b_hh"])))
    return m


@pytest.mark.parametrize("num_layers", [1, 2])
@pytest.mark.parametrize("T,B,I,H", [(7, 3, 5, 8), (12, 2, 16, 16)])
def test_lstm_matches_torch(num_layers, T, B, I, H):
    key = jax.random.PRNGKey(0)
    params = init_lstm(key, I, H, num_layers, forget_gate_bias=1.0)
    x = np.random.default_rng(0).normal(size=(T, B, I)).astype(np.float32)

    out, (h_n, c_n), (all_h, all_c) = run_lstm(params, jnp.asarray(x))

    m = torch_lstm_from_params(params, I, H, num_layers)
    xt = torch.tensor(x, requires_grad=True)
    out_t, (h_t, c_t) = m(xt)

    np.testing.assert_allclose(np.asarray(out), out_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_n), h_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_n), c_t.detach().numpy(), atol=2e-5)
    # all_h last timestep of last layer == output last step
    np.testing.assert_allclose(
        np.asarray(all_h[-1][-1]), np.asarray(out[-1]), atol=1e-6
    )

    # Gradient equivalence: sum-of-squares loss on output.
    def loss_fn(p, xx):
        o, _, _ = run_lstm(p, xx)
        return (o**2).sum()

    gx = jax.grad(loss_fn, argnums=1)(params, jnp.asarray(x))
    (out_t**2).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=2e-4)


def test_lstm_with_initial_state_matches_torch():
    T, B, I, H, L = 5, 2, 4, 6, 2
    params = init_lstm(jax.random.PRNGKey(1), I, H, L)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    h0 = rng.normal(size=(L, B, H)).astype(np.float32)
    c0 = rng.normal(size=(L, B, H)).astype(np.float32)

    out, (h_n, c_n), _ = run_lstm(params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    m = torch_lstm_from_params(params, I, H, L)
    out_t, (h_t, c_t) = m(torch.tensor(x), (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(out), out_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_n), h_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_n), c_t.detach().numpy(), atol=2e-5)


def test_hard_activations():
    z = jnp.array([-10.0, -4.0, -1.0, 0.0, 1.0, 4.0, 10.0])
    np.testing.assert_allclose(
        hard_sigmoid(z), np.clip(0.5 + np.asarray(z) / 8.0, 0, 1)
    )
    np.testing.assert_allclose(hard_tanh(z), np.clip(np.asarray(z), -1, 1))


def test_hard_lstm_runs_and_differs_from_soft():
    T, B, I, H = 6, 2, 4, 8
    params = init_lstm(jax.random.PRNGKey(2), I, H, 1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(T, B, I)).astype(np.float32)) * 3
    soft, _, _ = run_lstm(params, x, hard=False)
    hard, _, _ = run_lstm(params, x, hard=True)
    assert not np.allclose(np.asarray(soft), np.asarray(hard))
    # hard activations are bounded
    assert np.abs(np.asarray(hard)).max() <= 1.0 + 1e-6


def test_streaming_step_matches_sequence():
    """Frame-by-frame lstm_step must reproduce the full-sequence scan."""
    T, B, I, H, L = 9, 2, 4, 8, 2
    params = init_lstm(jax.random.PRNGKey(3), I, H, L)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(T, B, I)).astype(np.float32))
    out_seq, (h_n, c_n), _ = run_lstm(params, x)

    h = jnp.zeros((L, B, H))
    c = jnp.zeros((L, B, H))
    outs = []
    for t in range(T):
        y, h, c = lstm_step(params, x[t], h, c)
        outs.append(y)
    np.testing.assert_allclose(np.stack(outs), np.asarray(out_seq), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_n), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_n), atol=1e-5)


def test_dropout_zero_is_identity_and_train_dropout_changes():
    T, B, I, H = 5, 2, 4, 8
    params = init_lstm(jax.random.PRNGKey(4), I, H, 2)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(T, B, I)).astype(np.float32))
    o1, _, _ = run_lstm(params, x)
    o2, _, _ = run_lstm(params, x, dropout=0.5, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    o3, _, _ = run_lstm(params, x, dropout=0.5, train=True, rng=jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


@pytest.mark.slow
def test_rw_dropout_changes_output_only_in_train():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from caiman_asr_tpu.ops.lstm import init_lstm, run_lstm

    params = init_lstm(jax.random.PRNGKey(0), 8, 16, 1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4, 8)), jnp.float32)
    base, _, _ = run_lstm(params, x)
    # eval mode: rw_dropout ignored
    same, _, _ = run_lstm(params, x, rw_dropout=0.5, train=False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # train mode: DropConnect mask perturbs the recurrence
    drop, _, _ = run_lstm(
        params, x, rw_dropout=0.5, train=True, rng=jax.random.PRNGKey(1)
    )
    assert float(jnp.abs(drop - base).max()) > 1e-4
