"""Multi-host TRAINING over a real 2-process jax.distributed CPU cluster.

Each worker process exposes 2 virtual CPU devices, so the cluster forms a
4-device global mesh spanning two controller processes (the DCN shape of a
real multi-host pod). Both hosts build their local batch quarter, assemble
the global batch via ``shard_batch_multihost``
(jax.make_array_from_process_local_data), and run ONE full train step
(grad-accum scan + LAMB + EMA + NaN guard). The resulting loss must equal
the single-process 4-device run of the same global batch bit-for-bit up to
collective reduction order — proving the --multihost path end to end:
init_multihost, per-host data sharding, cross-process gradient psum.

Reference analogue: torchrun + DDP/NCCL (train_utils/torchrun.py,
setup/base.py:487-506); here the same jitted step runs unchanged and GSPMD
inserts the cross-host collectives.
"""

import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2,
        process_id=int(sys.argv[2]),
    )
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from tests.parallel.test_multihost_train import (
        build_global_batch, tiny_model_and_step,
    )
    from caiman_asr_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch_multihost,
    )
    from caiman_asr_tpu.training.step import BATCH_DIMS

    assert jax.process_count() == 2 and len(jax.devices()) == 4
    pid = jax.process_index()

    model, state, step = tiny_model_and_step()
    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))

    gbatch = build_global_batch()
    B = gbatch["feats"].shape[2]
    lo, hi = pid * B // 2, (pid + 1) * B // 2
    local = {{
        "feats": gbatch["feats"][:, :, lo:hi],
        "feat_lens": gbatch["feat_lens"][:, lo:hi],
        "txt": gbatch["txt"][:, lo:hi],
        "txt_lens": gbatch["txt_lens"][:, lo:hi],
    }}
    batch = shard_batch_multihost(
        mesh, local, {{k: BATCH_DIMS[k] for k in local}}
    )
    scalars = {{
        "delay_penalty": jnp.zeros(()),
        "star_penalty": jnp.zeros(()),
        "grad_noise_std": jnp.zeros(()),
    }}
    state, metrics = step(state, batch, jax.random.PRNGKey(1), scalars)
    loss = float(metrics["loss"])
    gn = float(metrics["grad_norm"])
    assert int(state.step) == 1
    print(f"RANK_OK {{pid}} loss={{loss:.8f}} gn={{gn:.8f}}", flush=True)
    """
)


def tiny_model_and_step():
    """Deterministic tiny model + train step (dropout off, no grad noise)."""
    from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
    from caiman_asr_tpu.training import OptimizerConfig, build_optimizer
    from caiman_asr_tpu.training.step import init_train_state, make_train_step

    model = RNNT(
        RNNTModelConfig(
            in_feats=16, enc_n_hid=32, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=16,
            pred_rnn_layers=1, joint_n_hid=32, enc_dropout=0.0,
            pred_dropout=0.0, joint_dropout=0.0,
        ),
        n_classes=64,
    )
    opt = build_optimizer(OptimizerConfig(), model.param_lr_factors())
    state = init_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, blank_idx=63, donate=False)
    return model, state, step


def build_global_batch():
    A, B, T, U = 2, 8, 16, 6
    rng = np.random.default_rng(0)
    return {
        "feats": jnp.asarray(rng.normal(size=(A, T, B, 16)), jnp.float32),
        "feat_lens": jnp.full((A, B), T, jnp.int32),
        "txt": jnp.asarray(rng.integers(0, 62, (A, B, U)), jnp.int32),
        "txt_lens": jnp.full((A, B), U, jnp.int32),
    }


@pytest.mark.slow
def test_two_host_train_step_matches_single_process(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    # single-process reference on a 4-device mesh (conftest provides 8)
    from caiman_asr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from caiman_asr_tpu.training.step import BATCH_DIMS

    model, state, step = tiny_model_and_step()
    mesh = make_mesh(4)
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(
        mesh, build_global_batch(), {k: BATCH_DIMS[k] for k in BATCH_DIMS}
    )
    scalars = {
        "delay_penalty": jnp.zeros(()),
        "star_penalty": jnp.zeros(()),
        "grad_noise_std": jnp.zeros(()),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1), scalars)
    want_loss = float(metrics["loss"])
    want_gn = float(metrics["grad_norm"])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # workers set their own 2-device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    losses = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}\n{err}"
        assert f"RANK_OK {i}" in out
        line = next(l for l in out.splitlines() if l.startswith(f"RANK_OK {i}"))
        losses.append(
            (float(line.split("loss=")[1].split()[0]),
             float(line.split("gn=")[1]))
        )
    # both ranks see the identical global loss, equal to the 1-process run
    assert losses[0] == losses[1]
    np.testing.assert_allclose(losses[0][0], want_loss, rtol=1e-5)
    np.testing.assert_allclose(losses[0][1], want_gn, rtol=1e-4)
