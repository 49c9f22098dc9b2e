"""Multi-process eval aggregation over a REAL 2-process jax.distributed
CPU cluster (subprocess-spawned, localhost coordinator) — the TPU-native
equivalent of reference evaluate/distributed.py:12-66."""

import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2,
        process_id=int(sys.argv[2]),
    )
    sys.path.insert(0, {repo!r})
    from caiman_asr_tpu.evaluate.core import EvalResult
    from caiman_asr_tpu.evaluate.distributed import (
        aggregate_eval_results, gather_objects, sync_wer_across_processes,
    )

    r = jax.process_index()
    assert jax.process_count() == 2

    # object gather: arbitrary per-rank payloads, process order preserved
    objs = gather_objects({{"rank": r, "hyps": ["x"] * (r + 1)}})
    assert [o["rank"] for o in objs] == [0, 1], objs
    assert [len(o["hyps"]) for o in objs] == [1, 2]

    # WER sync: rank0 (2 errs, 10 words), rank1 (1 err, 30 words) -> 3/40
    wer = sync_wer_across_processes(2 if r == 0 else 1, 10 if r == 0 else 30)
    assert abs(wer - 3.0 / 40.0) < 1e-12, wer

    # full EvalResult merge: identical on both ranks
    local = EvalResult(
        wer=0.0, scores=2 if r == 0 else 1, num_words=10 if r == 0 else 30,
        loss=1.0 if r == 0 else 3.0,
        hyps=[f"h{{r}}"], refs=[f"r{{r}}"], fnames=[f"f{{r}}"],
        timestamps=[[r]],
    )
    g = aggregate_eval_results(local, loss_count=2.0)
    assert abs(g.wer - 3.0 / 40.0) < 1e-12
    assert g.hyps == ["h0", "h1"] and g.refs == ["r0", "r1"]
    assert g.fnames == ["f0", "f1"] and g.timestamps == [[0], [1]]
    assert abs(g.loss - 2.0) < 1e-12  # (1*2 + 3*2) / 4
    print("RANK_OK", r, flush=True)
    """
)


@pytest.mark.slow
def test_two_process_gather_and_wer(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # no virtual-device carryover into workers
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}\n{err}"
        assert f"RANK_OK {i}" in out
