"""Multi-process evaluation aggregation.

Reference equivalent: evaluate/distributed.py:12-66 (gather_object of
per-rank aggregates + multigpu WER) and distributed_utils.py (score/word
all-reduce). TPU-native mechanism: ``multihost_utils.process_allgather``
over the jax.distributed backend — no torch.distributed. Everything here
returns the SAME value on every process (all-gather, not gather-to-0), so
rank-dependent control flow (die_if_wer_bad, best-checkpoint logic,
logging) stays rank-agnostic by construction.
"""

from __future__ import annotations

import pickle
from typing import List

import numpy as np


def _allgather(arr: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(arr)))


def sum_across_processes(x) -> float:
    """Sum a host scalar over all processes (reference sum_across_gpus)."""
    import jax

    if jax.process_count() == 1:
        return float(x)
    return float(np.sum(_allgather(np.float64(x))))


def sync_wer_across_processes(scores, num_words) -> float:
    """Global WER from per-process (edit-distance, word-count) sums
    (reference distributed_utils.sync_wer_across_gpus)."""
    s = sum_across_processes(scores)
    n = sum_across_processes(num_words)
    return s / max(n, 1.0)


def gather_objects(obj) -> List:
    """All-gather one pickleable object per process, in process order
    (reference dist.gather_object, made symmetric). Wire format: pickled
    bytes padded to the max length, exchanged as uint8 arrays."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = _allgather(np.int64(payload.size))  # [P]
    n = int(lens.max())
    padded = np.zeros(n, np.uint8)
    padded[: payload.size] = payload
    gathered = _allgather(padded)  # [P, n]
    return [
        pickle.loads(gathered[i, : int(lens[i])].tobytes())
        for i in range(len(lens))
    ]


def aggregate_eval_results(result, loss_count: float = 0.0):
    """Combine per-process EvalResults into the global result, identically
    on every process (reference process_evaluation_epoch: WER from summed
    scores/words, loss weighted by per-process sample counts, per-utterance
    lists concatenated in process order)."""
    import jax

    if jax.process_count() == 1:
        return result

    scores = sum_across_processes(result.scores)
    num_words = sum_across_processes(result.num_words)
    ls = result.loss if result.loss is not None else 0.0
    loss_sum = sum_across_processes(ls * loss_count)
    count_sum = sum_across_processes(loss_count)

    small = {
        "hyps": result.hyps,
        "refs": result.refs,
        "fnames": result.fnames,
        "timestamps": result.timestamps,
        "word_timestamps": result.word_timestamps,
        "terminations": result.terminations,
    }
    gathered = gather_objects(small)

    import dataclasses

    merged_wts = None
    if any(g["word_timestamps"] for g in gathered):
        merged_wts = [
            w for g in gathered for w in (g["word_timestamps"] or [])
        ]
    return dataclasses.replace(
        result,
        wer=scores / max(num_words, 1.0),
        scores=int(scores),
        num_words=int(num_words),
        loss=(loss_sum / count_sum) if count_sum else None,
        hyps=[h for g in gathered for h in g["hyps"]],
        refs=[r for g in gathered for r in g["refs"]],
        fnames=[f for g in gathered for f in g["fnames"]],
        timestamps=[t for g in gathered for t in g["timestamps"]],
        word_timestamps=merged_wts,
        terminations=[
            t for g in gathered for t in (g["terminations"] or [])
        ] or None,
    )
