"""Parallel beam decoding across worker processes
(reference: rnnt/parallel_decoder.py:16-165).

The adaptive beam's hypothesis bookkeeping is host-side Python; for offline
(CPU) evaluation the reference spreads utterances over a process pool with
2x over-chunking. Same scheme here: the parent runs the encoder (on
whatever device is active), then ships encoder-output chunks to worker
processes that each hold a CPU copy of the model and run the host beam.

Workers are spawned lazily with an initializer that rebuilds the decoder
from (config path, checkpoint path, decoder kwargs) — live JAX objects
don't cross process boundaries.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional

import numpy as np

_worker_decoder = None
_worker_params = None


def _init_worker(config_path, tokenizer_path, ckpt_path, decoder_kwargs):
    """Build a CPU decoder inside the worker process."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    global _worker_decoder, _worker_params
    import jax

    from caiman_asr_tpu.decoding.beam import RNNTBeamDecoder
    from caiman_asr_tpu.export.checkpointer import apply_params, load_checkpoint
    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.setup.builders import build_model, build_tokenizer

    bundle = load_config(config_path)
    tokenizer = build_tokenizer(bundle.cfg, tokenizer_path)
    model, blank_idx = build_model(bundle.cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    if ckpt_path:
        loaded, ema, _, _ = load_checkpoint(ckpt_path)
        params = apply_params(params, ema if ema is not None else loaded)
    _worker_decoder = RNNTBeamDecoder(
        model, blank_idx, tokenizer, **(decoder_kwargs or {})
    )
    _worker_params = params


def _decode_chunk(args):
    encs, enc_lens = args
    return _worker_decoder.decode_encs(_worker_params, encs, enc_lens)


class ParallelDecoder:
    """Chunk a batch of encoder outputs over a beam-decoding process pool."""

    def __init__(
        self,
        model,
        config_path: str,
        tokenizer_path: Optional[str],
        ckpt_path: Optional[str],
        decoder_kwargs: Optional[dict] = None,
        nprocs: Optional[int] = None,
        min_batch_per_proc: int = 1,
    ):
        import multiprocessing

        self.model = model
        if nprocs is None or nprocs < 0:
            nprocs = min(os.cpu_count() or 1, 8)
        self.nprocs = max(1, nprocs)
        self.min_batch_per_proc = max(1, min_batch_per_proc)
        # spawn (not fork): forking a process with a live JAX runtime
        # deadlocks; fresh interpreters also let JAX_PLATFORMS=cpu take hold
        self._pool = ProcessPoolExecutor(
            max_workers=self.nprocs,
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_init_worker,
            initargs=(config_path, tokenizer_path, ckpt_path, decoder_kwargs),
        )

    def decode(self, params, feats, feat_lens) -> List[Dict]:
        encs, enc_lens, _ = self.model.encode(params, feats, feat_lens)
        return self.decode_encs(params, np.asarray(encs), np.asarray(enc_lens))

    def decode_encs(self, params, encs, enc_lens) -> List[Dict]:
        B = encs.shape[0]
        # 2x over-chunking for load balance (reference parallel_decoder.py),
        # but never split below the per-chunk minimum batch size
        n_chunks = min(B, 2 * self.nprocs, max(1, B // self.min_batch_per_proc))
        sizes = [(B + n_chunks - 1 - i) // n_chunks for i in range(n_chunks)]
        chunks, start = [], 0
        for s in sizes:
            if s <= 0:
                continue
            chunks.append((encs[start : start + s], enc_lens[start : start + s]))
            start += s
        results = self._pool.map(_decode_chunk, chunks)
        out: List[Dict] = []
        for r in results:
            out.extend(r)
        return out

    def close(self):
        self._pool.shutdown(wait=False)
