"""Host data-loader throughput probe: audio-s/s of make_batch.

The train step is only as fast as the host can feed it; this measures the
full host path (FLAC decode -> trim -> speed perturb -> batch assembly +
tokenize) on synthetic 12 s utterances, per pipeline worker-pool size.
Reported per THIS host's cores — production TPU hosts have ~100+ vCPUs
and the per-utterance work (native FLAC decode, scipy polyphase resample)
releases the GIL, so feed rate scales with cores.

    python scripts/bench_loader.py [-B 32] [--n 64] [--workers 8 16]
"""

import argparse
import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


class _Tok:
    sampling = 0.0
    charset = list("abcdefghijklmnopqrstuvwxyz ")

    def tokenize(self, text):
        return [1, 2, 3] * 10


class _Sampler:
    def __init__(self, n, B):
        self.n, self.B = n, B

    def epoch_batches(self, e, r=0):
        return [list(range(i, i + self.B)) for i in
                range(0, self.n - self.B + 1, self.B)]

    def shard(self, b, rank):
        return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=32)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--dur", type=float, default=12.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--workers", type=int, nargs="+", default=[8])
    args = ap.parse_args()

    from tests.native.test_native import encode_flac_verbatim

    from caiman_asr_tpu.data.loader import AudioDataLoader
    from caiman_asr_tpu.data.manifest import Utterance
    from caiman_asr_tpu.models.config import PipelineConfig

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    utts = []
    for i in range(args.n):
        pcm = (rng.normal(size=int(16000 * args.dur)) * 3000).astype(np.int16)
        fn = os.path.join(tmp, f"u{i}.flac")
        with open(fn, "wb") as f:
            f.write(encode_flac_verbatim(pcm))
        utts.append(Utterance(fname=fn, transcript="hello world test " * 8,
                              duration=args.dur, manifest_idx=i))

    pipe = PipelineConfig()
    ds = dataclasses.replace(
        pipe.dataset,
        speed_perturbation={"min_rate": 0.85, "max_rate": 1.15, "p": 1.0},
        trim_silence=True,
    )
    pipe = dataclasses.replace(pipe, dataset=ds)
    print(f"host cores: {os.cpu_count()}")
    # Rotate through distinct utterance windows so no iteration repeats the
    # previous one's batch. Two caveats this bench accepts, stated plainly:
    # token results are cached per utterance (steady-state epoch>1 behavior;
    # first-epoch tokenize costs ~1.2 ms/utt extra, measured separately
    # below) and file reads hit the OS page cache (as they do in real
    # training after epoch 1).
    for nw in args.workers:
        ld = AudioDataLoader(utts, _Sampler(args.n, args.B), _Tok(), pipe,
                             num_workers=nw)
        t0 = time.perf_counter()
        for i in range(args.n):
            ld._tokens(i)
        tok_ms = (time.perf_counter() - t0) / args.n * 1e3
        ld.make_batch(list(range(args.B)))  # warm page cache + jit nothing
        t0 = time.perf_counter()
        tot = 0.0
        for it in range(args.iters):
            start = (it * args.B) % max(args.n - args.B, 1)
            b = ld.make_batch(list(range(start, start + args.B)))
            tot += float(b.audio_lens.sum()) / 16000.0
        dt = time.perf_counter() - t0
        print(f"workers={nw}: {dt / args.iters * 1e3:.1f} ms/batch "
              f"(B={args.B} x {args.dur:.0f}s, perturb+trim on, tokens "
              f"cached; first-epoch tokenize {tok_ms:.2f} ms/utt) "
              f"-> {tot / dt:.0f} audio-s/s")


if __name__ == "__main__":
    main()
