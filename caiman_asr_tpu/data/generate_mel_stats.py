"""Generate dataset log-mel statistics (melmeans/melvars) for blended
normalization (reference: data/generate_mel_stats.py + stats dirs used by
data/dali/mel_normalization.py).

Run:  python -m caiman_asr_tpu.data.generate_mel_stats \
        --model_config configs/base-8703sp.yaml --dataset_dir DATA \
        --manifests train.json --output_path DATA/mel_stats.npz
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from caiman_asr_tpu.data.audio import read_audio
from caiman_asr_tpu.models.config import load_config
from caiman_asr_tpu.ops.logmel import LogMelFrontend
from caiman_asr_tpu.setup.builders import load_utterances


def _abspaths(dataset_dir, names):
    from pathlib import Path

    return [str(Path(n) if Path(n).is_absolute() else Path(dataset_dir) / n)
            for n in names]



def compute_mel_stats(frontend: LogMelFrontend, audio_iter, batch_size: int = 32):
    """Streaming per-mel-bin mean/variance over all valid frames
    (Welford-free: sum / sumsq accumulation in float64)."""
    n_mels = frontend.config.n_mels
    total = np.zeros(n_mels, np.float64)
    total_sq = np.zeros(n_mels, np.float64)
    count = 0

    batch, lens = [], []

    def flush():
        nonlocal total, total_sq, count, batch, lens
        if not batch:
            return
        S = max(len(a) for a in batch)
        audio = np.zeros((len(batch), S), np.float32)
        for i, a in enumerate(batch):
            audio[i, : len(a)] = a
        feats, frame_lens = frontend(audio, np.asarray(lens, np.int32))
        feats = np.asarray(feats, np.float64)  # [B, n_mels, T]
        frame_lens = np.asarray(frame_lens)
        for i in range(feats.shape[0]):
            f = feats[i, :, : frame_lens[i]]
            total += f.sum(axis=1)
            total_sq += (f**2).sum(axis=1)
            count += int(frame_lens[i])
        batch, lens = [], []

    for a in audio_iter:
        batch.append(a)
        lens.append(len(a))
        if len(batch) >= batch_size:
            flush()
    flush()
    means = total / max(count, 1)
    vars_ = total_sq / max(count, 1) - means**2
    return means.astype(np.float32), np.maximum(vars_, 1e-10).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description="dataset log-mel stats")
    p.add_argument("--model_config", required=True)
    p.add_argument("--dataset_dir", default=".")
    p.add_argument("--manifests", nargs="+", default=[])
    p.add_argument("--read_from_tar", action="store_true")
    p.add_argument("--tar_files", nargs="+", default=[],
                   help="webdataset tar/zip shards (with --read_from_tar)")
    p.add_argument("--output_path", required=True)
    p.add_argument("--max_utts", type=int, default=None)
    p.add_argument("--batch_size", "--dump_mel_stats_batch_size", type=int,
                   default=32, help="featurizer batch size (reference "
                                    "args/norm_stats_generation.py:13)")
    args = p.parse_args(argv)

    bundle = load_config(args.model_config)
    pipe = bundle.cfg.input_val  # no augmentation
    frontend = LogMelFrontend(pipe.logmel)
    if getattr(args, "read_from_tar", False):
        from itertools import islice

        from caiman_asr_tpu.data.webdataset import WebDatasetReader

        reader = WebDatasetReader(
            _abspaths(args.dataset_dir, args.tar_files),
            sample_rate=pipe.logmel.sample_rate,
        )
        samples = (a for a, _txt, _key in reader._samples(0))
        audio_iter = islice(samples, args.max_utts) if args.max_utts else samples
        n_desc = "tar shards"
    elif args.manifests:
        utts = load_utterances(args.manifests, args.dataset_dir, pipe)
        if args.max_utts:
            utts = utts[: args.max_utts]
        audio_iter = (read_audio(u.fname, pipe.logmel.sample_rate) for u in utts)
        n_desc = f"{len(utts)} utts"
    else:
        raise SystemExit("pass --manifests or --read_from_tar --tar_files")
    means, vars_ = compute_mel_stats(frontend, audio_iter, args.batch_size)
    np.savez(args.output_path, melmeans=means, melvars=vars_)
    print(f"wrote {args.output_path}: {n_desc}, "
          f"mean[0]={means[0]:.3f} var[0]={vars_[0]:.3f}")


if __name__ == "__main__":
    main()
