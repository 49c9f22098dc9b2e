"""Serving-bundle export — the "hardware checkpoint" equivalent.

Reference: export/hardware_ckpt.py:1-183. Gathers everything the inference
server needs into one .npz:
- EMA (preferred) model weights in fp32 named arrays,
- dataset mel statistics (melmeans/melvars),
- the sentencepiece model bytes,
- optional binary n-gram bytes + scale factor,
- the rnnt config block + version metadata.

Gates (reference hardware_ckpt.py:60-100 + checkpointer.py:106-140):
- ``logmel_norm_weight`` must be 1.0 (mel-norm ramp complete — the serving
  stack normalizes with dataset stats only);
- the parameter shapes must match a supported ModelVariant schema unless
  ``--skip_state_dict_check``.

CLI: python -m caiman_asr_tpu.export.serving_bundle --ckpt best.npz \
       --config configs/base-8703sp.yaml --mel_stats stats.npz --output hw.npz
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path
from typing import Optional

import numpy as np

from caiman_asr_tpu.export.checkpointer import flatten_named, load_checkpoint
from caiman_asr_tpu.export.model_schema import check_schema_training
from caiman_asr_tpu.lm.ngram import find_ngram_path
from caiman_asr_tpu.models.config import load_config

BUNDLE_VERSION = 1


def create_serving_bundle(
    ckpt_path: str | Path,
    config_path: str | Path,
    output_path: str | Path,
    mel_stats_path: Optional[str | Path] = None,
    sentencepiece_path: Optional[str | Path] = None,
    ngram_path: Optional[str | Path] = None,
    ngram_scale: Optional[float] = None,
    skip_state_dict_check: bool = False,
    use_ema: bool = True,
) -> Path:
    params, ema, _, meta = load_checkpoint(ckpt_path)
    weights = ema if (use_ema and ema is not None) else params
    # training-only heads (pruned-loss simple projections) never serve;
    # strip them so the schema gate and bundle match dense-trained models
    weights = {
        k: v for k, v in weights.items()
        if k not in ("simple_am", "simple_lm")
    }

    norm_w = float(meta.get("logmel_norm_weight", 0.0))
    if not math.isclose(norm_w, 1.0):
        raise ValueError(
            f"logmel_norm_weight is {norm_w}, not 1.0: the mel-norm ramp did not "
            "complete during training; --resume past --norm_ramp_end_step first."
        )
    check_schema_training(weights, skip_state_dict_check)

    bundle = load_config(config_path)
    payload = {}
    for k, v in flatten_named(weights).items():
        payload[f"weights/{k}"] = np.asarray(v, np.float32)

    if mel_stats_path is not None:
        with np.load(mel_stats_path) as z:
            payload["melmeans"] = np.asarray(z["melmeans"], np.float32)
            payload["melvars"] = np.asarray(z["melvars"], np.float32)

    spm = sentencepiece_path or bundle.cfg.tokenizer.sentpiece_model
    if spm and Path(spm).exists():
        payload["sentencepiece"] = np.frombuffer(
            Path(spm).read_bytes(), dtype=np.uint8
        )

    ng = ngram_path
    if ng is None and bundle.cfg.ngram.ngram_path:
        ng = find_ngram_path(bundle.cfg.ngram.ngram_path)
    if ng and Path(ng).exists():
        payload["ngram"] = np.frombuffer(Path(ng).read_bytes(), dtype=np.uint8)
        payload["ngram_scale"] = np.float32(
            ngram_scale if ngram_scale is not None else bundle.cfg.ngram.scale_factor
        )

    info = {
        "version": BUNDLE_VERSION,
        "rnnt_config": bundle.raw.get("rnnt", {}),
        "step": meta.get("step"),
        "best_wer": meta.get("best_wer"),
        "tokenizer_kw": meta.get("tokenizer_kw", {}),
    }
    payload["bundle_meta"] = np.frombuffer(
        json.dumps(info).encode("utf-8"), dtype=np.uint8
    )
    output_path = Path(output_path)
    with open(output_path, "wb") as fh:
        np.savez(fh, **payload)
    return output_path


def load_serving_bundle(path: str | Path):
    """Returns (weights_tree, extras dict)."""
    from caiman_asr_tpu.export.checkpointer import unflatten_named

    with np.load(path) as z:
        weights = unflatten_named(
            {k[len("weights/"):]: z[k] for k in z.files if k.startswith("weights/")}
        )
        extras = {
            k: z[k] for k in z.files if not k.startswith("weights/") and k != "bundle_meta"
        }
        meta = json.loads(bytes(z["bundle_meta"]).decode("utf-8"))
    return weights, extras, meta


def main(argv=None):
    p = argparse.ArgumentParser(description="Build a serving bundle")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--output_ckpt", "--output", dest="output", required=True)
    p.add_argument("--mel_stats", default=None)
    p.add_argument("--sentencepiece", default=None)
    p.add_argument("--ngram_path", default=None)
    p.add_argument("--ngram_scale_factor", type=float, default=None)
    p.add_argument("--skip_ngram", action="store_true")
    p.add_argument("--skip_state_dict_check", action="store_true")
    args = p.parse_args(argv)
    out = create_serving_bundle(
        args.ckpt,
        args.config,
        args.output,
        mel_stats_path=args.mel_stats,
        sentencepiece_path=args.sentencepiece,
        ngram_path=None if args.skip_ngram else args.ngram_path,
        ngram_scale=args.ngram_scale_factor,
        skip_state_dict_check=args.skip_state_dict_check,
    )
    print(f"wrote serving bundle {out}")


if __name__ == "__main__":
    main()
