"""Validate multiple checkpoints (reference: val_multiple.py).

Runs validation for every checkpoint matching a glob and reports a WER
table (JSON lines + summary).

Run: python -m caiman_asr_tpu.val_multiple --ckpt_glob 'out/ckpts/step*.npz' ...
"""

from __future__ import annotations

import glob
import json

from caiman_asr_tpu.val import val_arg_parser, validate


def main(argv=None):
    parser = val_arg_parser()
    parser.add_argument("--ckpt_glob", type=str, required=True)
    args = parser.parse_args(argv)

    paths = sorted(glob.glob(args.ckpt_glob))
    if not paths:
        raise FileNotFoundError(f"no checkpoints match {args.ckpt_glob}")
    results = []
    for path in paths:
        args.ckpt = path
        res = validate(args)
        results.append({"ckpt": path, "wer": res.wer, "loss": res.loss})
    best = min(results, key=lambda r: r["wer"])
    print(json.dumps({"results": results, "best": best}, indent=1))
    return results


if __name__ == "__main__":
    main()
