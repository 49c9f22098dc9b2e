"""Append an end-of-sentence token to manifest transcripts
(reference: scripts/eos_add.py), enabling EOS-aware training/decoding.

Run: python -m caiman_asr_tpu.data.eos_add --manifest in.json \
       --output out.json --eos_token "<EOS>"
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="append EOS token to transcripts")
    p.add_argument("--manifest", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--eos_token", default="<EOS>")
    args = p.parse_args(argv)

    with open(args.manifest) as fh:
        entries = json.load(fh)
    for e in entries:
        t = e["transcript"].rstrip()
        if not t.endswith(args.eos_token):
            e["transcript"] = f"{t} {args.eos_token}"
    with open(args.output, "w") as fh:
        json.dump(entries, fh, indent=1)
    print(f"wrote {args.output} ({len(entries)} entries)")


if __name__ == "__main__":
    main()
