"""Train a sentencepiece-compatible tokenizer from manifests
(reference: data/spm/spm_from_json.py + scripts/train_spm).

Writes both a ``.json`` vocab (framework-native) and an SPM-compatible
binary ``.model`` protobuf (data/tokenizer.py save_sentencepiece_model) so
checkpoints interoperate with reference tooling.

Run: python -m caiman_asr_tpu.data.spm_train --manifests train.json \
       --dataset_dir DATA --vocab_size 8703 --output_prefix DATA/spm8703
"""

from __future__ import annotations

import argparse

from caiman_asr_tpu.data.manifest import load_manifests
from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript
from caiman_asr_tpu.data.tokenizer import (
    save_sentencepiece_model,
    save_tokenizer_json,
    train_tokenizer,
)

CHARSET = list(" abcdefghijklmnopqrstuvwxyz'")


def main(argv=None):
    p = argparse.ArgumentParser(description="train sentencepiece vocab")
    p.add_argument("--manifests", nargs="+", required=True)
    p.add_argument("--dataset_dir", default=".")
    p.add_argument("--vocab_size", type=int, default=8703)
    p.add_argument("--output_prefix", required=True)
    p.add_argument("--max_corpus", type=int, default=None)
    args = p.parse_args(argv)

    utts = load_manifests([f"{args.dataset_dir}/{m}" for m in args.manifests])
    corpus = [
        normalize_transcript(u.transcript, CHARSET, NormalizeConfig())
        for u in utts
    ]
    if args.max_corpus:
        corpus = corpus[: args.max_corpus]
    pieces = train_tokenizer(corpus, vocab_size=args.vocab_size)
    save_tokenizer_json(f"{args.output_prefix}.json", pieces)
    save_sentencepiece_model(f"{args.output_prefix}.model", pieces)
    print(f"trained {len(pieces)}-piece vocab -> {args.output_prefix}.{{json,model}}")


if __name__ == "__main__":
    main()
