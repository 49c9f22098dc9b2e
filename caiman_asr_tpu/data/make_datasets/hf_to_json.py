"""Convert a HuggingFace audio dataset to local wavs + a JSON manifest
(reference: data/make_datasets/ HF converter).

Run: python -m caiman_asr_tpu.data.make_datasets.hf_to_json \
       --dataset openslr/librispeech_asr --split validation.clean \
       --output_dir DATA/ls_dev --text_column text
"""

from __future__ import annotations

import argparse
import json
import wave
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="HF dataset -> wav + JSON manifest")
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--audio_column", default="audio")
    p.add_argument("--text_column", default="text")
    p.add_argument("--max_utts", type=int, default=None)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args(argv)

    from caiman_asr_tpu.data.hugging_face import HuggingFaceReader

    out = Path(args.output_dir)
    (out / "audio").mkdir(parents=True, exist_ok=True)
    reader = HuggingFaceReader(
        args.dataset, split=args.split, config=args.config,
        audio_column=args.audio_column, text_column=args.text_column,
        sample_rate=args.sample_rate,
    )
    entries = []
    for i, (audio, text, key) in enumerate(reader):
        if args.max_utts and i >= args.max_utts:
            break
        fname = f"audio/{i:08d}.wav"
        with wave.open(str(out / fname), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(args.sample_rate)
            w.writeframes(
                (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
            )
        dur = len(audio) / args.sample_rate
        entries.append(
            {
                "transcript": text,
                "files": [{"fname": fname, "duration": dur}],
                "original_duration": dur,
            }
        )
    manifest = out / "manifest.json"
    manifest.write_text(json.dumps(entries, indent=1))
    print(f"wrote {manifest} ({len(entries)} utterances)")


if __name__ == "__main__":
    main()
