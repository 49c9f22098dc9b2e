"""LibriSpeech download + manifest preparation
(reference: data/make_datasets/librispeech.py, 269 LoC).

Downloads requested subsets from openslr.org, verifies MD5, extracts, parses
``*.trans.txt`` transcripts, and writes JSON manifests in the framework's
format: one entry per utterance with ``transcript``, ``files:[{fname,
duration}]`` and ``original_duration``.

Run: python -m caiman_asr_tpu.data.make_datasets.librispeech \
       --data_dir /datasets/LibriSpeech --subsets dev-clean test-clean
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List

from caiman_asr_tpu.data.make_datasets.io import (
    audio_duration,
    download_file,
    extract_tar,
    md5_checksum,
)

URL_BASE = "https://www.openslr.org/resources/12"

MD5 = {
    "dev-clean": "42e2234ba48799c1f50f24a7926300a1",
    "dev-other": "c8d0bcc9cca99d4f8b62fcc847357931",
    "test-clean": "32fa31d27d2e1cad72775fee3f4849a9",
    "test-other": "fb5a50374b501bb3bac4815ee91d3135",
    "train-clean-100": "2a93770f6d5c6c964bc36631d331a522",
    "train-clean-360": "c0e676e450a7ff2f54aeade5171606fa",
    "train-other-500": "d1a0fd59409feb2c614ce4d30c387708",
}


def parse_trans_file(path: Path) -> Dict[str, str]:
    """``<utt-id> <TRANSCRIPT>`` lines -> {utt-id: transcript}."""
    out = {}
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        utt_id, _, text = line.partition(" ")
        out[utt_id] = text.strip().lower()
    return out


def prepare_manifest(subset_dir: Path, data_dir: Path) -> List[dict]:
    entries = []
    for trans in sorted(subset_dir.rglob("*.trans.txt")):
        transcripts = parse_trans_file(trans)
        for utt_id, text in transcripts.items():
            flac = trans.parent / f"{utt_id}.flac"
            if not flac.exists():
                continue
            dur = audio_duration(flac)
            entries.append(
                {
                    "transcript": text,
                    "files": [
                        {"fname": str(flac.relative_to(data_dir)), "duration": dur}
                    ],
                    "original_duration": dur,
                    "original_num_samples": int(dur * 16000),
                }
            )
    return entries


def prepare_subset(data_dir: Path, subset: str, skip_download: bool = False) -> Path:
    extracted = data_dir / "LibriSpeech" / subset
    if not extracted.exists() and not skip_download:
        tar = download_file(f"{URL_BASE}/{subset}.tar.gz", data_dir / f"{subset}.tar.gz")
        if subset in MD5 and not md5_checksum(tar, MD5[subset]):
            raise RuntimeError(f"MD5 mismatch for {tar}")
        extract_tar(tar, data_dir)
    if not extracted.exists():
        raise FileNotFoundError(f"{extracted} not found")
    entries = prepare_manifest(extracted, data_dir)
    if not entries:
        raise RuntimeError(f"no utterances found under {extracted}")
    manifest = data_dir / f"librispeech-{subset}-flac.json"
    manifest.write_text(json.dumps(entries, indent=1))
    print(f"wrote {manifest} ({len(entries)} utterances)")
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description="LibriSpeech preparation")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--subsets", nargs="+", default=["dev-clean"],
                   choices=sorted(MD5))
    p.add_argument("--skip_download", action="store_true",
                   help="only build manifests from already-extracted data")
    args = p.parse_args(argv)
    for subset in args.subsets:
        prepare_subset(Path(args.data_dir), subset, args.skip_download)


if __name__ == "__main__":
    main()
