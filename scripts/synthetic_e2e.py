#!/usr/bin/env python3
"""Self-contained end-to-end sanity run on synthetic tone-coded speech.

Generates a dataset where each of 12 words is a distinct pure tone, trains
a small RNN-T from scratch, and validates — demonstrating the full pipeline
(FLAC/wav decode -> log-mel -> model -> fused Pallas loss -> LAMB -> EMA ->
greedy/beam decode -> WER) learns. On a TPU v5e this reaches <5% dev WER in
~3000 steps (~5 minutes); the equivalent role of the reference's
scripts/test_mini_train_and_cleanup.sh, but with a learnable task instead of
4 smoke steps.

Run: python scripts/synthetic_e2e.py --workdir /tmp/tones_e2e --steps 3000
"""

import argparse
import json
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima"]
SR = 16000

CONFIG = """
tokenizer:
  sentpiece_model: {tok}
  labels: [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l",
           "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y",
           "z", "'"]
  sampling: 0.0
input_val:
  audio_dataset: &val_dataset
    sample_rate: 16000
    trim_silence: false
    normalize_transcripts: lowercase
    standardize_wer: true
    error_rate: word
  filterbank_features: &val_features
    sample_rate: 16000
    window_size: 0.025
    window_stride: 0.01
    n_fft: 512
    n_filt: 80
    dither: 0.00001
  frame_splicing: &val_splicing
    frame_stacking: 3
    frame_subsampling: 3
input_train:
  audio_dataset:
    !!merge <<: *val_dataset
    max_duration: 20.0
  filterbank_features: *val_features
  frame_splicing: *val_splicing
rnnt:
  in_feats: 240
  enc_n_hid: 128
  enc_pre_rnn_layers: 1
  enc_post_rnn_layers: 1
  enc_stack_time_factor: 2
  enc_dropout: 0.1
  pred_n_hid: 64
  pred_rnn_layers: 1
  joint_n_hid: 128
  pred_dropout: 0.1
  joint_dropout: 0.1
  forget_gate_bias: 1.0
grad_noise_scheduler:
  noise_level: 0.0
"""


def synth(words, freqs, rng):
    parts = []
    for w in words:
        t = np.arange(int(0.18 * SR)) / SR
        tone = 0.3 * np.sin(2 * np.pi * freqs[w] * t) * np.hanning(len(t))
        parts += [tone, np.zeros(int(0.05 * SR))]
    return np.concatenate(parts).astype(np.float32)


def write_set(root, name, n, seed, freqs):
    r = np.random.default_rng(seed)
    entries, texts = [], []
    for i in range(n):
        words = [WORDS[j] for j in r.integers(0, len(WORDS), r.integers(3, 8))]
        audio = synth(words, freqs, r)
        fn = f"{name}_{i:04d}.wav"
        with wave.open(str(root / fn), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())
        dur = len(audio) / SR
        entries.append({"transcript": " ".join(words),
                        "files": [{"fname": fn, "duration": dur}],
                        "original_duration": dur})
        texts.append(entries[-1]["transcript"])
    (root / f"{name}.json").write_text(json.dumps(entries))
    return texts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/tones_e2e")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument(
        "--pruned", type=int, default=0, metavar="S",
        help="train with the two-stage pruned loss (band width S) instead "
             "of the exact dense loss — the quality-parity check for "
             "--pruned_loss_range",
    )
    p.add_argument("--seed", type=int, default=1,
                   help="training seed (init + data order) for repeat runs")
    p.add_argument(
        "--compare_decoders", action="store_true",
        help="after training, table greedy vs fast_beam vs fast_beam+LM vs "
             "host beam+LM dev WERs (LM trained on the train transcripts)",
    )
    args = p.parse_args()

    from caiman_asr_tpu.data.generate_mel_stats import main as mel_main
    from caiman_asr_tpu.data.tokenizer import save_tokenizer_json, train_tokenizer
    from caiman_asr_tpu.train import main as train_main
    from caiman_asr_tpu.args.train import train_arg_parser
    from caiman_asr_tpu.val import val_arg_parser, validate

    root = Path(args.workdir)
    root.mkdir(parents=True, exist_ok=True)
    freqs = {w: 300 + 150 * i for i, w in enumerate(WORDS)}
    texts = write_set(root, "train", 240, 1, freqs)
    write_set(root, "dev", 32, 2, freqs)
    save_tokenizer_json(root / "tok.json", train_tokenizer(texts, vocab_size=64))
    cfg = root / "cfg.yaml"
    cfg.write_text(CONFIG.format(tok=root / "tok.json"))
    print(f"dataset ready under {root}")

    mel_main(["--model_config", str(cfg), "--dataset_dir", str(root),
              "--manifests", "train.json",
              "--output_path", str(root / "mel_stats.npz")])

    targs = train_arg_parser().parse_args([
        "--model_config", str(cfg), "--dataset_dir", str(root),
        "--train_manifests", "train.json", "--val_manifests", "dev.json",
        "--output_dir", str(root / "out"),
        "--global_batch_size", "16", "--grad_accumulation_batches", "1",
        "--training_steps", str(args.steps),
        "--val_frequency", str(max(args.steps // 6, 100)),
        "--save_frequency", str(args.steps), "--log_frequency", "200",
        "--prediction_frequency", str(args.steps * 10),
        "--warmup_steps", "40", "--hold_steps", str(args.steps // 4),
        "--half_life_steps", str(args.steps // 8),
        "--lr", str(args.lr), "--val_batch_size", "16", "--ema", "0.99",
        "--mel_stats_path", str(root / "mel_stats.npz"),
        "--norm_ramp_start_step", "200",
        "--norm_ramp_end_step", str(max(args.steps // 3, 400)),
        "--seed", str(args.seed),
    ] + (["--pruned_loss_range", str(args.pruned)] if args.pruned else []))
    _, best_wer = train_main(targs)

    vargs = val_arg_parser().parse_args([
        "--model_config", str(cfg), "--dataset_dir", str(root),
        "--val_manifests", "dev.json", "--output_dir", str(root / "valout"),
        "--ckpt", str(root / "out" / "ckpts" / "best.npz"),
        "--mel_stats_path", str(root / "mel_stats.npz"),
        "--decoder", "fast_beam", "--beam_width", "4",
    ])
    result = validate(vargs)
    print(f"\nfinal: greedy-best dev WER {best_wer:.2%}, "
          f"beam-4 dev WER {result.wer:.2%}")
    # convergence reference: ~66% @1200 steps, ~12% @2000, <5% @3000
    if args.steps >= 2500:
        assert result.wer < 0.2, "synthetic task failed to learn"

    if args.compare_decoders:
        # decoder-quality table on the trained model (VERDICT: fast_beam+LM
        # vs greedy, consistent with the adaptive host beam)
        from caiman_asr_tpu.lm.train_ngram import main as ngram_main

        ngram_main([
            "--manifests", "train.json", "--dataset_dir", str(root),
            "--tokenizer_model", str(root / "tok.json"),
            "--order", "3", "--output_dir", str(root / "ngram"),
        ])
        runs = [
            ("greedy", ["--decoder", "greedy"]),
            ("fast_beam-4", ["--decoder", "fast_beam", "--beam_width", "4"]),
            ("fast_beam-4+lm", [
                "--decoder", "fast_beam", "--beam_width", "4",
                "--ngram_path", str(root / "ngram" / "ngram.arpa"),
                "--ngram_scale_factor", "0.3",
            ]),
            ("host_beam-4+lm", [
                "--decoder", "beam", "--beam_width", "4",
                "--ngram_path", str(root / "ngram" / "ngram.arpa"),
                "--ngram_scale_factor", "0.3",
            ]),
        ]
        table = {}
        for name, extra in runs:
            va = val_arg_parser().parse_args([
                "--model_config", str(cfg), "--dataset_dir", str(root),
                "--val_manifests", "dev.json",
                "--output_dir", str(root / f"valout_{name}"),
                "--ckpt", str(root / "out" / "ckpts" / "best.npz"),
                "--mel_stats_path", str(root / "mel_stats.npz"),
            ] + extra)
            table[name] = validate(va).wer
        print("\ndecoder comparison (dev WER):")
        for name, wer in table.items():
            print(f"  {name:16s} {wer:.2%}")
        assert table["fast_beam-4+lm"] <= table["fast_beam-4"] + 1e-9, (
            "LM fusion must not hurt on in-domain synthetic text"
        )


if __name__ == "__main__":
    main()
