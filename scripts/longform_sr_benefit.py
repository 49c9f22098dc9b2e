"""Long-form WER benefit of state resets (and RSP training), measured.

The reference's claim: an LSTM streamed far past its trained context
drifts, and resetting the encoder state every N seconds cuts WER ~10%
relative on long utterances (reference docs/src/training/
state_resets.md:24-25); random state passing (RSP) trains the model to
tolerate a non-zero carried-in state (rsp.md). This harness measures
the DIRECTION and size of both effects end to end at this environment's
data scale.

Testbed: the tone-coded synthetic task (scripts/synthetic_e2e.py) —
each of 12 words is a distinct pure tone, so emissions are temporally
LOCAL and transcripts VARY per utterance. That matters: the
environment's one real transcribed clip cannot support this experiment
— a single-transcript overfit emits its text position-free at the start
of any audio, so segmented decoding's overlap merge (correctly)
deduplicates everything after segment 1 and the comparison degenerates
(measured: 31/248 words at every setting). With varied, aligned text
the long-form regime is real: models train on 3-8-word (~1-2 s)
utterances and are evaluated on ~64 s concatenated streams, far past
the trained context length.

Protocol:
1. train set: 240 short tone utterances; long-form eval set: streams of
   ~40 concatenated utterances (~64 s, ~200 words each).
2. Train TWO models: RSP OFF ([1,0,0]) and RSP ON (the reference's
   production [99,0,1], early activation).
3. Eval each on the long-form set: offline WITHOUT state resets,
   offline WITH --sr_segment 15 --sr_overlap 3 (reference defaults),
   and through the SERVING shadow-lane path (StateResetRouter).

Emits the {RSP off/on} x {no-SR, SR-offline, SR-serving} WER table
PARITY.md cites.

    python scripts/longform_sr_benefit.py [--steps 3000] [--cpu]
        [--workdir DIR] [--n-streams 3] [--utts-per-stream 40]
"""

import argparse
import json
import os
import sys
import tempfile
import wave as _wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from scripts.synthetic_e2e import (  # noqa: E402
    CONFIG, SR, WORDS, synth, write_set,
)


def train_model(root: Path, steps: int, rsp_on: bool, seed: int):
    from caiman_asr_tpu.args.train import train_arg_parser
    from caiman_asr_tpu.data.generate_mel_stats import main as mel_main
    from caiman_asr_tpu.data.tokenizer import (
        save_tokenizer_json, train_tokenizer,
    )
    from caiman_asr_tpu.train import main as train_main

    freqs = {w: 300 + 150 * i for i, w in enumerate(WORDS)}
    texts = write_set(root, "train", 240, 1, freqs)
    write_set(root, "dev", 32, 2, freqs)
    save_tokenizer_json(root / "tok.json",
                        train_tokenizer(texts, vocab_size=64))
    cfg = root / "cfg.yaml"
    cfg.write_text(CONFIG.format(tok=root / "tok.json"))
    mel_main(["--model_config", str(cfg), "--dataset_dir", str(root),
              "--manifests", "train.json",
              "--output_path", str(root / "mel_stats.npz")])

    argv = [
        "--model_config", str(cfg), "--dataset_dir", str(root),
        "--train_manifests", "train.json", "--val_manifests", "dev.json",
        "--output_dir", str(root / "out"),
        "--global_batch_size", "16", "--grad_accumulation_batches", "1",
        "--training_steps", str(steps),
        "--val_frequency", str(max(steps // 4, 100)),
        "--save_frequency", str(steps), "--log_frequency", "200",
        "--prediction_frequency", str(steps * 10),
        "--warmup_steps", "40", "--hold_steps", str(steps // 4),
        "--half_life_steps", str(steps // 8),
        "--lr", "2e-3", "--val_batch_size", "16", "--ema", "0.99",
        "--mel_stats_path", str(root / "mel_stats.npz"),
        "--seed", str(seed),
    ]
    if rsp_on:
        # the reference's production frequency, activated early enough to
        # shape most of the run (rsp.md: the model learns to accept a
        # carried-over state instead of zeros)
        argv += ["--rsp_seq_len_freq", "99", "0", "1",
                 "--rsp_delay", str(max(100, steps // 8))]
    else:
        argv += ["--rsp_seq_len_freq", "1", "0", "0"]
    targs = train_arg_parser().parse_args(argv)
    _, best_wer = train_main(targs)
    print(f"[train rsp={'on' if rsp_on else 'off'}] "
          f"short-utterance dev WER {best_wer:.3%}", flush=True)
    return cfg, root / "tok.json", root / "mel_stats.npz", \
        root / "out" / "ckpts" / "best.npz", best_wer


def build_longform(work: Path, n_streams: int, utts_per_stream: int):
    freqs = {w: 300 + 150 * i for i, w in enumerate(WORDS)}
    rng = np.random.default_rng(77)  # held-out stream content
    utts = []
    for s in range(n_streams):
        parts, words_all = [], []
        for _ in range(utts_per_stream):
            words = [WORDS[j]
                     for j in rng.integers(0, len(WORDS),
                                           int(rng.integers(3, 8)))]
            parts.append(synth(words, freqs, rng))
            words_all.extend(words)
        audio = np.concatenate(parts)
        path = work / f"long{s}.wav"
        with _wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(
                (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
            )
        dur = len(audio) / SR
        utts.append({
            "transcript": " ".join(words_all),
            "files": [{"channels": 1, "sample_rate": float(SR),
                       "duration": dur, "fname": str(path)}],
            "original_duration": dur,
        })
        print(f"long-form stream {s}: {dur:.1f} s, "
              f"{len(words_all)} ref words", flush=True)
    path = work / "longform_manifest.json"
    path.write_text(json.dumps(utts))
    return path, utts


def offline_wer(cfg, stats_path, ckpt, work, manifest, sr_segment=0.0,
                sr_overlap=3.0, tag=""):
    from caiman_asr_tpu.val import val_arg_parser, validate

    vargs = val_arg_parser().parse_args([
        "--model_config", str(cfg), "--dataset_dir", str(work),
        "--val_manifests", str(manifest),
        "--ckpt", str(ckpt),
        "--output_dir", str(work / f"valout_{tag}"),
        "--val_batch_size", "1",
        "--mel_stats_path", str(stats_path),
    ] + (["--sr_segment", str(sr_segment), "--sr_overlap", str(sr_overlap)]
         if sr_segment else []))
    return float(validate(vargs).wer)


def serving_wer(cfg, tok, stats_path, ckpt, utts, sr_segment, sr_overlap):
    """Long-form streams through the REAL serving engine, with the
    shadow-lane state-reset router when sr_segment > 0."""
    import jax

    from caiman_asr_tpu.data.audio import read_audio
    from caiman_asr_tpu.evaluate.wer import word_error_rate
    from caiman_asr_tpu.export.checkpointer import (
        apply_params, load_checkpoint,
    )
    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.serving.engine import StreamingEngine
    from caiman_asr_tpu.serving.state_resets import StateResetRouter
    from caiman_asr_tpu.setup.builders import (
        build_model, build_tokenizer, load_mel_stats,
    )

    bundle = load_config(str(cfg))
    tokenizer = build_tokenizer(bundle.cfg, str(tok))
    model, blank_idx = build_model(bundle.cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    loaded, ema, _, _ = load_checkpoint(ckpt)
    params = apply_params(params, ema if ema is not None else loaded)
    eng = StreamingEngine(
        model, params, blank_idx, tokenizer,
        mel_stats=load_mel_stats(str(stats_path)),
        logmel=bundle.cfg.input_val.logmel,
        max_streams=4, native_serializer=False, max_symbols_per_step=8,
    )
    if sr_segment:
        eng = StateResetRouter(eng, segment_secs=sr_segment,
                               overlap_secs=sr_overlap)
    hyps, refs = [], []
    for u in utts:
        lane = eng.open_stream()
        audio = read_audio(u["files"][0]["fname"], SR)
        hop = 960
        text = []

        def consume(out):
            got_eos = False
            for r in ([out[lane]] if isinstance(out.get(lane), dict)
                      else out.get(lane, [])):
                if "alternatives" in r:
                    text.append(r["alternatives"][0]["transcript"])
                got_eos = got_eos or r.get("eos", False)
            return got_eos

        for i in range(0, len(audio), hop):
            chunk = audio[i: i + hop]
            if len(chunk) < hop:
                chunk = np.pad(chunk, (0, hop - len(chunk)))
            eng.push_audio(lane, chunk)
            consume(eng.tick())
        for _ in range(4):
            eng.push_audio(lane, np.zeros(hop, np.float32))
            consume(eng.tick())
        eng.close_stream(lane)
        for _ in range(64):
            if consume(eng.tick()):
                break
        hyps.append("".join(text).strip())
        refs.append(u["transcript"].lower())
    eng.close()
    return float(word_error_rate(hyps, refs).wer)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--n-streams", type=int, default=3)
    p.add_argument("--utts-per-stream", type=int, default=56,
                   help="~56 x ~1.15 s = ~64 s per stream")
    p.add_argument("--sr-segments", type=str, default="15,5,2.5",
                   help="comma list of sr_segment seconds to sweep; the "
                        "reference default is 15 (for models trained on "
                        "10-20 s utterances) — the benefit tracks the "
                        "segment/trained-context ratio, so shorter "
                        "segments matter when the trained context is "
                        "~1 s (overlap = segment/5, the reference ratio)")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=1"
        import jax

        jax.config.update("jax_platforms", "cpu")

    work = Path(args.workdir or tempfile.mkdtemp(prefix="longform_sr_"))
    work.mkdir(parents=True, exist_ok=True)
    long_manifest, long_utts = build_longform(
        work, args.n_streams, args.utts_per_stream
    )

    segments = [float(s) for s in args.sr_segments.split(",")]
    rows = {}
    for rsp_on in (False, True):
        sub = work / ("rsp_on" if rsp_on else "rsp_off")
        sub.mkdir(exist_ok=True)
        cfg, tok, stats, ckpt, dev_wer = train_model(
            sub, args.steps, rsp_on, args.seed
        )
        no_sr = offline_wer(cfg, stats, ckpt, sub, long_manifest, tag="nosr")
        srv_no = serving_wer(cfg, tok, stats, ckpt, long_utts, 0.0, 0.0)
        sr_off, sr_srv = {}, {}
        for seg in segments:
            ov = seg / 5.0
            sr_off[seg] = offline_wer(
                cfg, stats, ckpt, sub, long_manifest,
                sr_segment=seg, sr_overlap=ov, tag=f"sr{seg}",
            )
            sr_srv[seg] = serving_wer(cfg, tok, stats, ckpt, long_utts,
                                      seg, ov)
            print(f"[rsp={'on' if rsp_on else 'off'}] seg={seg}: "
                  f"offline SR {sr_off[seg]:.3%} | "
                  f"serving SR(shadow) {sr_srv[seg]:.3%}", flush=True)
        rows[rsp_on] = (dev_wer, no_sr, srv_no, sr_off, sr_srv)
        print(f"[rsp={'on' if rsp_on else 'off'}] long-form WER: "
              f"offline no-SR {no_sr:.3%} | serving no-SR {srv_no:.3%}",
              flush=True)

    print("\n=== long-form tone streams ({} x >=60 s) WER "
          "(overlap = segment/5) ===".format(args.n_streams))
    head = f"{'training':10s} {'short dev':>9s} {'off nosr':>9s} " \
           f"{'srv nosr':>9s}"
    for seg in segments:
        head += f" {'off@' + str(seg):>9s} {'srv@' + str(seg):>9s}"
    print(head)
    for rsp_on in (False, True):
        dev_wer, no_sr, srv_no, sr_off, sr_srv = rows[rsp_on]
        line = (f"{'RSP on' if rsp_on else 'RSP off':10s} "
                f"{dev_wer:9.3%} {no_sr:9.3%} {srv_no:9.3%}")
        for seg in segments:
            line += f" {sr_off[seg]:9.3%} {sr_srv[seg]:9.3%}"
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
