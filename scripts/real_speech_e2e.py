"""Real-speech end-to-end learning proof.

Trains a small model on real recorded speech (the reference's only
genuinely-transcribed test clip — 8.9 s of courtroom audio from
People's Speech, tests/test_data/peoples-speech-short.json) until the
greedy decode reproduces the transcript, then checks the streaming
serving engine emits the same text. Complements scripts/synthetic_e2e.py
(tone-coded synthetic task) with evidence that the fused log-mel
frontend + transducer loss + LAMB learn *real* audio end to end.

Usage:
    python scripts/real_speech_e2e.py [--steps 800] [--cpu]

The default recipe (800 steps, lr 4e-3 held for a third then halving
every steps/16, RSP off, delay penalty 0.01) converges deterministically;
see the flag comments for why RSP and the delay penalty are set.

Writes nothing outside --workdir (a temp dir by default).
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REF_DATA = Path("/root/reference/training/tests/test_data")

CONFIG = """
tokenizer:
  sentpiece_model: {tok}
  labels: [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
           "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z", "'"]
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
    dither: 0.0
  frame_splicing: &val_splicing
    frame_stacking: 3
    frame_subsampling: 3
input_train:
  audio_dataset:
    !!merge <<: *val_dataset
    max_duration: 20.0
  filterbank_features: *val_features
  frame_splicing: *val_splicing
  spec_augment:
    freq_masks: 0
    min_freq: 0
    max_freq: 0
    time_masks: 0
    min_time: 0
    max_time: 0.0
rnnt:
  in_feats: 240
  enc_n_hid: 160
  enc_pre_rnn_layers: 1
  enc_post_rnn_layers: 2
  enc_stack_time_factor: 2
  enc_dropout: 0.0
  pred_n_hid: 128
  pred_rnn_layers: 1
  pred_dropout: 0.0
  joint_n_hid: 128
  joint_dropout: 0.0
  forget_gate_bias: 1.0
grad_noise_scheduler:
  noise_level: 0.0
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--manifest", type=str,
                   default=str(REF_DATA / "peoples-speech-short.json"))
    p.add_argument("--dataset_dir", type=str, default=str(REF_DATA))
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--pruned", type=int, default=0,
                   help="pruned-loss band width S (0 = dense loss)")
    p.add_argument("--lr", type=float, default=4e-3)
    p.add_argument("--aug", action="store_true",
                   help="augmented-real task: train on the clip mixed with "
                        "the reference's real noise recording (TestNoise"
                        "Dataset) at SNRs [clean, 20, 10, 5 dB] plus speed "
                        "0.9x/1.1x; validate on HELD-OUT SNRs [15, 8 dB] — "
                        "a generalization (not overfit) signal across real "
                        "acoustic conditions for the dense-vs-pruned sweep")
    p.add_argument("--half_life_div", type=int, default=16,
                   help="half_life_steps = steps // this (larger = faster "
                        "decay; the single-utterance overfit bounces if the "
                        "late-phase lr stays hot)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=1"
        import jax

        jax.config.update("jax_platforms", "cpu")

    work = Path(args.workdir or tempfile.mkdtemp(prefix="real_e2e_"))
    work.mkdir(parents=True, exist_ok=True)

    manifest = json.load(open(args.manifest))
    # keep only genuinely-transcribed clips (the reference's duplicate
    # clip carries a placeholder transcript for other tests)
    utts = [u for u in manifest if "repeated" not in u["transcript"]]
    for u in utts:  # absolute audio paths: the manifest lives in workdir
        u["files"][0]["fname"] = str(
            Path(args.dataset_dir) / u["files"][0]["fname"]
        )
    texts = [u["transcript"].lower() for u in utts]
    print(f"{len(utts)} real utterance(s): {[t[:50] for t in texts]}")
    (work / "manifest.json").write_text(json.dumps(utts))

    val_manifest = work / "manifest.json"
    if args.aug:
        import wave as _wave

        import numpy as np

        from caiman_asr_tpu.data.audio import read_audio, resample

        noise_path = (
            Path(args.dataset_dir) / "TestNoiseDataset" / "data"
            / "noise_file.wav"
        )
        clean = read_audio(str(utts[0]["files"][0]["fname"]), 16000)
        noise = read_audio(str(noise_path), 16000)
        reps = int(np.ceil(len(clean) / len(noise)))
        noise_t = np.tile(noise, reps)[: len(clean)]
        p_s = float(np.mean(clean**2))
        p_n = float(np.mean(noise_t**2)) or 1e-12

        def mix(snr_db: float) -> np.ndarray:
            scale = np.sqrt(p_s / (p_n * 10.0 ** (snr_db / 10.0)))
            out = clean + scale * noise_t
            peak = np.abs(out).max()
            return out / peak * 0.95 if peak > 1.0 else out

        def speed(factor: float) -> np.ndarray:
            # play f-times faster: resample to sr/f samples, declare sr
            return resample(clean, 16000, int(round(16000 / factor)))

        def write_wav(name: str, audio: np.ndarray) -> dict:
            path = work / name
            with _wave.open(str(path), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(
                    (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
                )
            return {
                "transcript": utts[0]["transcript"],
                "files": [{"channels": 1, "sample_rate": 16000.0,
                           "duration": len(audio) / 16000.0,
                           "fname": str(path)}],
                "original_duration": len(audio) / 16000.0,
            }

        train_utts = [
            write_wav("clean.wav", clean),
            write_wav("snr20.wav", mix(20.0)),
            write_wav("snr10.wav", mix(10.0)),
            write_wav("snr5.wav", mix(5.0)),
            write_wav("sp090.wav", speed(0.9)),
            write_wav("sp110.wav", speed(1.1)),
        ]
        val_utts = [
            write_wav("val_snr15.wav", mix(15.0)),
            write_wav("val_snr8.wav", mix(8.0)),
        ]
        (work / "manifest.json").write_text(json.dumps(train_utts))
        val_manifest = work / "val_manifest.json"
        val_manifest.write_text(json.dumps(val_utts))
        utts = train_utts
        print(f"aug task: {len(train_utts)} train conds, "
              f"{len(val_utts)} held-out val conds (real noise mix)")

    from caiman_asr_tpu.data.tokenizer import save_tokenizer_json, train_tokenizer

    tok = work / "tok.json"
    save_tokenizer_json(tok, train_tokenizer(texts * 8, vocab_size=64))
    cfg = work / "model.yaml"
    cfg.write_text(CONFIG.format(tok=tok))

    # dataset mel stats over the clip so train/val/serving all normalize
    # identically (streaming cannot use per-utterance stats)
    from caiman_asr_tpu.data.generate_mel_stats import main as gen_stats

    stats_path = work / "mel_stats.npz"
    gen_stats([
        "--model_config", str(cfg), "--dataset_dir", args.dataset_dir,
        "--manifests", str(work / "manifest.json"),
        "--output_path", str(stats_path),
    ])

    from caiman_asr_tpu.args.train import train_arg_parser

    targs = train_arg_parser().parse_args([])
    targs.mel_stats_path = str(stats_path)
    targs.norm_starting_ratio = 1.0  # dataset-stats norm from step 0
    targs.model_config = str(cfg)
    targs.output_dir = str(work / "out")
    targs.dataset_dir = args.dataset_dir
    targs.train_manifests = [str(work / "manifest.json")]
    targs.val_manifests = [str(val_manifest)]
    targs.global_batch_size = max(1, len(utts))
    targs.grad_accumulation_batches = 1
    targs.training_steps = args.steps
    targs.val_frequency = args.steps
    targs.save_frequency = args.steps
    targs.log_frequency = 50
    targs.prediction_frequency = args.steps
    targs.val_batch_size = max(1, len(utts))
    targs.warmup_steps = 32
    targs.hold_steps = max(1, args.steps // 3)
    targs.half_life_steps = max(1, args.steps // args.half_life_div)
    targs.lr = args.lr
    targs.seed = args.seed
    targs.pruned_loss_range = args.pruned
    targs.weights_init_scale = 0.5
    targs.num_buckets = 1
    # overfit proof: EMA lags the raw weights by design and would hide
    # convergence at these step counts
    targs.ema = 0.0
    # RSP (on by default, [99,0,1]) activates at warmup+hold+3*half_life and
    # each 1%-chance concat event destabilizes a B=1 single-clip overfit for
    # tens of steps (measured: every late-phase loss spike in this script's
    # runs landed after the RSP delay step) — it's a long-context training
    # feature, not part of this learning proof
    targs.rsp_seq_len_freq = [1, 0, 0]
    # B=1 overfits can converge to diffuse alignments: teacher-forced NLL
    # ~0 but each individual tail emission stays below blank at every
    # frame, so greedy truncates (observed: all tokens emitted by frame 19
    # of 149, then blanks). A small constant delay penalty concentrates
    # alignment mass (the reference trains streaming models with one too,
    # delay_penalty.md) and makes greedy follow the learned sequence.
    targs.delay_penalty = "0.01"

    from caiman_asr_tpu import train as train_mod

    state, best_wer = train_mod.main(targs)
    print(f"final dev WER after {args.steps} steps: {best_wer:.3%}")

    if args.aug:
        # Quality-matrix rows beyond greedy on the SAME held-out-SNR dev
        # set (round-5: the reference's headline quality numbers are
        # beam+ngram rows, performance.md:24, and its FPGA deployment runs
        # quantized arithmetic): (a) the DEVICE fast_beam at width 4 with
        # the production pruning thresholds (0.4/1.5) and shallow fusion
        # against an n-gram trained on the training transcripts; (b)
        # greedy under `quantize: true` (BFP-8 weights/acts + bf16 gate
        # arithmetic, the FPGA-parity eval mode).
        from caiman_asr_tpu.data.tokenizer import Tokenizer
        from caiman_asr_tpu.lm.train_ngram import train_ngram_from_sentences
        from caiman_asr_tpu.val import val_arg_parser, validate

        tokz = Tokenizer(list(" abcdefghijklmnopqrstuvwxyz'"), str(tok))
        sentences = [
            [tokz.id_to_piece(i) for i in tokz.tokenize(t.lower())]
            for t in texts
        ] * 4
        arpa = train_ngram_from_sentences(sentences, 3, work / "lm")
        common = [
            "--model_config", str(cfg), "--dataset_dir", str(work),
            "--val_manifests", str(val_manifest),
            "--ckpt", str(work / "out" / "ckpts" / "last.npz"),
            "--val_batch_size", "2",
            "--mel_stats_path", str(stats_path),
        ]
        beam_res = validate(val_arg_parser().parse_args(common + [
            "--output_dir", str(work / "valout_beam"),
            "--decoder", "fast_beam", "--beam_width", "4",
            "--ngram_path", str(arpa),
        ]))
        cfg_q = work / "model_q.yaml"
        cfg_q.write_text(
            cfg.read_text().replace("rnnt:", "rnnt:\n  quantize: true", 1)
        )
        quant_res = validate(val_arg_parser().parse_args([
            "--model_config", str(cfg_q)] + common[2:] + [
            "--output_dir", str(work / "valout_quant"),
        ]))
        print(f"aug extra rows: beam4+lm dev WER {float(beam_res.wer):.3%}, "
              f"quantized greedy dev WER {float(quant_res.wer):.3%}")

    # offline hypothesis through the val CLI (same ckpt + stats). In aug
    # mode compare on the clean clip alone so hyps[0] is unambiguous.
    eq_manifest = work / "manifest.json"
    if args.aug:
        eq_manifest = work / "eq_manifest.json"
        eq_manifest.write_text(json.dumps([utts[0]]))
    from caiman_asr_tpu.val import val_arg_parser, validate

    vargs = val_arg_parser().parse_args([
        "--model_config", str(cfg), "--dataset_dir", str(work),
        "--val_manifests", str(eq_manifest),
        "--ckpt", str(work / "out" / "ckpts" / "last.npz"),
        "--output_dir", str(work / "valout"), "--val_batch_size", "1",
        "--mel_stats_path", str(stats_path),
    ])
    offline = validate(vargs).hyps[0].strip()

    # streaming engine must reproduce the offline transcript
    from caiman_asr_tpu.serving.engine import StreamingEngine
    from caiman_asr_tpu.export.checkpointer import load_checkpoint, apply_params
    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.setup.builders import build_model, build_tokenizer
    from caiman_asr_tpu.data.audio import read_audio
    import numpy as np
    import jax

    bundle = load_config(str(cfg))
    tokenizer = build_tokenizer(bundle.cfg, str(tok))
    model, blank_idx = build_model(bundle.cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    loaded, _, _, _ = load_checkpoint(work / "out" / "ckpts" / "last.npz")
    params = apply_params(params, loaded)

    from caiman_asr_tpu.setup.builders import load_mel_stats

    eng = StreamingEngine(
        model, params, blank_idx, tokenizer,
        mel_stats=load_mel_stats(str(stats_path)),
        logmel=bundle.cfg.input_val.logmel,
        max_streams=1, native_serializer=False,
        # match the offline decoder's per-frame emission cap (30): the
        # delay-penalty-trained overfit emits multi-token bursts, and a
        # lower serving cap would clip them — the proof compares equal
        # decoders
        max_symbols_per_step=30,
    )
    lane = eng.open_stream()
    audio = read_audio(
        str(Path(args.dataset_dir) / utts[0]["files"][0]["fname"]), 16000
    )
    hop = eng.hop_samples
    text = []

    def consume(out):
        # tick() returns a dict per lane OR a list of them (final flush
        # merges the drained response with the eos marker)
        got_eos = False
        for r in ([out[lane]] if isinstance(out.get(lane), dict)
                  else out.get(lane, [])):
            if "alternatives" in r:
                text.append(r["alternatives"][0]["transcript"])
            got_eos = got_eos or r.get("eos", False)
        return got_eos

    for i in range(0, len(audio), hop):
        chunk = audio[i : i + hop]
        if len(chunk) < hop:
            chunk = np.pad(chunk, (0, hop - len(chunk)))
        eng.push_audio(lane, chunk)
        consume(eng.tick())
    # trailing silence matching the offline pipeline's final padding
    # (val_final_padding_secs default 0.24 s): a live source delivers
    # post-speech silence too, and a word emitted at the audio edge needs
    # those frames in BOTH pipelines to compare equal
    for _ in range(4):
        eng.push_audio(lane, np.zeros(hop, np.float32))
        consume(eng.tick())
    eng.close_stream(lane)
    for _ in range(16):
        if consume(eng.tick()):
            break
    streamed = "".join(text).strip()
    print("offline   decode:", offline)
    print("streaming decode:", streamed)
    stream_matches = streamed.split() == offline.split()
    ok = best_wer < 0.05 and stream_matches
    print("REAL-SPEECH E2E:", "PASS" if ok else "FAIL",
          f"(wer={best_wer:.3%}, streaming == offline: {stream_matches})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
