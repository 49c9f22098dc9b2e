"""End-to-end slice: tiny train -> checkpoint -> validate (reference:
scripts/test_mini_train_and_cleanup.sh runs 4-step trainings + validation)."""

import json
import os
import wave
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from caiman_asr_tpu.args.train import train_arg_parser
from caiman_asr_tpu.data.tokenizer import save_tokenizer_json, train_tokenizer
from caiman_asr_tpu.val import val_arg_parser, validate

TEXTS = [
    "the cat sat on the mat",
    "a dog barks at night",
    "she sells sea shells",
    "the quick brown fox jumps",
    "over the lazy dog again",
    "transcription of long speech",
    "hello world how are you",
    "testing one two three four",
]

MINI_CONFIG = """
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
    n_filt: 16
    dither: 0.0
  frame_splicing: &val_splicing
    frame_stacking: 3
    frame_subsampling: 3
input_train:
  audio_dataset:
    !!merge <<: *val_dataset
    trim_silence: false
    max_duration: 20.0
  filterbank_features: *val_features
  frame_splicing: *val_splicing
  spec_augment:
    freq_masks: 1
    min_freq: 0
    max_freq: 4
    time_masks: 2
    min_time: 0
    max_time: 0.03
rnnt:
  in_feats: 48
  enc_n_hid: 16
  enc_pre_rnn_layers: 1
  enc_post_rnn_layers: 1
  enc_stack_time_factor: 2
  enc_dropout: 0.0
  pred_n_hid: 16
  pred_rnn_layers: 1
  pred_dropout: 0.0
  joint_n_hid: 16
  joint_dropout: 0.0
  forget_gate_bias: 1.0
grad_noise_scheduler:
  noise_level: 0.0
"""


def write_wav(path, audio, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.4 + 0.1 * i
        audio = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        write_wav(root / f"utt{i}.wav", audio)
        entries.append(
            {"transcript": text, "files": [{"fname": f"utt{i}.wav", "duration": dur}],
             "original_duration": dur}
        )
    (root / "manifest.json").write_text(json.dumps(entries))
    tok_path = root / "tok.json"
    save_tokenizer_json(tok_path, train_tokenizer(TEXTS * 4, vocab_size=48))
    cfg_path = root / "mini.yaml"
    cfg_path.write_text(MINI_CONFIG.format(tok=tok_path))
    return root, cfg_path


def make_train_args(root, cfg_path, out_dir, **overrides):
    args = train_arg_parser().parse_args([])
    args.model_config = str(cfg_path)
    args.output_dir = str(out_dir)
    args.dataset_dir = str(root)
    args.train_manifests = ["manifest.json"]
    args.val_manifests = ["manifest.json"]
    args.global_batch_size = 4
    args.grad_accumulation_batches = 2
    args.training_steps = 4
    args.val_frequency = 2
    args.save_frequency = 2
    args.log_frequency = 1
    args.prediction_frequency = 4
    args.val_batch_size = 4
    args.warmup_steps = 2
    args.hold_steps = 2
    args.half_life_steps = 2
    args.lr = 1e-3
    args.weights_init_scale = 0.5
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def test_mini_train_and_val(workspace, tmp_path):
    from caiman_asr_tpu import train as train_mod

    root, cfg_path = workspace
    out = tmp_path / "out"
    args = make_train_args(root, cfg_path, out)
    state, best_wer = train_mod.main(args)
    assert int(state.step) == 4

    ckpts = list((out / "ckpts").glob("*.npz"))
    assert any(p.name == "last.npz" for p in ckpts)
    # a dev WER was computed and is a sane probability
    assert 0.0 <= best_wer <= 10.0

    # validate from the saved checkpoint
    vargs = val_arg_parser().parse_args([])
    vargs.model_config = str(cfg_path)
    vargs.output_dir = str(tmp_path / "val_out")
    vargs.dataset_dir = str(root)
    vargs.val_manifests = ["manifest.json"]
    vargs.val_batch_size = 4
    vargs.ckpt = str(out / "ckpts" / "last.npz")
    vargs.calc_loss = True
    result = validate(vargs)
    assert result.loss is not None and np.isfinite(result.loss)
    assert len(result.hyps) == len(TEXTS)


def test_mini_train_model_parallel(workspace, tmp_path):
    """--model_parallel on the CPU mesh: TP train step + sharded params
    through checkpointing and periodic validation (RSP off: DP-only)."""
    from caiman_asr_tpu import train as train_mod

    root, cfg_path = workspace
    out = tmp_path / "out_tp"
    # n_classes = 49 here, so shard the vocab 7 ways (equal-width contract)
    args = make_train_args(root, cfg_path, out, model_parallel=7,
                           rsp_seq_len_freq=[1])
    state, best_wer = train_mod.main(args)
    assert int(state.step) == 4
    assert (out / "ckpts" / "last.npz").exists()
    assert 0.0 <= best_wer <= 10.0


def test_layer_stats_logging(workspace, tmp_path):
    """--log_layer_stats emits per-layer weight/grad stats to the JSONL log
    (reference log/logging_layers.py parity)."""
    from caiman_asr_tpu import train as train_mod

    root, cfg_path = workspace
    out = tmp_path / "out_ls"
    args = make_train_args(root, cfg_path, out, training_steps=2,
                           log_layer_stats=True, log_frequency=1)
    train_mod.main(args)
    logs = "".join(p.read_text() for p in out.glob("log_*.jsonl"))
    assert "per-layer-weight-norm/" in logs
    assert "per-layer-grad-max/" in logs


def test_val_multiple(workspace, tmp_path):
    """Multi-dataset validation sweep: per-dataset subdirs + summary
    json/csv, overwrite gating (reference val_multiple.py semantics)."""
    from caiman_asr_tpu import train as train_mod
    from caiman_asr_tpu import val_multiple

    root, cfg_path = workspace
    out = tmp_path / "out_vm"
    train_mod.main(make_train_args(root, cfg_path, out, training_steps=2))

    vm_out = tmp_path / "vm"
    argv = [
        "--model_config", str(cfg_path),
        "--output_dir", str(vm_out),
        "--ckpt", str(out / "ckpts" / "last.npz"),
        "--val_batch_size", "4",
        "--all_dataset_dirs", str(root), str(root),
        "--all_val_manifests", "manifest.json", "manifest.json",
        "--custom_batch_sizes", "4", "2",
    ]
    results = val_multiple.main(argv)
    assert len(results) == 1  # same dataset label twice -> one entry
    import json as _json

    payload = _json.loads((vm_out / "validate_multiple.json").read_text())
    assert any(k.endswith("manifest.json") for k in payload)
    assert (vm_out / "validate_multiple.csv").exists()
    # overwrite gating
    with pytest.raises(ValueError):
        val_multiple.main(argv)
    val_multiple.main(argv + ["--overwrite_ok"])


def test_resume(workspace, tmp_path):
    from caiman_asr_tpu import train as train_mod

    root, cfg_path = workspace
    out = tmp_path / "out"
    args = make_train_args(root, cfg_path, out, training_steps=2)
    train_mod.main(args)
    args2 = make_train_args(root, cfg_path, out, training_steps=4, resume=True)
    state, _ = train_mod.main(args2)
    assert int(state.step) == 4


def test_val_from_dir(workspace, tmp_path):
    """--val_from_dir validates on audio + {stem}.txt pairs with no JSON
    manifest (reference --val_from_dir/--val_audio_dir/--val_txt_dir)."""
    root, cfg_path = workspace
    ad = root / "val_audio"
    ad.mkdir(exist_ok=True)
    for i in range(3):
        (ad / f"utt{i}.wav").write_bytes((root / f"utt{i}.wav").read_bytes())
        (ad / f"utt{i}.txt").write_text(TEXTS[i])

    vargs = val_arg_parser().parse_args([])
    vargs.model_config = str(cfg_path)
    vargs.output_dir = str(tmp_path / "val_out")
    vargs.dataset_dir = str(root)
    vargs.val_from_dir = True
    vargs.val_audio_dir = "val_audio"
    vargs.val_batch_size = 4
    result = validate(vargs)
    assert len(result.hyps) == 3
    assert sorted(result.refs) == sorted(t for t in TEXTS[:3])


def test_resource_recorder(tmp_path):
    """The --profiler host-resource sampler writes csv rows with sane
    values (reference: top/nvidia-smi recorder subprocesses)."""
    import time as _time

    from caiman_asr_tpu.log.profiling import ResourceRecorder

    rec = ResourceRecorder(tmp_path, interval=0.2, enabled=True)
    rec.start()
    _time.sleep(0.7)
    rec.stop()
    lines = (tmp_path / "profile" / "resources.csv").read_text().splitlines()
    assert lines[0] == "time_s,cpu_pct,rss_mb,host_mem_used_mb"
    assert len(lines) >= 2
    t, cpu, rss, host = map(float, lines[1].split(","))
    assert rss > 10 and host > 10 and cpu >= 0


def test_preemption_sigterm_saves_and_resumes(workspace, tmp_path):
    """SIGTERM mid-train (cloud-TPU preemption notice) finishes the
    in-flight step, saves the `last` checkpoint via the normal epilogue,
    and exits cleanly; --resume continues from the saved step."""
    import signal
    import subprocess
    import sys
    import time as _time

    root, cfg_path = workspace
    out = tmp_path / "out"
    prog = f"""
import sys
sys.path.insert(0, {str(Path(__file__).parent.parent)!r})
import tests.test_end_to_end as e2e
from pathlib import Path
args = e2e.make_train_args(Path({str(root)!r}), {str(cfg_path)!r},
                           {str(out)!r}, training_steps=500,
                           val_frequency=1000, save_frequency=1000,
                           log_frequency=1)
from caiman_asr_tpu import train as train_mod
train_mod.main(args)
"""
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "CAIMAN_TEST_JAX_CACHE", "/tmp/caiman_test_jax_cache"
        ),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
        JAX_DEFAULT_MATMUL_PRECISION="highest",
    )
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", prog], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, env=env,
    )
    # wait for a couple of optimizer steps, then deliver the notice
    saw_step = False
    deadline = _time.time() + 300
    lines = []
    while _time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "[train] step" in line:
            saw_step = True
            proc.send_signal(signal.SIGTERM)
            break
    assert saw_step, "".join(lines[-20:])
    tail, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, tail[-2000:]
    assert "saving last checkpoint" in tail
    assert (out / "ckpts" / "last.npz").exists()

    from caiman_asr_tpu import train as train_mod
    from caiman_asr_tpu.export.checkpointer import load_checkpoint

    _, _, _, meta = load_checkpoint(out / "ckpts" / "last.npz")
    stopped_at = int(meta["step"])
    assert 0 < stopped_at < 500

    # resume for a few more steps in-process
    args = make_train_args(root, cfg_path, out,
                           training_steps=stopped_at + 2,
                           val_frequency=1000, save_frequency=1000)
    args.resume = True
    state, _ = train_mod.main(args)
    assert int(state.step) == stopped_at + 2


@pytest.mark.slow
def test_resume_is_bit_exact(workspace, tmp_path):
    """--resume reproduces the uninterrupted run's loss/grad-norm stream
    exactly, INCLUDING a mid-epoch interrupt (the preemption epilogue
    stores epoch+1; resume must realign the data stream from the step
    count) and with RSP on (carried state + gate stream ride the
    checkpoint)."""
    import json as _json

    from caiman_asr_tpu import train as train_mod

    def read_log(out):
        recs = {}
        for f in sorted(Path(out).glob("log_*.jsonl")):
            for line in open(f):
                try:
                    r = _json.loads(line)
                except _json.JSONDecodeError:
                    continue
                if r.get("subset") == "train" and "loss" in r:
                    recs[r["step"][1]] = (r["loss"], r["grad_norm"])
        return recs

    common = dict(
        training_steps=6, val_frequency=100, save_frequency=100,
        prediction_frequency=100,
        # RSP active from step 1 with frequent concats
        rsp_seq_len_freq=[1, 0, 1], rsp_delay=1,
    )
    out_a = tmp_path / "ctl"
    train_mod.main(make_train_args(*workspace, out_a, **common))
    recs_a = read_log(out_a)
    assert sorted(recs_a) == [1, 2, 3, 4, 5, 6]

    # interrupted run: stop after 3 steps (mid-epoch: 8 utts / gbs 4 = 2
    # groups/epoch, so step 3 is the FIRST group of epoch 1), then resume
    out_b = tmp_path / "intr"
    train_mod.main(
        make_train_args(*workspace, out_b, **dict(common, training_steps=3))
    )
    train_mod.main(
        make_train_args(*workspace, out_b, **dict(common, resume=True))
    )
    recs_b = read_log(out_b)
    for s in (4, 5, 6):
        assert recs_b[s] == recs_a[s], (s, recs_b[s], recs_a[s])
