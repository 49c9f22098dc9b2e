"""Reference CLI-parity batch: --turn_off_initial_padding,
--val_final_padding_secs, --norm_starting_ratio, --randomize_first_n_epochs,
--num_buckets 0, --train_dataset_yaml, --skip_ngram, --nth_batch_only
(reference args/shared.py:15-33, args/train.py:225-445, args/val.py:119,
setup/base.py:408-431, data/schema.py)."""

from argparse import Namespace

import numpy as np
import pytest

from caiman_asr_tpu.args.train import resolve_train_dataset_yaml, train_arg_parser
from caiman_asr_tpu.data.sampler import (
    BucketingSampler,
    WeightedBucketingSampler,
)
from caiman_asr_tpu.models.config import Config
from caiman_asr_tpu.setup.builders import apply_input_overrides
from caiman_asr_tpu.training.schedules import MelNormRamp


def test_input_override_flags_change_featurizer_config():
    cfg = Config()
    assert cfg.input_val.logmel.initial_padding
    args = Namespace(turn_off_initial_padding=True, val_final_padding_secs=0.24)
    out = apply_input_overrides(cfg, args)
    assert not out.input_train.logmel.initial_padding
    assert not out.input_val.logmel.initial_padding
    assert out.input_val.logmel.final_padding_secs == 0.24
    # train-side audio is never end-padded (the flag is val-only)
    assert out.input_train.logmel.final_padding_secs == 0.0
    # no flags -> the config object is returned unchanged
    assert apply_input_overrides(cfg, Namespace()) is cfg


def test_val_final_padding_defaults_to_reference_value():
    args = train_arg_parser().parse_args([])
    # unset flag -> the 0.24 s reference default is applied
    assert args.val_final_padding_secs is None
    out = apply_input_overrides(Config(), args)
    assert out.input_val.logmel.final_padding_secs == 0.24
    n_pad = int(0.24 * out.input_val.logmel.sample_rate)
    assert n_pad == 3840


def test_val_final_padding_config_value_wins_when_flag_unset():
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        input_val=dataclasses.replace(
            cfg.input_val,
            logmel=dataclasses.replace(
                cfg.input_val.logmel, final_padding_secs=0.5
            ),
        ),
    )
    # flag unset -> config's 0.5 survives
    args = train_arg_parser().parse_args([])
    out = apply_input_overrides(cfg, args)
    assert out.input_val.logmel.final_padding_secs == 0.5
    # flag set -> CLI wins
    args = train_arg_parser().parse_args(["--val_final_padding_secs", "0.1"])
    out = apply_input_overrides(cfg, args)
    assert out.input_val.logmel.final_padding_secs == pytest.approx(0.1)


def test_norm_ramp_start_ratio():
    ramp = MelNormRamp(100, 200, start_ratio=0.4)
    assert ramp.ratio(0) == 0.4
    assert ramp.ratio(100) == 0.4
    assert abs(ramp.ratio(150) - 0.7) < 1e-9
    assert ramp.ratio(200) == 1.0
    # default keeps the old semantics
    assert MelNormRamp(100, 200).ratio(50) == 0.0


def test_randomize_first_n_epochs_overrides_bucketing():
    durs = np.linspace(1.0, 20.0, 64)
    bucketed = BucketingSampler(
        durs, batch_size=4, seed=7, num_buckets=2,
        pessimistic_first_batch=False,
    )
    randomized = BucketingSampler(
        durs, batch_size=4, seed=7, num_buckets=2,
        pessimistic_first_batch=False, randomize_first_n_epochs=2,
    )
    for epoch, should_differ in [(0, True), (1, True), (2, False)]:
        a = np.concatenate(bucketed.epoch_batches(epoch))
        b = np.concatenate(randomized.epoch_batches(epoch))
        assert sorted(a) == sorted(b)  # same utterance set either way
        assert (not np.array_equal(a, b)) == should_differ, epoch
    # randomized epochs show no duration bucketing: the spread of durations
    # within one batch approaches the global spread
    b0 = randomized.epoch_batches(0)[0]
    assert np.ptp(durs[b0]) > np.ptp(durs) / 3


def test_randomize_first_n_epochs_keeps_manifest_weighting():
    durs = np.ones(40)
    mids = np.array([0] * 20 + [1] * 20)
    s = WeightedBucketingSampler(
        durs, mids, batch_size=4, seed=0, num_buckets=2,
        relative_ratios=[1.0, 2.0],
        pessimistic_first_batch=False, randomize_first_n_epochs=1,
    )
    order = np.concatenate(s.epoch_batches(0))
    n0 = int((mids[order] == 0).sum())
    n1 = int((mids[order] == 1).sum())
    assert n1 == 2 * n0  # manifest 1 still sampled twice as often


def test_num_buckets_zero_selects_random_sampler():
    from caiman_asr_tpu.setup.builders import build_train_loader
    from caiman_asr_tpu.data.sampler import RandomSampler
    from caiman_asr_tpu.data.manifest import Utterance
    from caiman_asr_tpu.models.config import PipelineConfig

    utts = [
        Utterance(fname=f"u{i}.wav", transcript="a", duration=float(i + 1))
        for i in range(8)
    ]
    args = Namespace(num_buckets=0, seed=1)
    loader = build_train_loader(utts, None, PipelineConfig(), 2, 0, args)
    assert isinstance(loader.sampler, RandomSampler)


def test_num_buckets_zero_with_manifest_weighting():
    """num_buckets 0 + any ratio mode must fall back to weighted random
    order, not crash on a zero bucket size (the reference's num_buckets=0
    semantics compose with manifest ratios)."""
    durs = np.ones(40)
    mids = np.array([0] * 20 + [1] * 20)
    s = WeightedBucketingSampler(
        durs, mids, batch_size=4, seed=0, num_buckets=0,
        relative_ratios=[1.0, 2.0], pessimistic_first_batch=False,
    )
    order = np.concatenate(s.epoch_batches(0))
    n0 = int((mids[order] == 0).sum())
    n1 = int((mids[order] == 1).sum())
    assert n1 == 2 * n0  # weighting still applies in random order
    # plain bucketing sampler with 0 buckets is also random, not a crash
    b = BucketingSampler(durs, batch_size=4, seed=0, num_buckets=0,
                         pessimistic_first_batch=False)
    assert len(np.concatenate(b.epoch_batches(0))) == 40


def test_train_dataset_yaml_resolution(tmp_path):
    y = tmp_path / "ds.yaml"
    y.write_text(
        "datasets:\n"
        "  clean:\n    manifest: clean.json\n    weight: 1.0\n"
        "  noisy:\n    manifest: noisy.json\n    weight: 2.5\n"
        "  extra:\n    manifest: extra.json\n"
    )
    args = Namespace(
        train_dataset_yaml=str(y), train_manifests=[],
        train_manifest_ratios=None, relative_train_manifest_ratios=None,
        canary_manifest_exponent=None,
    )
    resolve_train_dataset_yaml(args)
    assert args.train_manifests == ["clean.json", "noisy.json", "extra.json"]
    assert args.relative_train_manifest_ratios == [1.0, 2.5, 1.0]


def test_train_dataset_yaml_conflicts_and_schema(tmp_path):
    y = tmp_path / "ds.yaml"
    y.write_text("datasets:\n  a:\n    manifest: a.json\n")
    args = Namespace(
        train_dataset_yaml=str(y), train_manifests=["x.json"],
        train_manifest_ratios=None, relative_train_manifest_ratios=None,
        canary_manifest_exponent=None,
    )
    with pytest.raises(SystemExit):
        resolve_train_dataset_yaml(args)

    bad = tmp_path / "bad.yaml"
    bad.write_text("datasets:\n  a:\n    weight: 1.0\n")  # missing manifest
    args2 = Namespace(
        train_dataset_yaml=str(bad), train_manifests=[],
        train_manifest_ratios=None, relative_train_manifest_ratios=None,
        canary_manifest_exponent=None,
    )
    with pytest.raises(ValueError, match="manifest"):
        resolve_train_dataset_yaml(args2)

    neg = tmp_path / "neg.yaml"
    neg.write_text("datasets:\n  a:\n    manifest: a.json\n    weight: -1\n")
    args3 = Namespace(
        train_dataset_yaml=str(neg), train_manifests=[],
        train_manifest_ratios=None, relative_train_manifest_ratios=None,
        canary_manifest_exponent=None,
    )
    with pytest.raises(ValueError, match="weight"):
        resolve_train_dataset_yaml(args3)


def test_missing_ngram_raises_unless_skipped(tmp_path):
    from caiman_asr_tpu.setup.builders import build_decoder

    args = Namespace(
        decoder="fast_beam", ngram_path=str(tmp_path / "missing.arpa"),
        skip_ngram=False,
    )
    with pytest.raises(FileNotFoundError, match="skip_ngram"):
        build_decoder(None, 0, None, args)


def test_override_ngram_path_is_an_alias():
    parser = train_arg_parser()
    args = parser.parse_args(["--override_ngram_path", "/x/lm.arpa"])
    assert args.ngram_path == "/x/lm.arpa"
    assert parser.parse_args([]).skip_ngram is False


def test_noise_dataset_from_spec_local_dir(tmp_path):
    import wave

    with wave.open(str(tmp_path / "n.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    from caiman_asr_tpu.data.noise import NoiseDataset

    ds = NoiseDataset.from_spec(str(tmp_path), 16000)
    assert len(ds.paths) == 1
    with pytest.raises(FileNotFoundError):
        NoiseDataset.from_spec(str(tmp_path / "nope"), 16000)


def test_checkpoint_averaging_accepts_reference_flag(tmp_path):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--ckpts", "--checkpoints", nargs="+", required=True)
    args = p.parse_args(["--checkpoints", "a.npz", "b.npz"])
    assert args.ckpts == ["a.npz", "b.npz"]


def test_nth_batch_only_loader():
    from caiman_asr_tpu.val import _NthBatchLoader

    class FakeLoader:
        def epoch(self, i):
            return iter(range(5))

    wrapped = _NthBatchLoader(FakeLoader(), 2)
    assert list(wrapped.epoch(0)) == [2]
