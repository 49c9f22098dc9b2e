"""Object builders shared by the train/val entry points.

Equivalent role to the reference's Setup/DI layer (setup/base.py:85-133,
setup/train.py:46, setup/val.py:113): turn (config yaml + CLI args) into
tokenizer, model, decoder, loaders and feature pipelines. Functional
builders instead of a class hierarchy — there is no device/process state to
encapsulate in the JAX version.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from caiman_asr_tpu.data.loader import AudioDataLoader, FeaturePipeline
from caiman_asr_tpu.data.manifest import Utterance, load_manifests
from caiman_asr_tpu.data.sampler import BucketingSampler, SortedSampler
from caiman_asr_tpu.data.text.normalize import NormalizeConfig, NormalizeLevel
from caiman_asr_tpu.data.tokenizer import Tokenizer
from caiman_asr_tpu.decoding.greedy import GreedyDecoder
from caiman_asr_tpu.models.config import Config, ConfigBundle, PipelineConfig
from caiman_asr_tpu.models.rnnt import RNNT


def build_tokenizer(cfg: Config, override_path: Optional[str] = None) -> Tokenizer:
    path = override_path or cfg.tokenizer.sentpiece_model
    if path is None or not Path(path).exists():
        raise FileNotFoundError(
            f"sentencepiece model not found: {path!r} "
            "(set tokenizer.sentpiece_model in the config or --tokenizer_model)"
        )
    return Tokenizer(
        labels=list(cfg.tokenizer.labels),
        sentpiece_model=path,
        sampling=cfg.tokenizer.sampling,
    )


def build_model(cfg: Config, tokenizer: Tokenizer, args=None) -> Tuple[RNNT, int]:
    """Returns (model, blank_idx). blank = num_labels (last vocab index),
    reference setup/train.py:177."""
    rnnt_cfg = cfg.rnnt
    if args is not None:
        overrides = {}
        if getattr(args, "weights_init_scale", None) is not None:
            overrides["weights_init_scale"] = args.weights_init_scale
        if getattr(args, "hidden_hidden_bias_scale", None) is not None:
            overrides["hidden_hidden_bias_scale"] = args.hidden_hidden_bias_scale
        if overrides:
            rnnt_cfg = dataclasses.replace(rnnt_cfg, **overrides)
    n_classes = tokenizer.num_labels + 1
    return RNNT(rnnt_cfg, n_classes), tokenizer.num_labels


def apply_input_overrides(cfg: Config, args) -> Config:
    """Apply CLI featurizer overrides to the config's input pipelines
    (reference args/shared.py:15-33: ``--turn_off_initial_padding`` and
    ``--val_final_padding_secs``, default 0.24 s of trailing silence on
    validation audio to flush the streaming decoder like the asr-server)."""
    if args is None:
        return cfg
    input_train, input_val = cfg.input_train, cfg.input_val
    if getattr(args, "turn_off_initial_padding", False):
        input_train = dataclasses.replace(
            input_train,
            logmel=dataclasses.replace(input_train.logmel, initial_padding=False),
        )
        input_val = dataclasses.replace(
            input_val,
            logmel=dataclasses.replace(input_val.logmel, initial_padding=False),
        )
    if hasattr(args, "val_final_padding_secs"):
        pad = args.val_final_padding_secs
        if pad is None and input_val.logmel.final_padding_secs == 0.0:
            # the reference applies 0.24 s by default (args/shared.py:29-33);
            # a non-zero config value wins when the flag is not passed
            pad = 0.24
        if pad is not None and pad != input_val.logmel.final_padding_secs:
            input_val = dataclasses.replace(
                input_val,
                logmel=dataclasses.replace(input_val.logmel, final_padding_secs=pad),
            )
    if input_train is cfg.input_train and input_val is cfg.input_val:
        return cfg
    return dataclasses.replace(cfg, input_train=input_train, input_val=input_val)


def normalize_config_from(
    pipe: PipelineConfig, user_tokens: Optional[dict] = None
) -> NormalizeConfig:
    level = {
        "identity": NormalizeLevel.IDENTITY,
        "scrub": NormalizeLevel.SCRUB,
        "lowercase": NormalizeLevel.LOWERCASE,
        "unicode": NormalizeLevel.UNICODE,
        "full": NormalizeLevel.FULL,
    }.get(pipe.dataset.normalize_transcripts, NormalizeLevel.FULL)
    from caiman_asr_tpu.utils.user_tokens import get_all_user_tokens

    return NormalizeConfig(
        level=level,
        remove_tags=pipe.dataset.remove_tags,
        replacements=pipe.dataset.replacements or [],
        user_symbols=tuple(get_all_user_tokens(user_tokens).values()),
    )


def load_utterances(
    manifests: Sequence[str], dataset_dir: str, pipe: PipelineConfig
) -> List[Utterance]:
    ds = pipe.dataset
    return load_manifests(
        [Path(dataset_dir) / m if not Path(m).is_absolute() else Path(m) for m in manifests],
        max_duration=ds.max_duration,
        min_duration=ds.min_duration,
        max_transcript_len=ds.max_transcript_len,
    )


def build_train_loader(
    utts, tokenizer, pipe: PipelineConfig, batch_size: int, seed: int, args=None,
    rank: int = 0, world_size: int = 1,
) -> AudioDataLoader:
    """batch_size is the per-host microbatch; the sampler builds identical
    global epochs on every host from the shared seed and each host takes its
    round-robin shard (reference sampler.py:321-360)."""
    ratio_modes = {
        "absolute_ratios": getattr(args, "train_manifest_ratios", None),
        "relative_ratios": getattr(args, "relative_train_manifest_ratios", None),
        "canary_exponent": getattr(args, "canary_manifest_exponent", None),
    }
    rand_first = getattr(args, "randomize_first_n_epochs", 0) or 0
    num_buckets = getattr(args, "num_buckets", 6)
    if any(v is not None for v in ratio_modes.values()):
        from caiman_asr_tpu.data.sampler import WeightedBucketingSampler

        sampler = WeightedBucketingSampler(
            [u.duration for u in utts],
            [u.manifest_idx for u in utts],
            batch_size=batch_size, world_size=world_size, seed=seed,
            num_buckets=num_buckets,
            randomize_first_n_epochs=rand_first,
            **{k: v for k, v in ratio_modes.items() if v is not None},
        )
    elif num_buckets == 0:
        # reference args/train.py:225-231: 0 buckets selects the
        # RandomSampler (no duration grouping at all)
        from caiman_asr_tpu.data.sampler import RandomSampler

        sampler = RandomSampler(
            [u.duration for u in utts], batch_size=batch_size,
            world_size=world_size, seed=seed,
        )
    else:
        sampler = BucketingSampler(
            [u.duration for u in utts], batch_size=batch_size,
            world_size=world_size, seed=seed,
            num_buckets=num_buckets,
            randomize_first_n_epochs=rand_first,
        )
    background, babble = build_noise(args, pipe, seed)
    return AudioDataLoader(
        utts,
        sampler,
        tokenizer,
        pipe,
        rank=rank,
        train=True,
        normalize_config=normalize_config_from(pipe),
        seed=seed,
        background_noise=background,
        babble_noise=babble,
        prob_narrowband=getattr(args, "prob_train_narrowband", 0.0),
        inspect_audio_dir=(
            str(Path(args.output_dir) / "augmented_audio")
            if getattr(args, "inspect_audio", False)
            else None
        ),
    )


def build_data_source_loader(
    args, cfg: Config, tokenizer, batch_size: int, train: bool, seed: int = 0
):
    """Pick the loader for the requested source: JSON manifests (default),
    webdataset tars (--read_from_tar) or HuggingFace (--use_hugging_face) —
    reference: data/build_dataloader.py + setup/base.py:348-399."""
    pipe = cfg.input_train if train else cfg.input_val
    if getattr(args, "read_from_tar", False):
        from caiman_asr_tpu.data.webdataset import WebDatasetLoader, WebDatasetReader

        tars = args.train_tar_files if train else args.val_tar_files
        tars = [
            t if Path(t).is_absolute() else str(Path(args.dataset_dir) / t)
            for t in tars
        ]
        reader = WebDatasetReader(
            tars,
            sample_rate=pipe.logmel.sample_rate,
            seed=seed,
            max_duration=pipe.dataset.max_duration if train else None,
            max_transcript_len=pipe.dataset.max_transcript_len if train else None,
        )
        return WebDatasetLoader(
            reader, tokenizer, batch_size,
            normalize_config=normalize_config_from(pipe, cfg.user_tokens),
            drop_last=train,
        )
    if getattr(args, "use_hugging_face", False) and not train:
        from caiman_asr_tpu.data.hugging_face import HuggingFaceLoader, HuggingFaceReader

        reader = HuggingFaceReader(
            args.hugging_face_val_dataset,
            split=args.hugging_face_val_split,
            config=args.hugging_face_val_config,
            text_column=args.hugging_face_val_transcript_key,
            sample_rate=pipe.logmel.sample_rate,
        )
        return HuggingFaceLoader(
            reader, tokenizer, batch_size,
            normalize_config=normalize_config_from(pipe),
        )
    if not train and getattr(args, "val_from_dir", False):
        # directory-of-audio validation: {stem}.flac|wav + {stem}.txt pairs
        # (reference --val_from_dir/--val_audio_dir/--val_txt_dir,
        # data/build_dataloader.py:182-190)
        from caiman_asr_tpu.data.manifest import utterances_from_dir

        root = Path(args.dataset_dir)
        utts = utterances_from_dir(
            root / args.val_audio_dir if args.val_audio_dir else root,
            (root / args.val_txt_dir) if args.val_txt_dir else None,
        )
        # same utterance filters as the manifest path (otherwise over-long
        # audio would be silently truncated and scored against the full
        # transcript)
        ds = pipe.dataset
        utts = [
            u for u in utts
            if (ds.max_duration is None or u.duration <= ds.max_duration)
            and (ds.min_duration is None or u.duration >= ds.min_duration)
            and (ds.max_transcript_len is None
                 or len(u.transcript) <= ds.max_transcript_len)
        ]
    else:
        manifests = args.train_manifests if train else args.val_manifests
        utts = load_utterances(manifests, args.dataset_dir, pipe)
    n_only = getattr(args, "n_utterances_only", None)
    if n_only is not None and len(utts) > n_only:
        # seeded shuffle-then-truncate, identical on every process
        # (reference data/dali/utils.py:149-163)
        import random

        utts = random.Random(getattr(args, "seed", 1)).sample(utts, n_only)
    norm_cfg = normalize_config_from(pipe, cfg.user_tokens)
    rank, world = 0, 1
    if getattr(args, "multihost", False):
        import jax

        rank, world = jax.process_index(), jax.process_count()
    if train:
        loader = build_train_loader(
            utts, tokenizer, pipe, batch_size, seed, args,
            rank=rank, world_size=world,
        )
    else:
        loader = build_val_loader(
            utts, tokenizer, pipe, batch_size,
            prob_narrowband=getattr(args, "prob_val_narrowband", 0.0),
            rank=rank, world_size=world,
        )
    loader.norm_cfg = norm_cfg
    return loader


def build_noise(args, pipe: PipelineConfig, seed: int):
    """Background/babble noise samplers from CLI args
    (reference setup wiring: args/noise_augmentation.py + dali pipeline)."""
    if args is None:
        return None, None
    from caiman_asr_tpu.data.noise import NoiseDataset, NoiseSampler

    rng = np.random.default_rng((seed, 77))
    background = None
    if getattr(args, "prob_background_noise", 0.0) > 0 and getattr(
        args, "noise_dataset", None
    ):
        ds = NoiseDataset.from_spec(
            args.noise_dataset, pipe.logmel.sample_rate,
            hf_config=getattr(args, "noise_config", None),
            max_clips=getattr(args, "noise_max_clips", 2048) or None,
        )
        background = (
            ds,
            NoiseSampler(
                args.prob_background_noise, rng,
                args.noise_initial_low, args.noise_initial_high,
            ),
        )
    babble = None
    if getattr(args, "prob_babble_noise", 0.0) > 0:
        babble = NoiseSampler(
            args.prob_babble_noise, rng,
            getattr(args, "noise_initial_low", 30),
            getattr(args, "noise_initial_high", 60),
        )
    return background, babble


def build_val_loader(utts, tokenizer, pipe: PipelineConfig, batch_size: int,
                     prob_narrowband: float = 0.0, rank: int = 0,
                     world_size: int = 1):
    # Multi-process: each rank evaluates a disjoint shard (deterministic
    # sorted order, so all ranks agree on the split without a broadcast —
    # the reference instead broadcasts rank 0's file list,
    # data/dali/sampler.py:258-262); evaluate() then all-gathers results.
    sampler = SortedSampler(
        [u.duration for u in utts],
        batch_size=batch_size,
        world_size=world_size,
        pessimistic_first_batch=False,
        drop_last=False,
    )
    return AudioDataLoader(
        utts,
        sampler,
        tokenizer,
        pipe,
        rank=rank,
        train=False,
        normalize_config=normalize_config_from(pipe),
        prob_narrowband=prob_narrowband,
    )


def load_mel_stats(path: Optional[str]):
    """Load dataset mel statistics (means, stds) from an .npz
    (keys melmeans/melvars, matching the reference's stats dirs)."""
    if path is None:
        return None
    z = np.load(path)
    means = np.asarray(z["melmeans"], np.float32)
    var = np.asarray(z["melvars"], np.float32)
    return means, np.sqrt(var)


def build_feature_pipelines(cfg: Config, mel_stats=None):
    train_fp = FeaturePipeline(cfg.input_train, mel_stats=mel_stats, train=True)
    val_fp = FeaturePipeline(cfg.input_val, mel_stats=mel_stats, train=False)
    return train_fp, val_fp


def build_greedy_decoder(model, blank_idx, tokenizer, args=None) -> GreedyDecoder:
    kw = {}
    if args is not None:
        kw = dict(
            max_symbols_per_step=args.max_symbols_per_step,
            max_symbol_per_sample=args.max_symbol_per_sample,
            temperature=args.temperature,
            fuzzy_topk_logits=args.fuzzy_topk_logits,
            max_inputs_per_batch=int(
                getattr(args, "max_inputs_per_batch", 1e7)
            ),
        )
    return GreedyDecoder(model, blank_idx, tokenizer=tokenizer, **kw)


def build_eos_strategy(args, eos_idx: Optional[int]):
    """EOS decoding strategy from CLI (reference: args/eos.py +
    rnnt/eos_strategy.py)."""
    from caiman_asr_tpu.decoding.eos import EOSBlank, EOSIgnore, EOSPredict

    mode = getattr(args, "eos_decoding", "none") if args is not None else "none"
    if mode == "none" or eos_idx is None or eos_idx < 0:
        return None
    if mode == "ignore":
        return EOSIgnore(eos_idx)
    if mode == "blank":
        return EOSBlank(eos_idx)
    return EOSPredict(eos_idx, args.eos_alpha, args.eos_beta)


def build_decoder(
    model, blank_idx, tokenizer, args, cfg: Optional[Config] = None,
    eos_idx: Optional[int] = None,
):
    """greedy or beam per --decoder (reference: setup/base.py:185-321)."""
    eos_strategy = build_eos_strategy(args, eos_idx)
    if args is None or getattr(args, "decoder", "greedy") == "greedy":
        dec = build_greedy_decoder(model, blank_idx, tokenizer, args)
        dec.eos_strategy = eos_strategy
        return dec

    ngram_lm = None
    ngram_path = args.ngram_path or (cfg.ngram.ngram_path if cfg else None)
    if ngram_path and not getattr(args, "skip_ngram", False):
        if not Path(ngram_path).exists():
            # reference setup/base.py:425-431: a configured n-gram that is
            # missing on disk is an error, not a silent quality downgrade
            raise FileNotFoundError(
                f"N-gram not found at {ngram_path}. Ensure you have a valid "
                "n-gram, or pass the `--skip_ngram` argument to disable "
                "n-grams during validation."
            )
        from caiman_asr_tpu.lm.ngram import NGramLM

        ngram_lm = NGramLM.load(ngram_path)

    if args.decoder == "fast_beam":
        from caiman_asr_tpu.decoding.fast_beam import FastBeamDecoder

        kw_tables = None
        if getattr(args, "keyword_boost_path", None) and tokenizer is not None:
            # compile the keyword trie into the dense device automaton the
            # jitted beam boosts per expansion (keywords/device_table.py)
            from caiman_asr_tpu.keywords.device_table import (
                build_keyword_tables,
            )
            from caiman_asr_tpu.keywords.process import load_keywords

            def kw_piece(i):
                try:
                    return tokenizer.id_to_piece(i)
                except (IndexError, KeyError):
                    return ""

            kw_tables = build_keyword_tables(
                load_keywords(args.keyword_boost_path),
                [kw_piece(i) for i in range(model.n_classes)],
                skip_ids=[blank_idx],
            )
        scale = args.ngram_scale_factor
        if scale is None:
            scale = cfg.ngram.scale_factor if cfg else 0.05
        tables = None
        if ngram_lm is not None and scale > 0 and tokenizer is not None:
            # compile the ARPA model into the dense device automaton the
            # jitted beam fuses per expansion (lm/device_table.py)
            from caiman_asr_tpu.lm.device_table import build_device_tables

            skip = [blank_idx] + [
                i for i in [eos_idx] if i is not None and i >= 0
            ]
            def piece(i):
                try:
                    return tokenizer.id_to_piece(i)
                except (IndexError, KeyError):
                    return ""  # ids past the tokenizer vocab (blank slot)

            tables = build_device_tables(
                ngram_lm,
                [piece(i) for i in range(model.n_classes)],
                skip_ids=skip,
            )
        return FastBeamDecoder(
            model,
            blank_idx,
            beam_width=args.beam_width,
            # SAME default/cap as the host beam below (8): a lower device
            # cap silently truncates burst emissions — measured on a
            # word-level-piece model where the device beam lost 11 of 31
            # words at the old cap of 4 while the host beam was exact
            # (round 5; the early-exit loop keeps normal frames at ~1-2
            # iterations, so a higher bound costs nothing typical-case)
            max_symbols_per_step=args.max_symbols_per_step or 8,
            temperature=args.temperature if args.temperature != 1.0 else 1.4,
            eos_strategy=eos_strategy,
            fuzzy_topk_logits=args.fuzzy_topk_logits,
            tokenizer=tokenizer,
            ngram_lm=tables,
            ngram_alpha=scale if tables is not None else 0.0,
            keywords=kw_tables,
            max_inputs_per_batch=int(
                getattr(args, "max_inputs_per_batch", 1e7)
            ),
            score_thresh=getattr(args, "beam_prune_score_thresh", None),
            topk_thresh=getattr(args, "beam_prune_topk_thresh", None),
            # CLI threshold is seconds; the device beam counts ENCODER
            # frames, whose duration derives from the featurizer config
            # (window_stride x frame_subsampling x stack_time = 60 ms on
            # the canonical configs)
            final_emission_frames=(
                None
                if not np.isfinite(
                    fe := float(
                        getattr(args, "beam_final_emission_thresh",
                                float("inf"))
                    )
                )
                else max(1, round(fe / (
                    cfg.input_val.logmel.window_stride
                    * cfg.input_val.splicing.frame_subsampling
                    * model.cfg.enc_stack_time_factor
                )))
            ),
        )

    from caiman_asr_tpu.decoding.beam import RNNTBeamDecoder
    keywords = None
    if getattr(args, "keyword_boost_path", None):
        from caiman_asr_tpu.keywords.process import load_keywords

        keywords = load_keywords(args.keyword_boost_path)
    scale = args.ngram_scale_factor
    if scale is None:
        scale = cfg.ngram.scale_factor if cfg else 0.05
    return RNNTBeamDecoder(
        model,
        blank_idx,
        tokenizer,
        eos_strategy=eos_strategy,
        eos_is_terminal=getattr(args, "eos_is_terminal", False),
        eos_vad_threshold=getattr(args, "eos_vad_threshold", float("inf")),
        user_token_ids=[i for i in [eos_idx] if i is not None and i >= 0],
        max_inputs_per_batch=int(getattr(args, "max_inputs_per_batch", 1e7)),
        beam_width=args.beam_width,
        max_symbols_per_step=args.max_symbols_per_step or 8,
        max_symbol_per_sample=args.max_symbol_per_sample,
        temperature=args.temperature if args.temperature != 1.0 else 1.4,
        beam_prune_score_thresh=args.beam_prune_score_thresh,
        beam_prune_topk_thresh=args.beam_prune_topk_thresh,
        final_emission_thresh=args.beam_final_emission_thresh,
        ngram_lm=ngram_lm,
        ngram_alpha=scale,
        keywords=keywords,
        fuzzy_topk_logits=args.fuzzy_topk_logits,
        return_partials=not args.beam_no_partials,
    )
