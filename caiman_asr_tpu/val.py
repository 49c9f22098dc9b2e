"""Validation / offline decoding entry point (reference: val.py:36-163).

Run:  python -m caiman_asr_tpu.val --model_config ... --ckpt ckpts/best.npz \
        --val_manifests dev.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from caiman_asr_tpu.args.shared import (
    add_decoder_args,
    add_latency_args,
    add_shared_args,
    add_state_reset_args,
    add_wer_analysis_args,
)
from caiman_asr_tpu.evaluate.core import evaluate
from caiman_asr_tpu.export.checkpointer import apply_params, load_checkpoint
from caiman_asr_tpu.log import init_log
from caiman_asr_tpu.models.config import load_config
from caiman_asr_tpu.setup.builders import (
    build_decoder,
    build_feature_pipelines,
    build_model,
    build_tokenizer,
    build_data_source_loader,
    load_mel_stats,
    normalize_config_from,
)
from caiman_asr_tpu.training import make_val_loss_step


def val_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="RNN-T validation (TPU-native)")
    add_shared_args(parser)
    add_decoder_args(parser)
    add_state_reset_args(parser)
    add_latency_args(parser)
    add_wer_analysis_args(parser)
    parser.add_argument("--ckpt", "--checkpoint", type=str, default=None, help="checkpoint to evaluate")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU execution (reference ValCPUSetup)")
    parser.add_argument("--use_ema", action="store_true", default=True)
    parser.add_argument("--no_ema", dest="use_ema", action="store_false")
    parser.add_argument("--calc_loss", "--calculate_loss", action="store_true")
    parser.add_argument("--nth_batch_only", type=int, default=None,
                        help="only evaluate the nth batch (0-based), useful "
                             "for debugging (reference args/val.py:119)")
    parser.add_argument(
        "--norm_over_utterance", action="store_true",
        help="normalize mel features with full-utterance stats instead of "
             "dataset stats — NOT streaming compatible; for evaluating "
             "legacy models (reference args/mel_feat_norm.py:43)")
    return parser


class _NthBatchLoader:
    """Evaluate only the nth batch (reference --nth_batch_only,
    args/val.py:119) — debugging aid for isolating a bad batch."""

    def __init__(self, loader, n: int):
        self._loader = loader
        self._n = n

    def epoch(self, i: int):
        import itertools

        return itertools.islice(self._loader.epoch(i), self._n, self._n + 1)

    def __getattr__(self, name):
        return getattr(self._loader, name)


def validate(args=None):
    if args is None:
        args = val_arg_parser().parse_args()
    if getattr(args, "cpu", False):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as e:  # backend already initialised
            print(f"WARNING: --cpu ignored (backend already initialised: {e})")
    out_dir = Path(args.output_dir)
    logger = init_log(
        out_dir,
        enable_tensorboard=False,
        log_file=getattr(args, "log_file", None),
        timestamp=getattr(args, "timestamp", None),
    )

    if getattr(args, "calculate_emission_latency", False):
        if not args.gt_ctm:
            raise SystemExit(
                "--calculate_emission_latency requires --gt_ctm reference "
                "CTMs (generate them with latency/generate_gt_ctm.py)"
            )
        if args.decoder == "beam" and args.beam_no_partials:
            raise SystemExit(
                "Cannot calculate emission latency for beam search if "
                "--beam_no_partials is set"
            )
    bundle = load_config(args.model_config, None)
    from caiman_asr_tpu.setup.builders import apply_input_overrides

    cfg = apply_input_overrides(bundle.cfg, args)
    tokenizer = build_tokenizer(cfg, args.tokenizer_model)
    model, blank_idx = build_model(cfg, tokenizer)

    params = model.init(jax.random.PRNGKey(0))
    if args.ckpt:
        loaded, ema, _, meta = load_checkpoint(args.ckpt)
        src = ema if (args.use_ema and ema is not None) else loaded
        params = apply_params(params, src)
        print(f"Loaded {'EMA ' if args.use_ema and ema is not None else ''}weights "
              f"from {args.ckpt} (step {meta.get('step', '?')})")

    mel_stats = load_mel_stats(args.mel_stats_path)
    _, val_fp = build_feature_pipelines(cfg, mel_stats)
    loader = build_data_source_loader(
        args, cfg, tokenizer, args.val_batch_size, train=False
    )
    if args.nth_batch_only is not None:
        loader = _NthBatchLoader(loader, args.nth_batch_only)
    from caiman_asr_tpu.utils.user_tokens import get_user_token

    try:
        eos_idx = get_user_token("eos", cfg.user_tokens, tokenizer)
    except ValueError as e:
        print(f"WARNING: eos token disabled: {e}")
        eos_idx = None
    if args.decoder == "beam" and (
        args.beam_parallel_procs > 1 or args.beam_parallel_procs == -1
    ):
        from caiman_asr_tpu.decoding.parallel import ParallelDecoder

        decoder = ParallelDecoder(
            model,
            args.model_config,
            args.tokenizer_model,
            args.ckpt,
            decoder_kwargs=dict(
                beam_width=args.beam_width,
                temperature=args.temperature if args.temperature != 1.0 else 1.4,
                beam_prune_score_thresh=args.beam_prune_score_thresh,
                beam_prune_topk_thresh=args.beam_prune_topk_thresh,
            ),
            nprocs=args.beam_parallel_procs,
            min_batch_per_proc=args.beam_min_decode_batch_size_per_proc,
        )
    else:
        decoder = build_decoder(model, blank_idx, tokenizer, args, cfg, eos_idx=eos_idx)

    state_resets = None
    if args.sr_segment and args.sr_segment > 0:
        from caiman_asr_tpu.evaluate.state_resets import StateResetsConfig

        frame_duration = (
            cfg.input_val.logmel.window_stride * cfg.input_val.splicing.frame_subsampling
        )
        state_resets = StateResetsConfig.from_seconds(
            args.sr_segment,
            args.sr_overlap,
            frame_duration,
            cfg.rnnt.enc_stack_time_factor,
        )

    # offline endpointing (evaluate/trim.py): cut hyps where a live system
    # would have terminated and record Silence/EOS/Never per utterance —
    # greedy AND beam both flow through this (reference core.py:243-268)
    from caiman_asr_tpu.evaluate.trim import EOSTrimConfig

    eos_trim = None
    if eos_idx is not None and eos_idx >= 0:
        eos_trim = EOSTrimConfig(
            eos_idx=eos_idx,
            eos_is_terminal=getattr(args, "eos_is_terminal", False),
            blank_idx=blank_idx,
        )
    pre_enc_width = (
        cfg.input_val.logmel.window_stride
        * cfg.input_val.splicing.frame_stacking
    )
    result = evaluate(
        params,
        decoder,
        loader,
        val_fp,
        tokenizer,
        val_loss_fn=make_val_loss_step(model, blank_idx) if args.calc_loss else None,
        standardize_wer=cfg.input_val.dataset.standardize_wer,
        normalize_config=normalize_config_from(cfg.input_val),
        charset=list(cfg.tokenizer.labels),
        dump_preds_dir=(out_dir / "preds") if args.dump_preds else None,
        norm_ratio=0.0 if getattr(args, "norm_over_utterance", False) else 1.0,
        subset="dev",
        logger=logger,
        state_resets=state_resets,
        ctm_path=str(out_dir / "model.ctm") if args.dump_ctm else None,
        gt_ctm_path=args.gt_ctm,
        frame_width=(
            cfg.input_val.logmel.window_stride
            * cfg.input_val.splicing.frame_subsampling
            * cfg.rnnt.enc_stack_time_factor
        ),
        eos_vad_threshold=getattr(args, "eos_vad_threshold", float("inf")),
        eos_trim=eos_trim,
        pre_enc_width=pre_enc_width,
    )
    if args.wer_breakdown:
        from caiman_asr_tpu.evaluate.wer_breakdown import print_wer_breakdown

        print_wer_breakdown(result.hyps, result.refs, args.breakdown_chars)
    if args.punctuation_error_rate:
        from caiman_asr_tpu.evaluate.punctuation_error_rate import (
            punctuation_error_rate,
        )

        counts = punctuation_error_rate(result.refs, result.hyps)
        for sym, c in counts.items():
            print(f"punct {sym!r}: rate={c.rate:.3f} "
                  f"(ok={c.correct} del={c.deletions} ins={c.insertions} "
                  f"sub={c.substitutions})")
    print(json.dumps({"wer": result.wer, "loss": result.loss}))
    return result


if __name__ == "__main__":
    validate()
