"""Evaluation loop: loss + decode + WER (reference: evaluate/core.py:134-413).

Flow per validation batch: host batch -> device feature pipeline (dataset
mel-stats endpoint, ratio=1.0) -> (optional) transducer loss -> greedy/beam
decode -> detokenize -> corpus WER; predictions/references dumped to JSON.
Long-form state-resets segmentation plugs in between featurization and
decode (evaluate/state_resets.py) once enabled.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from caiman_asr_tpu.data.text.normalize import NormalizeConfig, normalize_transcript
from caiman_asr_tpu.decoding.response import (
    frame_responses_timesteps,
    frame_responses_to_tokens,
    fuse_partials,
)
from caiman_asr_tpu.latency.timestamp import FullStamp
from caiman_asr_tpu.evaluate.state_resets import (
    StateResetsConfig,
    group_segment_lanes,
    merge_segments,
    segment_batch,
)
from caiman_asr_tpu.evaluate.trim import EOSTrimConfig, trim_predictions
from caiman_asr_tpu.evaluate.wer import ErrorRateKind, WERResult, word_error_rate


@dataclass
class EvalResult:
    wer: float
    scores: int
    num_words: int
    loss: Optional[float]
    hyps: List[str] = field(default_factory=list)
    refs: List[str] = field(default_factory=list)
    fnames: List[str] = field(default_factory=list)
    timestamps: List[List[int]] = field(default_factory=list)
    word_timestamps: Optional[list] = None  # List[SequenceTimestamp]
    latency_metrics: Optional[dict] = None
    # per-utterance Silence/EOS/Never (trim.py) — how a live endpointer
    # would have terminated each utterance
    terminations: Optional[list] = None


def evaluate(
    params,
    decoder,
    loader,
    feat_pipeline,
    tokenizer,
    *,
    val_loss_fn=None,
    standardize_wer: bool = True,
    error_rate: ErrorRateKind = ErrorRateKind.WORD,
    normalize_config: Optional[NormalizeConfig] = None,
    charset: Optional[list] = None,
    dump_preds_dir: Optional[str | Path] = None,
    epoch: int = 0,
    step: int = 0,
    subset: str = "dev",
    logger=None,
    state_resets: Optional[StateResetsConfig] = None,
    ctm_path: Optional[str] = None,
    gt_ctm_path: Optional[str] = None,
    frame_width: float = 0.06,
    norm_ratio: float = 1.0,
    eos_vad_threshold: float = float("inf"),
    eos_trim: Optional[EOSTrimConfig] = None,
    pre_enc_width: Optional[float] = None,
) -> EvalResult:
    """Run one full evaluation over ``loader``. ``decoder`` must expose
    ``decode(params, feats, feat_lens) -> List[Dict[int, FrameResponses]]``.

    eos_vad_threshold / eos_trim: offline endpointing (evaluate/trim.py) —
    every decode is trimmed where a live system would have terminated, and
    the per-utterance Silence/EOS/Never termination is recorded (feeds the
    user-perceived word timestamps and the SIL/EOS endpoint latencies).
    pre_enc_width: stacked input-feature frame seconds (``feat_lens`` unit);
    defaults to frame_width / 2 (stack_time_factor 2)."""
    t0 = time.time()
    norm_cfg = normalize_config or NormalizeConfig()
    charset = charset if charset is not None else list(" abcdefghijklmnopqrstuvwxyz'")
    if pre_enc_width is None:
        pre_enc_width = frame_width / 2.0

    hyps: List[str] = []
    refs: List[str] = []
    fnames: List[str] = []
    tss: List[List[int]] = []
    pieces_list: List[List[str]] = []
    terminations: list = []
    loss_sum, loss_count = 0.0, 0.0

    for batch in loader.epoch(0):
        feats, feat_lens = feat_pipeline(
            # 1.0 = dataset stats (the streaming-compatible endpoint);
            # --norm_over_utterance evaluates legacy models at 0.0
            batch.audio, batch.audio_lens, dataset_to_utt_ratio=norm_ratio
        )
        if val_loss_fn is not None:
            ls, n = val_loss_fn(
                params,
                {
                    "feats": feats,
                    "feat_lens": feat_lens,
                    "txt": batch.tokens,
                    "txt_lens": batch.token_lens,
                },
            )
            loss_sum += float(ls)
            loss_count += float(n)

        def two_clock_ts(resp):
            """[FullStamp(model, user_perceived)] per token — the user clock
            rewinds finals to the frame their characters became continuously
            visible as partials (reference core.py:222-231 + fuse_partials).
            Decoders without partials stamp both clocks at the final's
            frame, so this degrades to plain ints there."""
            model_t = frame_responses_timesteps(resp)
            emit_t = frame_responses_timesteps(fuse_partials(resp))
            return [
                FullStamp(m, u) if m != u else m
                for m, u in zip(model_t, emit_t)
            ]

        if state_resets is not None:
            # segment long utterances into extra lanes, decode, then merge
            # per-utterance token streams (state_resets.py)
            seg_feats, seg_lens, counts = segment_batch(
                np.asarray(feats), np.asarray(feat_lens), state_resets
            )
            responses = decoder.decode(
                params, jax.numpy.asarray(seg_feats), jax.numpy.asarray(seg_lens)
            )
            per_utt = []
            for lo, hi in group_segment_lanes(counts):
                seg_toks = [frame_responses_to_tokens(responses[i]) for i in range(lo, hi)]
                seg_ts = [two_clock_ts(responses[i]) for i in range(lo, hi)]
                toks, ts, _ = merge_segments(seg_toks, seg_ts, None, state_resets)
                per_utt.append((toks, ts))
        else:
            responses = decoder.decode(params, feats, feat_lens)
            per_utt = []
            for resp in responses:
                per_utt.append(
                    (frame_responses_to_tokens(resp), two_clock_ts(resp))
                )

        # offline endpointing: trim each decode where a live system would
        # have terminated (VAD silence / EOS), before detokenization
        # (reference evaluate/core.py:243-268)
        batch_toks = [toks for toks, _ in per_utt]
        batch_ts = [ts for _, ts in per_utt]
        batch_toks, batch_ts, _, batch_term = trim_predictions(
            batch_toks,
            batch_ts,
            None,
            pre_enc_width,
            frame_width,
            np.asarray(feat_lens).tolist(),
            eos_vad_threshold=eos_vad_threshold,
            eos_info=eos_trim,
        )
        for b, (toks, ts) in enumerate(zip(batch_toks, batch_ts)):
            hyps.append(tokenizer.detokenize(toks))
            refs.append(
                normalize_transcript(batch.transcripts[b], charset, norm_cfg)
            )
            fnames.append(batch.fnames[b])
            tss.append(ts)
            terminations.append(batch_term[b])
            pieces_list.append(
                [tokenizer.id_to_piece(t).replace("▁", " ") for t in toks]
            )

    wer_res: WERResult = word_error_rate(
        hyps, refs, standardize=standardize_wer, kind=error_rate
    )
    loss = loss_sum / loss_count if loss_count else None

    result = EvalResult(
        wer=wer_res.wer,
        scores=wer_res.scores,
        num_words=wer_res.num_words,
        loss=loss,
        hyps=hyps,
        refs=refs,
        fnames=fnames,
        timestamps=tss,
        terminations=terminations,
    )

    # word-level timestamps + CTM export + emission latency vs ground truth
    # (reference evaluate/core.py:342-374, latency/ctm.py)
    from caiman_asr_tpu.latency.ctm import dump_ctm, measure_emission_latency
    from caiman_asr_tpu.latency.timestamp import group_timestamps, user_perceived_time

    result.word_timestamps = group_timestamps(
        pieces_list,
        [[user_perceived_time(t) for t in ts] for ts in tss],
        hyps,
        terminations,
    )
    if jax.process_count() > 1:
        # Per-process shards -> the global result on EVERY process
        # (reference process_evaluation_epoch gathers to rank 0; here the
        # allgather keeps die_if_wer_bad / best-ckpt logic rank-agnostic).
        from caiman_asr_tpu.evaluate.distributed import aggregate_eval_results

        result = aggregate_eval_results(result, loss_count)
        hyps, refs, fnames = result.hyps, result.refs, result.fnames
        if jax.process_index() != 0:
            logger, dump_preds_dir, ctm_path = None, None, None
    if ctm_path is not None:
        last_emit = dump_ctm(fnames, result.word_timestamps, ctm_path, frame_width)
        if gt_ctm_path is not None:
            # real terminations feed the SIL/EOS endpoint latencies
            # (reference latency/ctm.py:116-140)
            result.latency_metrics = measure_emission_latency(
                gt_ctm_path, ctm_path, frame_width=frame_width,
                last_emit_time=last_emit,
            )
            if logger is not None and result.latency_metrics["n"]:
                logger.log(
                    (epoch, step),
                    {f"latency_{k}": v for k, v in result.latency_metrics.items()
                     if v is not None},
                    subset=subset,
                )
    if logger is not None:
        metrics = {"wer": result.wer * 100.0, "took": time.time() - t0}
        if result.terminations and (
            eos_vad_threshold != float("inf") or eos_trim is not None
        ):
            # termination-kind mix (reference core.py:330-341)
            from caiman_asr_tpu.latency.timestamp import EOS as _EOS
            from caiman_asr_tpu.latency.timestamp import Silence as _Sil

            n = len(result.terminations)
            metrics["eos_frac"] = (
                sum(isinstance(t, _EOS) for t in result.terminations) / n
            )
            metrics["sil_frac"] = (
                sum(isinstance(t, _Sil) for t in result.terminations) / n
            )
            metrics["rem_frac"] = 1 - metrics["eos_frac"] - metrics["sil_frac"]
        if result.loss is not None:
            # result.loss, not the local `loss`: after aggregation it is the
            # count-weighted GLOBAL loss (the local shard's loss would
            # silently disagree with the global WER logged next to it)
            metrics["loss"] = result.loss
        logger.log((epoch, step), metrics, subset=subset)
    if dump_preds_dir is not None:
        out = Path(dump_preds_dir)
        out.mkdir(parents=True, exist_ok=True)
        payload = {
            "step": step,
            "wer": result.wer,
            "predictions": [
                {"fname": f, "hyp": h, "ref": r}
                for f, h, r in zip(fnames, hyps, refs)
            ],
        }
        (out / f"preds_step{step}.json").write_text(json.dumps(payload, indent=1))
    return result
