"""Generate ground-truth word-level CTMs via RNN-T Viterbi forced alignment
(reference: latency/forced_align.py, which shells out to a torchaudio CTC
aligner; here any trained RNN-T checkpoint aligns its own data through the
lattice — latency/forced_align.py:viterbi_alignment).

The resulting CTM is the ground truth that ``--gt_ctm`` consumes for
emission-latency measurement during validation.

Run: python -m caiman_asr_tpu.latency.generate_gt_ctm \
       --model_config cfg.yaml --ckpt best.npz --dataset_dir DATA \
       --manifests dev.json --output_ctm gt.ctm
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _segmented_alignment(
    model, params, feats, feat_lens, batch, blank_idx, seg_frames
):
    """Encode one long utterance (B=1) in segments carrying the LSTM
    streaming state — exact, unlike the reference's stateless CTC chunks
    (forced_align.py:288-321) — then align on the concatenated encoder
    output."""
    from caiman_asr_tpu.latency.forced_align import viterbi_alignment_from_enc

    T = int(np.asarray(feat_lens)[0])
    state = None
    fs = []
    for s in range(0, T, seg_frames):
        seg = feats[s : min(s + seg_frames, T)]
        f, fl, state = model.encode(
            params, seg, jnp.asarray([seg.shape[0]]), enc_state=state,
            train=False,
        )
        fs.append(np.asarray(f[:, : int(fl[0])]))
    f = jnp.asarray(np.concatenate(fs, axis=1))
    f_lens = jnp.asarray([f.shape[1]])
    g, _, _ = model.predict(
        params, jnp.asarray(batch.tokens), batch_size=1, train=False
    )
    return viterbi_alignment_from_enc(
        model, params, f, f_lens, g, batch.tokens, batch.token_lens, blank_idx
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="forced-alignment ground-truth CTM")
    p.add_argument("--model_config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--tokenizer_model", default=None)
    p.add_argument("--dataset_dir", default=".")
    p.add_argument("--manifests", nargs="+", required=True)
    p.add_argument("--output_ctm", required=True)
    p.add_argument("--mel_stats_path", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_utts", type=int, default=None)
    p.add_argument(
        "--segment_len", type=int, default=0,
        help="Minutes per encoder segment for long audio (reference "
             "forced_align.py:288-321). 0 = encode whole utterances. Unlike "
             "the reference's stateless CTC chunks, segments here carry the "
             "LSTM streaming state, so segmented encoding is EXACT; "
             "utterances are processed one at a time in this mode.")
    args = p.parse_args(argv)

    from caiman_asr_tpu.export.checkpointer import apply_params, load_checkpoint
    from caiman_asr_tpu.latency.ctm import to_ctm
    from caiman_asr_tpu.latency.forced_align import (
        alignment_to_ctm_entries,
        viterbi_alignment,
    )
    from caiman_asr_tpu.latency.timestamp import Never, PerWordTimestamp, SequenceTimestamp
    from caiman_asr_tpu.models.config import load_config
    from caiman_asr_tpu.setup.builders import (
        build_feature_pipelines,
        build_model,
        build_tokenizer,
        build_val_loader,
        load_mel_stats,
        load_utterances,
    )

    bundle = load_config(args.model_config)
    cfg = bundle.cfg
    tokenizer = build_tokenizer(cfg, args.tokenizer_model)
    model, blank_idx = build_model(cfg, tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    loaded, ema, _, _ = load_checkpoint(args.ckpt)
    params = apply_params(params, ema if ema is not None else loaded)

    mel_stats = load_mel_stats(args.mel_stats_path)
    _, val_fp = build_feature_pipelines(cfg, mel_stats)
    utts = load_utterances(args.manifests, args.dataset_dir, cfg.input_val)
    if args.max_utts:
        utts = utts[: args.max_utts]
    seg_frames = 0
    if args.segment_len:
        feat_secs = (
            cfg.input_val.logmel.window_stride
            * cfg.input_val.splicing.frame_subsampling
        )
        seg_frames = int(round(args.segment_len * 60.0 / feat_secs))
        stf = cfg.rnnt.enc_stack_time_factor
        seg_frames -= seg_frames % stf  # keep StackTime groups intact
        args.batch_size = 1  # exact per-utterance state carry
    loader = build_val_loader(utts, tokenizer, cfg.input_val, args.batch_size)

    frame_width = (
        cfg.input_val.logmel.window_stride
        * cfg.input_val.splicing.frame_subsampling
        * cfg.rnnt.enc_stack_time_factor
    )
    out = Path(args.output_ctm)
    out.write_text("")
    n = 0
    for batch in loader.epoch(0):
        feats, feat_lens = val_fp(
            batch.audio, batch.audio_lens, dataset_to_utt_ratio=1.0
        )
        if seg_frames and feats.shape[0] > seg_frames:
            frames = _segmented_alignment(
                model, params, feats, feat_lens, batch, blank_idx, seg_frames
            )
        else:
            frames = viterbi_alignment(
                model, params, feats, jnp.asarray(feat_lens),
                batch.tokens, batch.token_lens, blank_idx,
            )
        for b, fr in enumerate(frames):
            toks = [int(t) for t in batch.tokens[b, : batch.token_lens[b]]]
            rows = alignment_to_ctm_entries(fr, toks, tokenizer, frame_width)
            seq = SequenceTimestamp(
                [
                    PerWordTimestamp(word, int(start / frame_width),
                                     int(end / frame_width) - 1)
                    for start, end, word in rows
                ],
                Never(),
            )
            to_ctm(seq, str(out), batch.fnames[b], frame_width)
            n += 1
    print(f"wrote {out} ({n} utterances)")


if __name__ == "__main__":
    main()
