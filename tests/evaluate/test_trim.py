"""Offline EOS/VAD trim semantics (reference evaluate/trim.py:28-160).

Scripted decodes exercise all three termination kinds and the trim cuts:
mid-utterance silence, trailing silence, all-blank utterances, terminal and
non-terminal EOS, and the precedence between silence and EOS cuts."""

import math

from caiman_asr_tpu.evaluate.trim import EOSTrimConfig, trim_predictions
from caiman_asr_tpu.latency.timestamp import EOS, FullStamp, Never, Silence

# widths of the base config: 30 ms stacked input frames, 60 ms encoder frames
I_W, O_W = 0.03, 0.06
BLANK, EOS_ID = 100, 7


def _one(y, t, worst, thresh=math.inf, eos=None, p=None):
    preds, ts, probs, terms = trim_predictions(
        [y], [t], None if p is None else [p], I_W, O_W, [worst],
        eos_vad_threshold=thresh, eos_info=eos,
    )
    return preds[0], ts[0], (None if probs is None else probs[0]), terms[0]


def test_never_when_no_threshold_and_no_eos():
    y, t, _, term = _one([1, 2, 3], [0, 5, 9], worst=40)
    assert (y, t) == ([1, 2, 3], [0, 5, 9])
    assert term == Never()


def test_all_blank_short_audio_is_never():
    # 1.2 s of audio, 2 s threshold: VAD would not have fired yet
    y, t, _, term = _one([], [], worst=40, thresh=2.0)
    assert y == [] and term == Never()


def test_all_blank_long_audio_is_silence_at_threshold():
    # 3 s of audio, 2 s threshold: a live VAD fires after exactly 2 s
    _, _, _, term = _one([], [], worst=100, thresh=2.0)
    assert term == Silence(2.0)


def test_trailing_silence():
    # last token at frame 9 -> heard by 0.6 s; audio runs 3.0 s: the 2.4 s
    # tail gap exceeds the 2 s threshold -> Silence at 0.6 + 2.0
    y, t, _, term = _one([1, 2], [4, 9], worst=100, thresh=2.0)
    assert (y, t) == ([1, 2], [4, 9])  # nothing after the gap to trim
    assert term == Silence(0.6 + 2.0)


def test_mid_silence_trims_later_tokens():
    # gap frames 9 -> 60 is 51 frames > round(2.0/0.06)=33 -> cut after idx 1,
    # termination at (9 + 1 + 33) * 0.06
    y, t, _, term = _one([1, 2, 3, 4], [4, 9, 60, 61], worst=200, thresh=2.0)
    assert (y, t) == ([1, 2], [4, 9])
    assert term == Silence((9 + 1 + 33) * O_W)


def test_no_cut_before_first_token():
    # a long gap BEFORE the first token never cuts (speaker not yet heard)
    y, t, _, term = _one([1, 2], [90, 92], worst=200, thresh=2.0)
    assert (y, t) == ([1, 2], [90, 92])
    # trailing check uses the last token: 200*0.03 - (92+1)*0.06 = 0.42 < 2
    assert term == Never()


def test_eos_terminal_cuts_at_first_eos():
    eos = EOSTrimConfig(eos_idx=EOS_ID, eos_is_terminal=True, blank_idx=BLANK)
    y, t, _, term = _one([1, EOS_ID, 2, EOS_ID], [3, 5, 8, 9], worst=40, eos=eos)
    assert (y, t) == ([1, EOS_ID], [3, 5])  # EOS token itself is kept
    assert term == EOS((5 + 1) * O_W)


def test_eos_non_terminal_only_reports_trailing_eos():
    eos = EOSTrimConfig(eos_idx=EOS_ID, eos_is_terminal=False, blank_idx=BLANK)
    # mid-stream EOS followed by real tokens: no trim, no EOS termination
    y, t, _, term = _one([1, EOS_ID, 2], [3, 5, 8], worst=40, eos=eos)
    assert (y, t) == ([1, EOS_ID, 2], [3, 5, 8])
    assert term == Never()
    # trailing EOS (the last non-blank): reported AND trimmed after it
    y, t, _, term = _one([1, 2, EOS_ID], [3, 5, 8], worst=40, eos=eos)
    assert (y, t) == ([1, 2, EOS_ID], [3, 5, 8])
    assert term == EOS((8 + 1) * O_W)
    # earliest trailing EOS of an EOS run wins
    y, t, _, term = _one(
        [1, EOS_ID, EOS_ID], [3, 5, 8], worst=40, eos=eos
    )
    assert (y, t) == ([1, EOS_ID], [3, 5])
    assert term == EOS((5 + 1) * O_W)


def test_silence_cut_wins_when_earlier_than_eos():
    # the mid-gap cut removes the EOS entirely -> Silence reported
    eos = EOSTrimConfig(eos_idx=EOS_ID, eos_is_terminal=True, blank_idx=BLANK)
    y, t, _, term = _one(
        [1, 2, EOS_ID], [4, 9, 60], worst=200, thresh=2.0, eos=eos
    )
    assert (y, t) == ([1, 2], [4, 9])
    assert term == Silence((9 + 1 + 33) * O_W)


def test_eos_before_silence_gap_still_reports_eos():
    eos = EOSTrimConfig(eos_idx=EOS_ID, eos_is_terminal=True, blank_idx=BLANK)
    y, t, _, term = _one(
        [1, EOS_ID, 2, 3], [4, 9, 60, 61], worst=200, thresh=2.0, eos=eos
    )
    # silence cut first trims to [1, EOS], then the EOS check fires
    assert (y, t) == ([1, EOS_ID], [4, 9])
    assert term == EOS((9 + 1) * O_W)


def test_probs_trimmed_in_lockstep():
    y, t, p, term = _one(
        [1, 2, 3], [4, 9, 60], worst=200, thresh=2.0, p=[0.1, 0.2, 0.3]
    )
    assert p == [0.1, 0.2]


def test_user_perceived_clock_drives_the_cuts():
    # FullStamp: model clock says frame 9, user clock says frame 60 — the
    # user-perceived clock must drive the gap detection (reference
    # trim.py:100-104 uses user_perceived_time)
    y, t, _, term = _one(
        [1, 2], [FullStamp(4, 4), FullStamp(9, 60)], worst=200, thresh=2.0
    )
    assert term == Never() or isinstance(term, Silence)
    # gap 4 -> 60 on the user clock is 56 > 33 frames: cut after token 1
    assert y == [1]
    assert term == Silence((4 + 1 + 33) * O_W)


def test_evaluate_core_wires_terminations():
    """evaluate() no longer hard-codes Never(): a scripted decoder whose
    output has a long internal gap yields a Silence termination and a
    trimmed hypothesis."""
    import numpy as np

    from caiman_asr_tpu.decoding.response import (
        DecodingResponse,
        FrameResponses,
        HypothesisResponse,
    )
    from caiman_asr_tpu.evaluate.core import evaluate

    class Tok:
        def detokenize(self, ids):
            return " ".join("w%d" % i for i in ids)

        def id_to_piece(self, i):
            return "▁w%d" % i

    class Batch:
        audio = np.zeros((1, 16000), np.float32)
        audio_lens = np.array([16000])
        tokens = np.zeros((1, 1), np.int32)
        token_lens = np.array([1])
        transcripts = ["w1 w2"]
        fnames = ["utt0"]

    class Loader:
        def epoch(self, _):
            yield Batch()

    def feat_pipeline(audio, audio_lens, dataset_to_utt_ratio=0.0):
        # 100 stacked frames = 3 s of audio
        return np.zeros((100, 1, 240), np.float32), np.array([100])

    def fin(tok, frame):
        return FrameResponses(
            partials=None,
            final=DecodingResponse(
                start_frame_idx=frame, duration_frames=1,
                is_provisional=False,
                alternatives=[HypothesisResponse(
                    y_seq=[tok], timesteps=[frame],
                    token_seq=["▁w%d" % tok], confidence=[1.0],
                )],
            ),
        )

    class ScriptedDecoder:
        def decode(self, params, feats, feat_lens):
            # tokens at frames 4, 9 then a gap to frame 60
            return [{4: fin(1, 4), 9: fin(2, 9), 60: fin(3, 60)}]

    res = evaluate(
        None, ScriptedDecoder(), Loader(), feat_pipeline, Tok(),
        eos_vad_threshold=2.0, pre_enc_width=0.03, frame_width=0.06,
    )
    assert res.terminations == [Silence((9 + 1 + 33) * 0.06)]
    assert res.hyps == ["w1 w2"]  # token 3 trimmed
    assert res.word_timestamps[0].eos == Silence((9 + 1 + 33) * 0.06)
