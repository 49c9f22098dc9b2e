"""Native (C++) response serializer == Python host path.

Two engines with identical params/weights process the same audio; the
native one returns pre-serialized JSON strings which must parse to the
same response stream (same transcripts, same final/provisional split,
same commit order) as the Python dicts."""

import json

import jax
import numpy as np
import pytest

from caiman_asr_tpu.models.rnnt import RNNT, RNNTModelConfig
from caiman_asr_tpu.serving.engine import StreamingEngine

N_CLASSES = 12
BLANK = N_CLASSES - 1


class Tok:
    def detokenize(self, ids):
        return "".join(chr(97 + i) for i in ids)

    def id_to_piece(self, i):
        return chr(97 + i)


def _model():
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    return model, model.init(jax.random.PRNGKey(3))


def _drive(engine, audio_by_lane):
    """Feed each lane its audio, run to EOS, return per-lane normalized
    response streams [(is_provisional, transcript, start), ...]."""
    lanes = {}
    for audio in audio_by_lane:
        lane = engine.open_stream()
        engine.push_audio(lane, audio)
        engine.close_stream(lane)
        lanes[lane] = []
    while engine.streams:
        out = engine.tick()
        for lane, msgs in out.items():
            msgs = msgs if isinstance(msgs, list) else [msgs]
            for m in msgs:
                if isinstance(m, str):
                    m = json.loads(m)
                if m.get("eos"):
                    continue
                lanes[lane].append(
                    (
                        bool(m["is_provisional"]),
                        m["alternatives"][0]["transcript"],
                        float(m["start"]),
                    )
                )
    return lanes


@pytest.mark.slow
@pytest.mark.parametrize("decoder", ["greedy", "beam"])
def test_native_matches_python(decoder):
    model, params = _model()
    rng = np.random.default_rng(0)
    audio = [
        (rng.normal(size=960 * 5) * 0.1).astype(np.float32),
        (rng.normal(size=960 * 3) * 0.1).astype(np.float32),
    ]

    kw = dict(max_streams=2, decoder=decoder, beam_width=3,
              max_symbols_per_step=4)
    py = StreamingEngine(
        model, params, BLANK, Tok(), native_serializer=False, **kw
    )
    nat = StreamingEngine(
        model, params, BLANK, Tok(), native_serializer=True, **kw
    )
    assert nat._native_ser is not None

    got_py = _drive(py, audio)
    got_nat = _drive(nat, audio)
    assert set(got_py) == set(got_nat)
    for lane in got_py:
        # the EOS tail-flush response is built by the Python path in both
        # engines; everything before it must match exactly
        assert got_nat[lane] == got_py[lane], f"lane {lane} diverged"


def test_native_piece_boundaries_and_escaping():
    """Word-boundary ▁ pieces become spaces; JSON-special chars survive."""
    from caiman_asr_tpu.native import ResponseSerializer

    rs = ResponseSerializer(1, 1, 1, 0.06, ["▁he", "llo", '"\\', "\n"])
    packed = np.zeros((1, 6), np.int32)
    packed[0, :4] = [0, 1, 2, 3]
    packed[0, 5] = 4
    out = rs.greedy_tick(packed, np.array([1], bool))
    msg = json.loads(out[0][0])
    assert msg["alternatives"][0]["transcript"] == ' hello"\\\n'
    assert msg["is_provisional"] is False
    assert msg["start"] == 0.0 and msg["end"] == 0.06


@pytest.mark.slow
def test_native_fuzz_parity():
    """Property test: across randomized schedules (lane churn, ragged chunk
    sizes, mid-stream closes, interleaved ticks) the native serializer's
    response stream equals the Python path's, both decoders."""
    model, params = _model()

    def drive_schedule(engine, trial_seed):
        rng = np.random.default_rng(trial_seed)
        n_lanes = int(rng.integers(1, 4))
        lanes = {}
        plans = {}
        for _ in range(n_lanes):
            lane = engine.open_stream()
            lanes[lane] = []
            n = int(rng.integers(1, 8)) * 960
            plans[lane] = (rng.normal(size=n) * 0.1).astype(np.float32)
        offs = {k: 0 for k in plans}
        closed = set()
        for _ in range(64):
            for lane, audio in plans.items():
                if lane in closed:
                    continue
                step = int(rng.integers(0, 2000))
                chunk = audio[offs[lane]: offs[lane] + step]
                if len(chunk):
                    engine.push_audio(lane, chunk)
                    offs[lane] += len(chunk)
                if offs[lane] >= len(audio):
                    engine.close_stream(lane)
                    closed.add(lane)
            out = engine.tick()
            for lane, msgs in out.items():
                for m in msgs if isinstance(msgs, list) else [msgs]:
                    if isinstance(m, str):
                        m = json.loads(m)
                    if m.get("eos"):
                        continue
                    lanes[lane].append(
                        (bool(m["is_provisional"]),
                         m["alternatives"][0]["transcript"],
                         float(m["start"])))
            if len(closed) == len(plans) and not engine.streams:
                break
        # drain any EOS flush stragglers
        for _ in range(32):
            if not engine.streams:
                break
            for lane, msgs in engine.tick().items():
                for m in msgs if isinstance(msgs, list) else [msgs]:
                    if isinstance(m, str):
                        m = json.loads(m)
                    if not m.get("eos"):
                        lanes[lane].append(
                            (bool(m["is_provisional"]),
                             m["alternatives"][0]["transcript"],
                             float(m["start"])))
        assert not engine.streams
        return lanes

    for decoder in ["greedy", "beam"]:
        kw = dict(max_streams=4, decoder=decoder, beam_width=3,
                  max_symbols_per_step=4)
        py = StreamingEngine(model, params, BLANK, Tok(),
                             native_serializer=False, **kw)
        nat = StreamingEngine(model, params, BLANK, Tok(),
                              native_serializer=True, **kw)
        for trial in range(8):
            seed = 1000 * (decoder == "beam") + trial
            got_py = drive_schedule(py, seed)
            got_nat = drive_schedule(nat, seed)
            assert got_py == got_nat, (decoder, trial)


@pytest.mark.parametrize("decoder", ["greedy", "beam"])
@pytest.mark.parametrize("pipeline_depth", [0, 2])
def test_wire_mode_matches_dict_mode(decoder, pipeline_depth):
    """wire_responses=True returns the same response stream as the default
    dict mode — flattened via WireTick.to_dict, byte-for-byte JSON — across
    lane churn, pipelining and the EOS flush."""
    model, params = _model()
    rng = np.random.default_rng(7)
    audio = [
        (rng.normal(size=960 * 4) * 0.1).astype(np.float32),
        (rng.normal(size=960 * 6) * 0.1).astype(np.float32),
        (rng.normal(size=960 * 2) * 0.1).astype(np.float32),
    ]
    kw = dict(max_streams=3, decoder=decoder, beam_width=3,
              max_symbols_per_step=4, pipeline_depth=pipeline_depth)
    base = StreamingEngine(model, params, BLANK, Tok(), **kw)
    wired = StreamingEngine(
        model, params, BLANK, Tok(), wire_responses=True, **kw
    )
    assert wired._wire and wired._native_ser is not None

    from caiman_asr_tpu.serving.engine import WireTick

    class _Unwrap:
        """Adapter so _drive can consume WireTicks like dicts."""

        def __init__(self, eng):
            self.eng = eng

        def __getattr__(self, k):
            return getattr(self.eng, k)

        def tick(self):
            out = self.eng.tick()
            assert isinstance(out, WireTick)
            return out.to_dict()

    got = _drive(base, audio)
    got_wire = _drive(_Unwrap(wired), audio)
    assert got_wire == got
    base.close()
    wired.close()


def test_wire_mode_requires_native_serializer():
    model, params = _model()

    class NoPieces:
        def detokenize(self, ids):
            return ""

    with pytest.raises(ValueError, match="wire_responses"):
        StreamingEngine(
            model, params, BLANK, NoPieces(), wire_responses=True,
            max_streams=1,
        )
