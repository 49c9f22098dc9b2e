"""Streaming beam engine tests: finals grow a common prefix, partials are
provisional, EOS flushes the tail."""

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


@pytest.fixture(scope="module")
def engine():
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    return StreamingEngine(
        model, params, BLANK, Tok(), max_streams=2,
        decoder="beam", beam_width=3,
        native_serializer=False)


def collect(engine, lane, audio):
    engine.push_audio(lane, audio)
    engine.close_stream(lane)
    finals, partials = [], 0
    while lane in engine.streams:
        out = engine.tick()
        if lane in out:
            msgs = out[lane] if isinstance(out[lane], list) else [out[lane]]
            for m in msgs:
                if m.get("eos"):
                    continue
                if m["is_provisional"]:
                    partials += 1
                else:
                    finals.append(m["alternatives"][0]["transcript"])
    return finals, partials


@pytest.mark.slow
def test_beam_streaming_lifecycle(engine):
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=960 * 6) * 0.1).astype(np.float32)
    lane = engine.open_stream()
    finals, partials = collect(engine, lane, audio)
    text = "".join(finals)
    # untrained model babbles; what matters: responses flowed and the lane
    # was recycled cleanly
    assert isinstance(text, str)
    assert not engine.streams


@pytest.mark.slow
def test_beam_finals_are_monotonic_prefix(engine):
    """Running the same audio twice gives identical final streams (the
    engine is deterministic given the dither key sequence restarts only
    per-engine, so compare structure not content across runs)."""
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=960 * 4) * 0.1).astype(np.float32)
    a = engine.open_stream()
    finals_a, _ = collect(engine, a, audio)
    b = engine.open_stream()
    finals_b, _ = collect(engine, b, audio)
    # finals concatenation is order-consistent (prefix property): each final
    # chunk extends, never rewrites
    assert all(isinstance(f, str) for f in finals_a + finals_b)


def _make_engine(**kw):
    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    # make emissions nearly free (one dominant class) so the untrained model
    # emits aggressively — the window-slide path needs dozens of tokens per
    # stream. (Lowering only the blank logit is NOT enough: every hypothesis
    # pays the frame-final blank exactly once per frame, so emitting must be
    # ~zero-cost to beat the stay-silent path.)
    b = params["joint_fc"]["b"]
    params["joint_fc"]["b"] = b.at[2].add(8.0)
    return StreamingEngine(
        model, params, BLANK, Tok(), max_streams=2, decoder="beam",
        beam_width=3, **kw,
        native_serializer=False)


def _run(engine, audio):
    lane = engine.open_stream()
    finals, partials = collect(engine, lane, audio)
    return "".join(finals)


def _packed(toks_full, lens, scores, win):
    """Build the packed per-tick WIRE array _tick_impl produces, from full
    [W, cap] token buffers (simulating the device side): tokens ride as
    int16 pairs bitcast into W*win/2 int32 lanes."""
    W = lens.shape[0]
    base = max(0, int(lens.max()) - win)
    window = toks_full[:, base : base + win].astype(np.int16)
    return np.concatenate(
        [
            window.reshape(1, -1).view(np.int32),
            lens.astype(np.int32)[None, :],
            np.array([[base]], np.int32),
            np.array([[0]], np.int32),  # rebase echo
            scores.astype(np.float32).view(np.int32)[None, :],
        ],
        axis=1,
    )


def _drive_windowed(win, script):
    """Run the host consume path over a scripted device token stream;
    returns the concatenated final transcript."""
    eng = _make_engine(beam_win=win)
    lane = eng.open_stream()
    adv = np.zeros(eng.B, bool)
    adv[lane] = True
    finals = []
    for toks_full, lens, scores in script:
        full = np.zeros((eng.B, _packed(toks_full, lens, scores, win).shape[1]),
                        np.int32)
        full[lane] = _packed(toks_full, lens, scores, win)[0]
        out = {}
        eng._consume([full, adv, None], out)
        for m in out.get(lane, []):
            if not m["is_provisional"]:
                finals.append(m["alternatives"][0]["transcript"])
    return "".join(finals)


def test_window_slide_force_commit_matches_wide_window():
    """A narrow device->host token window must produce the SAME final stream
    as one wide enough to never slide: windowed common-prefix indexing plus
    history force-commit is transparent to the client."""
    W, cap = 3, 64
    S = np.arange(45) % 10  # ground-truth token stream
    script = []
    for t in range(15):
        L = 3 * (t + 1)
        toks = np.zeros((W, cap), np.int64)
        lens = np.full(W, L)
        for w in range(W):
            toks[w, :L] = S[:L]
            if t < 14:  # final tick: full agreement, flushes everything
                if 5 <= t < 10:
                    # agreement stalls at position 10 while length grows:
                    # narrow windows must force-commit from history
                    toks[w, 10:L] = S[10:L] if w == 0 else 100 + w
                else:
                    toks[w, L - 2 : L] = 100 + w  # usual 2-token divergence
        scores = np.array([-1.0, -2.0, -3.0], np.float32)
        script.append((toks, lens, scores))
    wide = _drive_windowed(64, script)
    narrow = _drive_windowed(8, script)
    assert narrow == wide == Tok().detokenize(list(S[:45]))


def test_force_commit_ships_history_when_agreement_stalls():
    """Direct _beam_responses unit test: when the window base advances past
    the committed point (beam agreement stalled out of the window), the gap
    is force-committed from the host-side history snapshot."""
    eng = _make_engine(beam_win=8)
    from caiman_asr_tpu.serving.engine import StreamState

    st = StreamState()
    W, win = 3, 8
    # tick 1: base=0, hyps disagree from position 2 onward
    toks = np.zeros((W, win), np.int64)
    toks[0, :4] = [1, 2, 3, 4]
    toks[1, :4] = [1, 2, 5, 6]
    toks[2, :4] = [1, 2, 7, 8]
    lens = np.array([4, 4, 4])
    scores = np.array([-1.0, -2.0, -3.0], np.float32)
    agree = np.array([1, 1, 0, 0, 1, 1, 1, 1], bool)
    eng._beam_responses(st, toks, lens, scores, 0, True, 0, agree, 4)
    assert st.committed == 2  # common prefix [1, 2]
    # tick 2: best hyp grew to 14 tokens, window now covers [6, 14) —
    # positions 2..5 slid out while still uncommitted
    toks2 = np.tile(np.arange(6, 14), (W, 1))
    lens2 = np.array([14, 14, 14])
    agree2 = np.zeros(win, bool)  # hyps never re-agree
    msgs = eng._beam_responses(
        st, toks2, lens2, scores, 6, True, 0, agree2, 14
    )
    assert st.committed == 6  # force-committed up to the new base
    msgs = msgs if isinstance(msgs, list) else [msgs]
    finals = [m for m in msgs if not m["is_provisional"]]
    # the final must carry the history tokens [2, 6): 3, 4 from tick 1's
    # best-hyp snapshot, then zeros (history default) for never-seen slots
    assert len(finals) == 1
    assert finals[0]["alternatives"][0]["transcript"].startswith(
        Tok().detokenize([3, 4])
    )


@pytest.mark.slow
def test_rebase_shift_equals_preshifted_state():
    """Dispatching a tick with rebase=r must produce the same packed output
    and decoder state as manually pre-shifting the lane's buffers — the
    device-side half of the long-form ring-buffer contract."""
    import jax.numpy as jnp

    eng = _make_engine()
    for _ in range(2):
        eng.open_stream()
    rng = np.random.default_rng(3)
    cap = eng._beam_cap
    # craft a mid-stream beam state: tokens 0..79, lens 80, staggered per hyp
    toks = np.zeros((eng.B, eng.beam_width, cap), np.int32)
    toks[:, :, :80] = np.arange(80) % 11
    st0 = dict(eng.dec_state)
    st0["toks"] = jnp.asarray(toks)
    st0["ts"] = jnp.asarray(toks)
    st0["lens"] = jnp.full((eng.B, eng.beam_width), 80, jnp.int32)
    samples = jnp.asarray(
        (rng.normal(size=(eng.B, eng.hop_samples)) * 0.05 * 32768
         ).astype(np.int16)
    )
    carry = jnp.zeros((eng.B, eng.carry_samples), jnp.int16)
    r = 30

    shifted = dict(st0)
    shifted["toks"] = jnp.concatenate(
        [st0["toks"][:, :, r:],
         jnp.broadcast_to(st0["toks"][:, :, -1:],
                          (eng.B, eng.beam_width, r))], axis=2)
    shifted["ts"] = jnp.copy(shifted["toks"])
    shifted["lens"] = st0["lens"] - r

    def mk_meta(rebase_val, tick):
        m = np.zeros(3 * eng.B + 1, np.int32)
        m[: eng.B] = 1  # adv
        m[eng.B : 2 * eng.B] = rebase_val
        m[-1] = tick
        return jnp.asarray(m)

    out_a, _, _, dec_a = eng._jit_tick(
        eng.params, samples, jnp.copy(carry),
        jax.tree.map(jnp.copy, eng.enc_state),
        jax.tree.map(jnp.copy, st0), eng._init_dec, mk_meta(r, 9))
    out_b, _, _, dec_b = eng._jit_tick(
        eng.params, samples, jnp.copy(carry),
        jax.tree.map(jnp.copy, eng.enc_state),
        shifted, eng._init_dec, mk_meta(0, 9))
    pa, pb = np.array(out_a), np.array(out_b)
    # echo column differs by design (r vs 0); everything else must match
    # (tokens ride as int16 pairs — W*win/2 int32 lanes — see _tick_impl)
    W, win = eng.beam_width, eng._beam_win
    echo_col = W * win // 2 + W + 1
    assert pa[0, echo_col] == r and pb[0, echo_col] == 0
    pa[:, echo_col] = pb[:, echo_col] = 0
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(
        np.asarray(dec_a["lens"]), np.asarray(dec_b["lens"])
    )


def test_long_form_rebase_host_bookkeeping():
    """Host-sim: an echoed rebase shifts committed/history coordinates and
    the final stream stays byte-identical to the never-rebased run."""
    W, cap = 3, 64
    S = np.arange(45) % 10
    base_script = []
    for t in range(15):
        L = 3 * (t + 1)
        toks = np.zeros((W, cap), np.int64)
        lens = np.full(W, L)
        for w in range(W):
            toks[w, :L] = S[:L]
            if t < 14:
                toks[w, L - 2 : L] = 100 + w
        scores = np.array([-1.0, -2.0, -3.0], np.float32)
        base_script.append((toks, lens, scores))

    def drive(with_rebase):
        eng = _make_engine(beam_win=16)
        lane = eng.open_stream()
        adv = np.zeros(eng.B, bool)
        adv[lane] = True
        finals, shift = [], 0
        for t, (toks, lens, scores) in enumerate(base_script):
            r = 0
            if with_rebase and t == 8 and shift == 0:
                # mid-stream rebase by the host's then-committed count: from
                # here on the "device" presents shifted coordinates
                r = shift = eng.streams[lane].committed
            tk = np.roll(toks, -shift, axis=1) if shift else toks
            ln = lens - shift
            pk = _packed(tk, ln, scores, 16)
            pk[0, 3 * 16 // 2 + 3 + 1] = r  # echo column (W*win/2 + W + 1)
            full = np.zeros((eng.B, pk.shape[1]), np.int32)
            full[lane] = pk[0]
            out = {}
            eng._consume([full, adv, None], out)
            for m in out.get(lane, []):
                if not m["is_provisional"]:
                    finals.append(m["alternatives"][0]["transcript"])
        return "".join(finals)

    assert drive(True) == drive(False) == Tok().detokenize(list(S[:45]))


@pytest.mark.slow
def test_pipeline_depth_preserves_final_stream():
    """pipeline_depth delays responses by N ticks but must not change them."""
    rng = np.random.default_rng(8)
    audio = (rng.normal(size=960 * 8) * 0.1).astype(np.float32)
    sync = _run(_make_engine(pipeline_depth=0), audio)
    piped = _run(_make_engine(pipeline_depth=3), audio)
    assert piped == sync


def _msgs(out, lane):
    v = out.get(lane, [])
    return v if isinstance(v, list) else [v]


def _saturating_engine(native=False):
    """Engine whose beam step is replaced by a traceable fake that appends 2
    tokens per advanced frame to every lane with ZERO cross-lane agreement
    (lane w emits only token w+1): the worst case for the commit logic.
    Lane 0 stays best (fixed scores), so the correct final stream is all
    token-1s ('b')."""
    import jax.numpy as jnp
    from jax import lax

    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    eng = StreamingEngine(
        model, params, BLANK, Tok(), max_streams=2,
        decoder="beam", beam_width=3, beam_cap=64, beam_win=16,
        max_symbols_per_step=4, native_serializer=native,
    )
    cap = eng._beam_cap

    def fake_step(params, f_t, state):
        B, W = state["scores"].shape
        st = dict(state)
        frame = st["frame"]
        bix = lax.broadcasted_iota(jnp.int32, (B, W), 0)
        wix = lax.broadcasted_iota(jnp.int32, (B, W), 1)
        tok = wix + 1  # lane w emits token w+1, forever: no agreement
        for _ in range(2):
            pos = jnp.clip(st["lens"], 0, cap - 1)
            st["toks"] = st["toks"].at[bix, wix, pos].set(tok)
            st["ts"] = st["ts"].at[bix, wix, pos].set(
                frame[:, None] * jnp.ones((1, W), jnp.int32)
            )
            st["lens"] = jnp.minimum(st["lens"] + 1, cap)
        st["scores"] = jnp.broadcast_to(
            -jnp.arange(1, W + 1, dtype=jnp.float32)[None, :], (B, W)
        )
        st["frame"] = frame + 1
        return st

    eng._beam_step = fake_step
    return eng


@pytest.mark.slow
def test_cap_saturation_force_commit_preserves_stream():
    """A stream emitting 3x the device buffer cap with ZERO common-prefix
    agreement must still deliver the full best-hypothesis stream: window
    slides force-commit from history, rebase recycles the ring, device lens
    never saturates (STATUS gap: >cap uncommitted tokens)."""
    eng = _saturating_engine()
    cap = eng._beam_cap
    lane = eng.open_stream()
    rng = np.random.default_rng(0)

    n_ticks = 100  # 2 tokens/tick = 200 > 3x cap... with cap=64
    finals = []
    max_len_seen = 0
    for _ in range(n_ticks):
        eng.push_audio(lane, rng.normal(size=eng.hop_samples).astype(np.float32) * 0.05)
        out = eng.tick()
        lens_now = int(np.max(np.asarray(eng.dec_state["lens"])))
        max_len_seen = max(max_len_seen, lens_now)
        assert lens_now < cap, "device beam buffer saturated"
        for m in _msgs(out, lane):
            if not m.get("eos") and not m["is_provisional"]:
                finals.append(m["alternatives"][0]["transcript"])
    eng.close_stream(lane)
    while lane in eng.streams:
        out = eng.tick()
        for m in _msgs(out, lane):
            if not m.get("eos") and not m["is_provisional"]:
                finals.append(m["alternatives"][0]["transcript"])

    text = "".join(finals)
    assert len(text) == 2 * n_ticks, (len(text), max_len_seen)
    assert text == "b" * (2 * n_ticks)  # lane 0's stream, token id 1
    assert max_len_seen > cap // 2  # the ring actually filled up

    # ---- closed-lane flush + reuse under load: a fresh stream on the same
    # lane must start clean (no history/commit leakage)
    lane2 = eng.open_stream()
    # also grab the remaining lane so the engine runs fully loaded, then
    # re-open the original lane slot once it frees up
    lane3 = eng.open_stream()
    assert lane3 is not None and {lane2, lane3} == {0, 1}
    eng.close_stream(lane3)
    while lane3 in eng.streams:
        eng.tick()
    finals2 = []
    for _ in range(30):
        eng.push_audio(lane2, rng.normal(size=eng.hop_samples).astype(np.float32) * 0.05)
        out = eng.tick()
        for m in _msgs(out, lane2):
            if not m.get("eos") and not m["is_provisional"]:
                finals2.append(m["alternatives"][0]["transcript"])
    eng.close_stream(lane2)
    while lane2 in eng.streams:
        out = eng.tick()
        for m in _msgs(out, lane2):
            if not m.get("eos") and not m["is_provisional"]:
                finals2.append(m["alternatives"][0]["transcript"])
    text2 = "".join(finals2)
    assert text2 == "b" * 60, text2[:80]


@pytest.mark.slow
def test_beam_engine_with_lm_fusion(tmp_path):
    """The streaming beam engine accepts the device LM automaton and ticks
    (server --ngram_path path); fusion state rides the beam state."""
    from caiman_asr_tpu.lm.device_table import build_device_tables
    from caiman_asr_tpu.lm.ngram import NGramLM

    pieces = [chr(97 + i) for i in range(N_CLASSES - 1)] + ["<blank>"]
    lines = ["\\data\\", f"ngram 1={len(pieces)}", "", "\\1-grams:"]
    for p in pieces[:-1]:
        lines.append(f"-1.0\t{p}")
    lines += ["-6.0\t<unk>", "", "\\end\\", ""]
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("\n".join(lines))
    tables = build_device_tables(
        NGramLM.load(arpa), pieces, skip_ids=[BLANK]
    )

    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1, enc_post_rnn_layers=1,
            enc_stack_time_factor=2, pred_n_hid=8, pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    eng = StreamingEngine(
        model, params, BLANK, Tok(), max_streams=2, decoder="beam",
        beam_width=3, native_serializer=False,
        ngram_lm=tables, ngram_alpha=0.5,
    )
    lane = eng.open_stream()
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=960 * 3) * 0.1).astype(np.float32)
    finals, partials = collect(eng, lane, audio)
    assert all(isinstance(f, str) for f in finals)
    assert not eng.streams  # lane recycled cleanly


@pytest.mark.slow
def test_keyword_boost_end_to_end():
    """Serving smoke: a heavily-boosted keyword shows up in the served beam
    transcript that did not appear without boosting (device automaton in
    the jitted streaming beam — ref rnnt/beam.py:614-627)."""
    from caiman_asr_tpu.keywords.device_table import build_keyword_tables
    from caiman_asr_tpu.keywords.trie import Keywords

    model = RNNT(
        RNNTModelConfig(
            in_feats=240, enc_n_hid=16, enc_pre_rnn_layers=1,
            enc_post_rnn_layers=1, enc_stack_time_factor=2, pred_n_hid=8,
            pred_rnn_layers=1, joint_n_hid=16,
            enc_dropout=0.0, pred_dropout=0.0, joint_dropout=0.0,
        ),
        N_CLASSES,
    )
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=960 * 6) * 0.1).astype(np.float32)
    pieces = [Tok().id_to_piece(i) for i in range(N_CLASSES)]

    def run(keywords):
        eng = StreamingEngine(
            model, params, BLANK, Tok(), max_streams=1, decoder="beam",
            beam_width=3, native_serializer=False, keywords=keywords,
        )
        lane = eng.open_stream()
        texts = collect(eng, lane, audio)[0]
        eng.close()
        return "".join(texts)

    base = run(None)
    assert base, "base decode emitted nothing; test vacuous"
    boosted = next(
        ch for ch in (chr(97 + i) for i in range(N_CLASSES - 1))
        if ch not in base
    )
    kw = build_keyword_tables(Keywords([(boosted, 50.0)]), pieces)
    assert boosted in run(kw)


def test_beam_engine_with_pruning_thresholds():
    """Engine beam with the production thresholds + final-emission budget
    enabled (round-4): streams drain cleanly, finals remain a monotonic
    prefix stream, and the final-emission state rides resets/rebase
    without leaking across reopened lanes."""
    eng = _make_engine(
        beam_score_thresh=0.4, beam_topk_thresh=1.5,
        beam_final_emission_frames=3,
    )
    assert "committed" in eng.dec_state and "since_final" in eng.dec_state
    rng = np.random.default_rng(5)
    audio = (rng.normal(size=960 * 6) * 0.1).astype(np.float32)
    texts = []
    for _ in range(2):  # second pass: lane reset must zero the watermark
        lane = eng.open_stream()
        finals, partials = collect(eng, lane, audio)
        texts.append("".join(finals))
        assert not eng.streams
    # deterministic engine + identical audio -> identical transcript after
    # a lane reset (the committed/since_final state was re-zeroed)
    assert texts[0] == texts[1]
    eng.close()
