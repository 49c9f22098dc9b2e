"""Device n-gram automaton == Python dict scorer, along random walks."""

import numpy as np
import pytest

from caiman_asr_tpu.lm.device_table import build_device_tables
from caiman_asr_tpu.lm.ngram import NGramLM

ARPA = """\
\\data\\
ngram 1=6
ngram 2=6
ngram 3=3

\\1-grams:
-1.0\t<s>\t-0.30103
-1.2\t</s>
-0.5\ta\t-0.30103
-0.7\tb\t-0.15
-0.9\tc
-2.0\t<unk>

\\2-grams:
-0.3\t<s> a\t-0.2
-0.4\ta b\t-0.1
-0.6\tb a\t-0.25
-0.8\ta a
-0.9\tb c
-1.1\tc a

\\3-grams:
-0.2\t<s> a b
-0.35\ta b a
-0.5\tb a b

\\end\\
"""


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "ngram.arpa"
    p.write_text(ARPA)
    return NGramLM.load(p)


PIECES = ["a", "b", "c", "zzz", "<blank>"]  # zzz: OOV piece; last: skip col
SKIP = [4]


@pytest.fixture(scope="module")
def tables(lm):
    return build_device_tables(lm, PIECES, skip_ids=SKIP)


def test_walk_equivalence(lm, tables):
    """Score + state transitions match NGramLM.score token by token on
    random walks (including OOV pieces and backoff chains)."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        py_state = lm.initial_state()
        dev_state = tables.init_state
        for _ in range(12):
            k = int(rng.integers(0, 4))  # never the skip column here
            want, py_state = lm.score(PIECES[k], py_state)
            got = float(tables.score[dev_state, k])
            assert got == pytest.approx(want, abs=1e-5), (py_state, k)
            dev_state = int(tables.next_state[dev_state, k])


def test_skip_column(tables):
    """Skip tokens score 0 and leave the automaton state unchanged."""
    for s in range(tables.n_states):
        assert tables.score[s, 4] == 0.0
        assert tables.next_state[s, 4] == s


def test_init_state_is_bos(lm, tables):
    # scoring 'a' from BOS must use the <s> a bigram, not the unigram
    want, _ = lm.score("a", lm.initial_state())
    assert float(tables.score[tables.init_state, 0]) == pytest.approx(
        want, abs=1e-5
    )
    assert want != pytest.approx(lm.probs[("a",)], abs=1e-5)
