"""Terminal rendering stack: verify the emitted ANSI stream against a tiny
terminal emulator (cursor + grid), the ground truth for what a user sees."""

import io
import re

from caiman_asr_tpu.inference.term_stack import Style, TermStack
from caiman_asr_tpu.inference.live_client import TranscriptView


class FakeTerm:
    """Minimal ANSI interpreter for the sequences TermStack emits:
    \\n, \\b, \\033[F (up one line), \\033[<n>C (right n), SGR colors."""

    def __init__(self, cols=80):
        self.cols = cols
        self.lines = [""]
        self.row = 0
        self.col = 0

    def feed(self, s: str):
        i = 0
        while i < len(s):
            c = s[i]
            if c == "\x1b":
                m = re.match(r"\x1b\[([\d;]*)([A-Za-z])", s[i:])
                assert m, f"unparsed escape at {s[i:i+8]!r}"
                n, kind = m.groups()
                if kind == "F":
                    self.row -= 1
                    self.col = 0
                elif kind == "C":
                    self.col += int(n or 1)
                elif kind == "m":
                    pass  # color: ignored for text assertions
                else:
                    raise AssertionError(f"unexpected escape kind {kind}")
                i += m.end()
                continue
            if c == "\n":
                self.row += 1
                self.col = 0
                while len(self.lines) <= self.row:
                    self.lines.append("")
            elif c == "\b":
                self.col -= 1
                assert self.col >= 0
            else:
                line = self.lines[self.row]
                if len(line) < self.col:
                    line = line.ljust(self.col)
                line = line[: self.col] + c + line[self.col + 1 :]
                self.lines[self.row] = line
                self.col += 1
                assert self.col <= self.cols, "wrote past the line width"
            i += 1

    def text(self) -> str:
        return "\n".join(l.rstrip() for l in self.lines).strip()


def render(actions, cols=80):
    buf = io.StringIO()
    st = TermStack(cols=cols, out=buf)
    for act, *args in actions:
        getattr(st, act)(*args)
    term = FakeTerm(cols)
    term.feed(buf.getvalue())
    return term.text()


def test_push_then_pop_restores_screen():
    assert render([("push", "hello world", Style.FINAL)]) == "hello world"
    assert render([("push", "hello", None), ("push", " world", None),
                   ("pop",)]) == "hello"
    assert render([("push", "hello", None), ("pop",)]) == ""


def test_wrapping_and_cross_line_pop():
    out = render(
        [("push", "aaa bbb ccc", None)], cols=8
    )
    assert out == "aaa bbb\nccc"
    # popping an entry whose words wrapped must clear the wrapped line too
    out = render(
        [("push", "aaa bbb", None), ("push", " ccc ddd", None), ("pop",)],
        cols=8,
    )
    assert out == "aaa bbb"


def test_no_leading_space_fragment_wraps_at_edge():
    """A continuing fragment (no leading space — _split_words produces one
    when a partial extends the previous word) pushed near the right edge
    must wrap instead of writing past the line width; the FakeTerm asserts
    col <= cols on every write. Popping must restore the screen exactly."""
    out = render(
        [("push", "abcdef", None), ("push", "ghi", None)], cols=8
    )
    assert out == "abcdef\nghi"
    out = render(
        [("push", "abcdef", None), ("push", "ghi", None), ("pop",)], cols=8
    )
    assert out == "abcdef"


def test_partial_revision_cycle():
    """Finals persist; partials revise in place (the live-client policy)."""
    buf = io.StringIO()
    view = TranscriptView(cols=80, out=buf)
    view.update({"is_provisional": True,
                 "alternatives": [{"transcript": " he"}]})
    view.update({"is_provisional": True,
                 "alternatives": [{"transcript": " hello wo"}]})
    view.update({"is_provisional": False,
                 "alternatives": [{"transcript": " hello world"}]})
    view.update({"is_provisional": True,
                 "alternatives": [{"transcript": " aga"}]})
    term = FakeTerm(80)
    term.feed(buf.getvalue())
    assert term.text() == "hello world aga"
    view.update({"is_provisional": False,
                 "alternatives": [{"transcript": " again"}]})
    term = FakeTerm(80)
    term.feed(buf.getvalue())
    assert term.text() == "hello world again"
