"""DFA layer tests: determinizer semantics vs the PikeVM, window-edge
contexts, and overflow fallback (analogue of the reference's
dfa/lazy/*_test.go cross-engine matrices)."""

import numpy as np
import pytest

from coregex_tpu.dfa import search as dfasearch
from coregex_tpu.dfa.determinize import DFAOverflow, determinize
from coregex_tpu.engines.pikevm import PikeVM
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

PATTERNS = [
    r"abc", r"a|ab", r"ab|a", r"a+", r"a*?", r"\d+\.\d+",
    r"\bfoo\b", r"(?m)^b.*", r"x$", r"a$|b", r"[a-c]+[0-9]?",
    r"(?i)hex", r"a.*c", r"colou?r", r"\B\d\B", r"^start",
]

TEXTS = [
    b"", b"a", b"ab", b"abc", b"xxabcyy", b"aaa", b"12.5 and 3.77",
    b"a foo bar", b"afoob", b"l1\nb222\nl3", b"x", b"ax\nb", b"abcab0",
    b"HEX hex", b"axxxc", b"colour color", b"a12b", b"start here",
    b"not at start here",
]


def build(pattern):
    parsed = parse(pattern)
    nfa = compile_nfa(parsed, with_captures=True)
    nfa_nc = compile_nfa(parsed, with_captures=False)
    nfa_rev = compile_nfa(parsed, reverse=True)
    fwd = determinize(nfa_nc, anchored=False, break_at_match=True)
    rev = determinize(nfa_rev, anchored=True, break_at_match=False,
                      reverse=True)
    return PikeVM(nfa), fwd, rev


@pytest.mark.parametrize("pattern", PATTERNS)
def test_dfa_matches_pikevm_at_every_position(pattern):
    vm, fwd, rev = build(pattern)
    for text in TEXTS:
        arr = np.frombuffer(text, dtype=np.uint8)
        for pos in range(len(text) + 1):
            exp = vm.find(text, pos)
            got = dfasearch.find_span(fwd, rev, arr, pos)
            assert got == exp, (
                f"p={pattern!r} t={text!r} pos={pos}: got {got} want {exp}")


@pytest.mark.parametrize("pattern", [r"abc", r"\d+", r"\bword\b"])
def test_earliest_end_consistency(pattern):
    vm, fwd, rev = build(pattern)
    for text in TEXTS:
        arr = np.frombuffer(text, dtype=np.uint8)
        e = dfasearch.earliest_end(fwd, arr, 0)
        assert (e >= 0) == vm.is_match(text)


def test_overflow_raises():
    parsed = parse(r"(?i)[\w]{40}x{30}[abc]{25}")
    nfa = compile_nfa(parsed, with_captures=False)
    with pytest.raises(DFAOverflow):
        determinize(nfa, state_limit=10)


def test_byte_classes_compact():
    parsed = parse(r"[a-z]+\d")
    nfa = compile_nfa(parsed, with_captures=False)
    bc = nfa.byte_classes()
    # classes: a-z, 0-9, everything else -> 3 classes
    assert bc.num_classes <= 4
    assert bc[ord("a")] == bc[ord("z")]
    assert bc[ord("0")] == bc[ord("9")]
    assert bc[ord("a")] != bc[ord("0")]


def test_window_edge_contexts():
    """Bounded reverse scans must resolve \\b at the window edge using the
    byte before the window (the match_eoi[S,4] context machinery)."""
    vm, fwd, rev = build(r"\bfoo")
    text = b"xfoo foo"
    arr = np.frombuffer(text, dtype=np.uint8)
    # search from pos=1: '\bfoo' must NOT match at 1 because 'x' precedes
    exp = vm.find(text, 1)
    got = dfasearch.find_span(fwd, rev, arr, 1)
    assert got == exp == (5, 8)
