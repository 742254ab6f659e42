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


def test_chunk_scanner_segmented():
    """Segmented scan_device (corpora over SEG_LIMIT run as sequential
    launches with exact exit-state carry) equals the single-launch scan
    flag-for-flag."""
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coregex_tpu.dfa.determinize import determinize
    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.ops.dfa_scan import ChunkScanner, DeviceDFA
    from coregex_tpu.syntax.parser import parse

    nfa = compile_nfa(parse(r"\d+\.\d+"), with_captures=False)
    dense = determinize(nfa, anchored=False, break_at_match=False)
    dd = DeviceDFA.from_dense(dense)
    rng = np.random.default_rng(5)
    data = rng.choice(list(b"ab 12.5 x 3.33 99 .7\n"),
                      size=200_000).astype(np.uint8)
    dev = jnp.asarray(data)

    sc1 = ChunkScanner(dd)
    f1, e1, c1, (L1, T1) = sc1.scan_device(dev)
    sc2 = ChunkScanner(dd)
    sc2.SEG_LIMIT = 32_768  # force ~7 segments
    f2, e2, c2, (L2, T2) = sc2.scan_device(dev)
    assert bool(jax.device_get(c1)) and bool(jax.device_get(c2))
    n = len(data)
    a = np.asarray(jax.device_get(f1)).reshape(-1)[:n]
    b = np.asarray(jax.device_get(f2)).reshape(-1)[:n]
    assert np.array_equal(a, b)
    exp = dense.scan_all_ends(data)[:n]
    assert np.array_equal(a, exp)
