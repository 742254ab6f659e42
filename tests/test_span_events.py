"""Span-event tables of the count transducer (round 5).

build_count_dfa now emits per-transition FLAG / FIRST-FLAG event bits
and an EOI kind, valid when `spans_simple`: flags partition into
consecutive per-match groups (a first-flag opens a group), each
committed match's end is its group's last flag, and the EOI kind at the
scan's final state resolves a match ending exactly at n.  Together with
a reverse-anchored reset scan for starts this is the device find_all
engine for the PREFIX_RUN / FULL_SCAN families (ops/span_scan.py);
reference analogue: the 2-pass bidirectional FindAll fast path,
/root/reference/meta/findall.go:216-239.
"""

import random
import re

import numpy as np
import pytest

from coregex_tpu.dfa.countdfa import build_count_dfa
from coregex_tpu.dfa.dense import CTX_SOT, DEAD
from coregex_tpu.dfa.determinize import determinize
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

PATTERNS = [
    r"\d+\.\d+\.\d+\.\d+",
    r"\d+.\d+.\d+",
    r"error",
    r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH",
    r"[a-z]+ing",
    r"ab|xc",
    r"foo\d*bar",
    r"a+b+",
    r"https?://[a-z.]+",
    r"\d+[kM]?B",
]


def _texts():
    random.seed(11)
    alpha = b"abx.c123 G\nPOSTERing+kMB/:htps"
    texts = [b"", b"5", b"1.2.3", b"12.34.56.78",
             b"1.2.3.4.5 12345678 99.88.77", b"error", b"xerrorerror"]
    for _ in range(150):
        texts.append(bytes(random.choice(alpha)
                           for _ in range(random.randrange(0, 90))))
    return texts


def _build(pattern):
    ast = parse(pattern)
    u = determinize(compile_nfa(ast, with_captures=False),
                    anchored=False, break_at_match=True)
    cd = build_count_dfa(u)
    assert cd is not None
    return ast, cd.minimized()


def rev_starts_host(rev, data, ends):
    """Sequential twin of the device reverse reset scan: scan the
    REVERSED corpus through the anchored reverse DFA, teleporting to the
    start state at each reversed match end; the flag at a position is
    evaluated on the PRE-reset state (so a start exactly at the previous
    match's end is visible); each interval's match start is its LAST
    flag (furthest back == leftmost)."""
    n = len(data)
    r = data[::-1]
    resets = {n - e for e in ends}
    cls, delta, match = rev.classes, rev.delta, rev.match_on
    start_state = int(rev.starts[CTX_SOT])
    s = DEAD
    cur = None
    lastf = {}
    for q in range(n + 1):
        c = int(cls[r[q]]) if q < n else int(cls[0])
        if match[s, c] and cur is not None:
            lastf[cur] = q
        if q in resets:
            s = start_state
            cur = q
        if q < n:
            s = int(delta[s, c])
    out = []
    for e in sorted(ends):
        q = n - e
        if q not in lastf:
            return None
        out.append((n - lastf[q], e))
    return out


@pytest.mark.parametrize("pattern", PATTERNS)
def test_span_ends_match_re(pattern):
    _, cd = _build(pattern)
    assert cd.spans_simple, pattern
    for t in _texts():
        arr = np.frombuffer(t, dtype=np.uint8)
        exp = [m.span()[1] for m in re.finditer(pattern.encode(), t)]
        assert cd.count_scan(arr) == len(exp)
        assert cd.span_ends_scan(arr) == exp, (pattern, t)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bidirectional_spans_match_re(pattern):
    ast, cd = _build(pattern)
    rev = determinize(compile_nfa(ast, reverse=True), anchored=True,
                      break_at_match=False, reverse=True)
    for t in _texts():
        arr = np.frombuffer(t, dtype=np.uint8)
        exp = [m.span() for m in re.finditer(pattern.encode(), t)]
        ends = cd.span_ends_scan(arr)
        assert ends == [e for _, e in exp]
        assert rev_starts_host(rev, arr, ends) == exp, (pattern, t)


def test_minimize_preserves_span_tables():
    _, cd = _build(r"\d+\.\d+\.\d+\.\d+")
    assert cd.flag_on is not None and cd.first_on is not None
    assert cd.eoi_kind is not None


def test_nullable_has_no_span_tables():
    from coregex_tpu.dfa.countdfa import build_count_dfa_nullable
    from coregex_tpu.dfa.determinize import determinize_py
    ast = parse(r"\d*")
    u = determinize_py(compile_nfa(ast, with_captures=False),
                       anchored=False, break_at_match=True,
                       track_empty=True)
    cd = build_count_dfa_nullable(u)
    assert cd is not None and not cd.spans_simple


def test_position_tables_beyond_2pow30():
    """Sentinel regression (round-5 bench): next/last-position tables
    must be exact for positions past 2^30 — at the 1.6 GB corpus
    bucket (2^26 words) a 2^30 'no position' sentinel undercut real
    positions and silently corrupted line EOLs and reset drops."""
    import jax.numpy as jnp
    from coregex_tpu.ops.span_chain import (_word_lastpos_table,
                                            _word_nextpos_table)
    nwb = 1 << 26
    bits = np.zeros(nwb, np.int64)
    pos = [37, 2 ** 30 + 12345, 1_500_000_000, 1_610_000_000]
    for p in pos:
        bits[p >> 5] |= 1 << (p & 31)
    w = jnp.asarray(((bits + 2 ** 31) % 2 ** 32 - 2 ** 31)
                    .astype(np.int32))
    nxt = np.asarray(_word_nextpos_table(w, nwb))
    lst = np.asarray(_word_lastpos_table(w, nwb))
    for p in pos[:-1]:
        wi = p >> 5
        want = min(q for q in pos if q > (wi + 1) * 32 - 1)
        assert nxt[wi] == want
    assert nxt[pos[-1] >> 5] == 2 ** 31 - 1
    assert lst[pos[1] >> 5] == 37
