"""Nullable-pattern span extraction via the non-empty-core factorization
(meta/nullable.py): FindAll(R) = FindAll(core) + empty fill-in, with the
exact host walk (Go allMatches, regex.go:790-850 rules) as oracle."""

import numpy as np
import pytest

from coregex_tpu.meta.engine import Engine
from coregex_tpu.meta.nullable import (decompose, rune_boundary_mask)
from coregex_tpu.syntax.parser import parse
from coregex_tpu.utils.utf8 import go_rune_width

# (pattern, expected engine strategy)
ROUTES = [
    (r"\w*", "nullable_core"),
    (r"a*", "nullable_core"),
    (r"(abc)*", "nullable_core"),
    (r"(?:ab|cd)*", "nullable_core"),
    (r"(foo)?", "nullable_core"),
    (r"(a|b*)", "nullable_core"),
    (r"(a?)*", "nullable_core"),
    (r"a{0,3}", "nullable_core"),
    (r"(ab|a)*", "nullable_core"),
    (r"(a|)", "nullable_core"),
    (r"[xy]*", "nullable_core"),
    (r"x*?", "all_empty"),
    (r"(|a)", "all_empty"),
    (r"(?:)", "all_empty"),
    (r"x*y*", "host"),        # multi-part nullable concat
    (r"(a*)(b*)", "host"),
    (r"b*\b", "host"),        # look on the nullable path
    (r"(?m)^a*", "host"),
    (r"(\b)?", "host"),       # look-guarded empty
]


def _texts():
    rng = np.random.default_rng(23)
    texts = [b"", b"a", b"ab cd  ef", b"aaab", b"abcabc xabc abcab",
             b"abcdab cdxab", b"xfoofoo yfoo", b"aabbba", b"aab aba",
             b"aaaaa b", b"foo", b"xxy", bytes(3) + b"abc"]
    for _ in range(30):
        k = int(rng.integers(0, 50))
        texts.append(bytes(rng.choice(list(b"abcdfox y"), size=k)))
    return texts


def _utf8_texts():
    rng = np.random.default_rng(29)
    texts = ["héllo wörld", "abécd", "☃a☃", "日本語abc",
             "a\U0001F600b"]
    out = [t.encode() for t in texts]
    # byte soup: invalid sequences exercise the width-1 rules
    for _ in range(20):
        k = int(rng.integers(1, 40))
        out.append(bytes(rng.integers(0, 256, size=k, dtype=np.uint8)))
    return out


@pytest.mark.parametrize("pat,want", ROUTES)
def test_strategy_routing(pat, want):
    e = Engine.compile(pat)
    assert e.strategy == want, e.strategy_reason


@pytest.mark.parametrize("pat", [p for p, w in ROUTES if w != "host"])
def test_span_parity_ascii(pat):
    dev = Engine.compile(pat)
    dev.batch_threshold = 0
    host = Engine.compile(pat)
    host.batch_threshold = 1 << 60
    for t in _texts():
        arr = np.frombuffer(t, dtype=np.uint8)
        assert dev._all_spans(arr) == host._all_spans(arr), (pat, t)


@pytest.mark.parametrize("pat", [r"\w*", r"a*", r"(ab)*", r"x*?",
                                 r"(foo)?"])
def test_span_parity_utf8(pat):
    """Empty-match advance is RUNE-width in Go; the boundary mask must
    reproduce it on valid and invalid UTF-8 alike."""
    dev = Engine.compile(pat)
    dev.batch_threshold = 0
    host = Engine.compile(pat)
    host.batch_threshold = 1 << 60
    for t in _utf8_texts():
        arr = np.frombuffer(t, dtype=np.uint8)
        assert dev._all_spans(arr) == host._all_spans(arr), (pat, t)


def test_rune_boundary_mask_vs_go_walk():
    """Vectorized mask == the positions a Go width-walk visits, for
    every walk entry point that is itself a mask position."""
    rng = np.random.default_rng(31)
    cases = [b"", b"abc", "héllo".encode(), b"\xc3\xc3", b"a\x80b",
             b"\xe1\x80", b"\xf0\x90\x80\x80x", b"\xed\xa0\x80",
             b"\xc0\xaf", b"\xf5\x80\x80\x80"]
    for _ in range(40):
        k = int(rng.integers(0, 60))
        cases.append(bytes(rng.integers(0, 256, size=k, dtype=np.uint8)))
    for t in cases:
        arr = np.frombuffer(t, dtype=np.uint8)
        mask = rune_boundary_mask(arr)
        n = len(arr)
        walked = np.zeros(n + 1, dtype=bool)
        pos = 0
        while pos <= n:
            walked[pos] = True
            if pos == n:
                break
            pos += go_rune_width(arr, pos)
        assert (mask == walked).all(), t


def test_decompose_shapes():
    from coregex_tpu.syntax.ast import Op
    # star -> plus of the body
    d = decompose(parse(r"(?:ab)*").ast)
    assert d.core is not None and d.core.op == Op.PLUS
    # quest -> body
    d = decompose(parse(r"(?:foo)?").ast)
    assert d.core is not None and d.core.op != Op.QUEST
    # alternation cut at first nullable branch
    d = decompose(parse(r"(a|b*|c)").ast)
    assert d.core is not None
    # priorities: alt core keeps a then b+
    assert d.core.op == Op.ALTERNATE and len(d.core.subs) == 2
    # lazy star: all empty
    assert decompose(parse(r"a*?").ast).core is None
    # counted {0,k} -> {1,k}
    d = decompose(parse(r"(?:ab){0,4}").ast)
    assert d.core is not None and d.core.min == 1 and d.core.max == 4
    # out of scope
    assert decompose(parse(r"a*b*").ast) is None
    assert decompose(parse(r"(\b)?").ast) is None


def test_count_cross_check_device_paths():
    """Two independent device implementations must agree: the nullable
    count transducer vs the span factorization (and the host walk)."""
    rng = np.random.default_rng(37)
    corpus = bytes(rng.choice(list(b"abfo xy\n"), size=120_000))
    arr = np.frombuffer(corpus, dtype=np.uint8)
    for pat in [r"\w*", r"(ab)*", r"(foo)?", r"a*"]:
        e = Engine.compile(pat)
        e.batch_threshold = 0
        h = Engine.compile(pat)
        h.batch_threshold = 1 << 60
        be = e.batch_engine()
        spans = be.find_all_spans(arr, -1)
        want = h._all_spans(arr)
        assert [(int(s), int(x)) for s, x in spans] == want, pat
        assert e.count(corpus) == len(want), pat


def test_longest_mode_keeps_host():
    """The factorization's dead-branch cut is leftmost-first only."""
    e = Engine.compile(r"(a|b*)", longest=True)
    assert e.strategy == "host"


def test_empty_corpus():
    e = Engine.compile(r"a*")
    e.batch_threshold = 0
    assert e.find_all_index(b"") == [(0, 0)]
    assert e.count(b"") == 1
    assert e.is_match(b"")


def test_nullable_device_builder_class_core():
    """find_all_spans_device for [class]+ cores: aligned mask-pair merge
    (runs + empties), exact vs the host walk."""
    import jax
    rng = np.random.default_rng(5)
    corpus = bytes(rng.choice(list(b"ab cd_12 xy\n  z"), size=150_000))
    arr = np.frombuffer(corpus, dtype=np.uint8)
    for pat in (r"\w*", r"\d*", r"[a-z]*"):
        e = Engine.compile(pat)
        e.batch_threshold = 0
        h = Engine.compile(pat)
        h.batch_threshold = 1 << 60
        r = e.batch_engine().find_all_spans_device(arr)
        assert r is not None, pat
        sd, cnt = r
        got = [(int(a), int(b))
               for a, b in np.asarray(jax.device_get(sd[:cnt]))]
        assert got == h._all_spans(arr), pat
    # UTF-8 corpora route to the general device fill (round 5) and
    # stay exact (rune-boundary empties)
    u = "héllo wörld aé ".encode() * 500
    au = np.frombuffer(u, dtype=np.uint8)
    e = Engine.compile(r"\w*")
    e.batch_threshold = 0
    h = Engine.compile(r"\w*")
    h.batch_threshold = 1 << 60
    r = e.batch_engine().find_all_spans_device(au)
    if r is not None:
        sd, cnt = r
        got = [(int(a), int(b))
               for a, b in np.asarray(jax.device_get(sd[:cnt]))]
        assert got == h._all_spans(au)
    assert e._all_spans(au) == h._all_spans(au)


def test_nullable_device_builder_general_cores():
    """General-core nullable device extraction (round 5, verdict item
    6): core spans from the core engine's own device family + device
    fill (boundaries - coverage - ends), vs the exact host walk —
    ASCII and UTF-8 corpora, including invalid sequences."""
    import jax
    rng = np.random.default_rng(11)
    ascii_corpus = bytes(rng.choice(
        list(b"abc fo id_1 xy\n z"), size=120_000))
    utf8_corpus = ("héllo abc wörld foo ☃abc ".encode() * 3000)
    soup = bytes(rng.integers(0, 256, size=50_000, dtype=np.uint8))
    for pat in (r"(abc)*", r"(?:ab|cd)*", r"(foo)?", r"a{0,3}",
                r"(ab|a)*"):
        for corpus in (ascii_corpus, utf8_corpus, soup):
            arr = np.frombuffer(corpus, dtype=np.uint8)
            e = Engine.compile(pat)
            e.batch_threshold = 0
            h = Engine.compile(pat)
            h.batch_threshold = 1 << 60
            r = e.batch_engine().find_all_spans_device(arr)
            exp = h._all_spans(arr)
            if r is not None:
                sd, cnt = r
                got = [(int(a), int(b))
                       for a, b in np.asarray(jax.device_get(sd[:cnt]))]
                assert got == exp, (pat, len(corpus))
            assert e._all_spans(arr) == exp, (pat, len(corpus))
