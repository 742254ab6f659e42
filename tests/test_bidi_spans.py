"""Bidirectional event-stream extraction (round 5): device find_all for
the PREFIX_RUN / PREFIX_SET / FULL_SCAN families.

Forward pass: the span-event transducer scan (ops/span_scan.py) yields
match ENDS as last-flags of first-flag-delimited groups.  Reverse pass:
a pre-reset FlagResetScanner over the flipped corpus with resets at the
reversed ends yields each match's leftmost START.  Reference analogue:
the 2-pass bidirectional FindAll fast path,
/root/reference/meta/findall.go:216-239.
"""

import random
import re

import numpy as np
import pytest

import coregex_tpu as ct


def _corpus(seed, n):
    random.seed(seed)
    words = [b"ip 10.0.0.1", b"version 1.22.3", b"error", b"GET /x",
             b"lorem", b"9.8.7.6543", b"a.b.c", b"12.34.56.78",
             b"xc ab", b"aab", b"1.2.3.4.5", b"w03 w44 w69",
             b"aa12x", b"abcde", b"cdabe"]
    out, ln = [], 0
    while ln < n:
        w = random.choice(words)
        out.append(w)
        ln += len(w) + 1
    return b" ".join(out)[:n]


BIG_ALT = "|".join("w%02d" % i for i in range(70))

PATTERNS = [
    r"\d+\.\d+\.\d+\.\d+",
    r"\d+.\d+.\d+",
    BIG_ALT,
    r"[a-f]+\d+x",
    r"(ab|cd)+e",
]


def _device_spans(be, data):
    import jax
    r = be.find_all_spans_device(data)
    if r is None:
        return None
    spans_dev, cnt = r
    return [tuple(int(v) for v in row)
            for row in np.asarray(jax.device_get(spans_dev))[:cnt]]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_bidi_device_spans_match_re(pattern):
    eng = ct.compile(pattern)
    be = eng.batch_engine()
    for seed, n in ((1, 2000), (2, 30000), (3, 257)):
        t = _corpus(seed, n)
        arr = np.frombuffer(t, dtype=np.uint8)
        exp = [m.span() for m in re.finditer(pattern.encode(), t)]
        got = _device_spans(be, arr)
        assert got is not None, (pattern, n)
        assert got == exp, (pattern, n)


def test_bidi_engine_find_all_index():
    for pattern in (r"\d+\.\d+\.\d+\.\d+", r"\d+.\d+.\d+"):
        eng = ct.compile(pattern)
        t = _corpus(7, 20000)
        got = [tuple(g) for g in eng.find_all_index(t)]
        exp = [m.span() for m in re.finditer(pattern.encode(), t)]
        assert got == exp


def test_bidi_warm_defer_path():
    import jax
    eng = ct.compile(r"\d+\.\d+\.\d+\.\d+")
    be = eng.batch_engine()
    t = _corpus(4, 8192)
    arr = np.frombuffer(t, dtype=np.uint8)
    exp = [m.span() for m in re.finditer(rb"\d+\.\d+\.\d+\.\d+", t)]
    r1 = be.find_all_spans_device(arr, defer_ok=True)
    assert r1 is not None
    # second call hits the fingerprint cache: count may be a device
    # scalar and ok a deferred device bool
    r2 = be.find_all_spans_device(arr, defer_ok=True)
    spans, cnt, ok = r2
    cnt_h = int(jax.device_get(cnt)) if not isinstance(cnt, int) else cnt
    assert ok is None or bool(jax.device_get(ok))
    assert cnt_h == len(exp)
    got = [tuple(int(v) for v in row)
           for row in np.asarray(jax.device_get(spans))[:cnt_h]]
    assert got == exp


def test_bidi_empty_and_tiny():
    eng = ct.compile(r"\d+\.\d+\.\d+\.\d+")
    be = eng.batch_engine()
    for t in (b"1.2.3.4", b"x", b"1.2.3.4.5.6.7.8"):
        arr = np.frombuffer(t, dtype=np.uint8)
        exp = [m.span() for m in re.finditer(rb"\d+\.\d+\.\d+\.\d+", t)]
        got = _device_spans(be, arr)
        if got is not None:
            assert got == exp, t


def test_bidi_match_at_eoi():
    # EOI_EXTEND / EOI_EXTRA tails: matches ending exactly at n
    for pattern, text in (
            (r"\d+\.\d+\.\d+\.\d+", b"a 1.2.3.4 b 10.20.30.40"),
            (r"\d+.\d+.\d+", b"x 1.2.3"),
            (r"error", b"no error")):
        eng = ct.compile(pattern)
        be = eng.batch_engine()
        arr = np.frombuffer(text, dtype=np.uint8)
        exp = [m.span() for m in re.finditer(pattern.encode(), text)]
        got = _device_spans(be, arr)
        if got is not None:
            assert got == exp, (pattern, text)
