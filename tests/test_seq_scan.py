"""Predicate sequential-scan kernels: mode semantics vs the host engine,
and the Mosaic kernel (interpret mode) vs the host references."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from coregex_tpu.meta.engine import Engine
from coregex_tpu.ops.count_scan import plan_geometry
from coregex_tpu.ops.seq_scan import (MODE_LINE, MODE_MULTI, SeqScanner,
                                      line_count_host, multi_count_host)


def _rand_text(rng, alphabet, n):
    return bytes(rng.choice(alphabet) for _ in range(n))


def test_multi_host_semantics_match_engine():
    cases = [
        (["error"], r"error"),
        (["aa"], r"aa"),                      # self-overlapping
        (["a", "ab"], r"a|ab"),               # priority: first alt wins
        (["ab", "a"], r"ab|a"),
        (["alpha", "beta", "alp"], r"alpha|beta|alp"),
        (["abc", "bcd", "cde"], r"abc|bcd|cde"),
    ]
    rng = random.Random(11)
    for lits, pattern in cases:
        eng = Engine.compile(pattern)
        eng.batch_threshold = 1 << 60
        nds = [l.encode() for l in lits]
        for _ in range(150):
            t = _rand_text(rng, b"abcdeal ", rng.randrange(0, 40))
            exp = len(eng._all_spans(np.frombuffer(t, dtype=np.uint8)))
            assert multi_count_host(t, nds) == exp, (pattern, t)


def test_line_host_semantics_match_engine():
    cases = [
        (b"keyword", b"", False, r".*keyword.*"),
        (b".txt", b"", False, r".*\.txt"),
        (b"foo", b"", False, r"foo.*"),
        (b".php", b"/", True, r"(?m)^/.*\.php"),
        (b"xy", b"ab", True, r"(?m)^ab.*xy"),
    ]
    rng = random.Random(12)
    alphabet = b"keyword.tx/phfoaby\n "
    for needle, prefix, anchored, pattern in cases:
        eng = Engine.compile(pattern)
        eng.batch_threshold = 1 << 60
        for _ in range(200):
            t = _rand_text(rng, alphabet, rng.randrange(0, 60))
            exp = len(eng._all_spans(np.frombuffer(t, dtype=np.uint8)))
            got = line_count_host(t, needle, prefix, anchored)
            assert got == exp, (pattern, t)


def test_line_set_host_semantics_match_engine():
    """Literal-set line shapes (ReverseSuffixSet analogue)."""
    cases = [
        ([b".txt", b".log"], b"", False, r".*\.(txt|log)"),
        ([b"foo", b"bar"], b"", False, r"(foo|bar).*"),
        ([b".php", b".html"], b"/", True, r"(?m)^/.*\.(php|html)"),
    ]
    rng = random.Random(21)
    alphabet = b"fobar.txtlogphml/\n "
    for needles, prefix, anchored, pattern in cases:
        eng = Engine.compile(pattern)
        eng.batch_threshold = 1 << 60
        for _ in range(200):
            t = _rand_text(rng, alphabet, rng.randrange(0, 60))
            exp = len(eng._all_spans(np.frombuffer(t, dtype=np.uint8)))
            got = line_count_host(t, needles, prefix, anchored)
            assert got == exp, (pattern, t)


def test_pallas_interpret_line_set():
    nds = [b".txt", b".log"]
    sc = SeqScanner(MODE_LINE, nds, interpret=True)
    data = (b"a.txt b\nplain\nx.log.txt\nc.log\n" * 80)
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    got = sc.count(dev, geometry=plan_geometry(len(data), lc=128))
    assert got == line_count_host(data, nds, b"", False)


def test_pallas_interpret_multi():
    nds = [b"ab", b"a", b"ba"]
    sc = SeqScanner(MODE_MULTI, nds, interpret=True)
    rng = random.Random(3)
    data = _rand_text(rng, b"ab ", 3000)
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    got = sc.count(dev, geometry=plan_geometry(len(data), lc=128))
    assert got == multi_count_host(data, nds)


def test_pallas_interpret_line_anchored():
    sc = SeqScanner(MODE_LINE, [b".php"], prefix=b"/", anchored=True,
                    interpret=True)
    rng = random.Random(4)
    data = _rand_text(rng, b"/.phpx\n", 3000)
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    got = sc.count(dev, geometry=plan_geometry(len(data), lc=128))
    assert got == line_count_host(data, b".php", b"/", True)


def test_pallas_interpret_line_plain():
    sc = SeqScanner(MODE_LINE, [b"keyword"], interpret=True)
    data = (b"x keyword y\nno match here\nkeyword keyword\n" * 70)
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    got = sc.count(dev, geometry=plan_geometry(len(data), lc=128))
    assert got == line_count_host(data, b"keyword", b"", False)


def test_supported_gates():
    assert SeqScanner.supported([b"abc"])
    assert not SeqScanner.supported([b"a\x00b"])
    assert SeqScanner.supported([b"a\nb"])  # fine for MODE_MULTI
    assert not SeqScanner.supported([b"a\nb"], line_mode=True)
    assert not SeqScanner.supported([b"x" * 20])
    assert not SeqScanner.supported([b""])
