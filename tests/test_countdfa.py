"""CountDFA (FindAll-count transducer) — host-build + oracle parity.

The transducer must reproduce the exact non-overlapping leftmost-first
match count of the host engine (itself differentially tested against the
Go-semantics oracle) on every input.
"""

import random

import numpy as np
import pytest

from coregex_tpu.dfa.countdfa import build_count_dfa
from coregex_tpu.dfa.determinize import determinize
from coregex_tpu.meta.engine import Engine
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

ALT8 = "alpha|beta|gamma|delta|error|warning|timeout|closed"

PATTERNS = [
    r"\d+\.\d+\.\d+\.\d+",
    r"(?m)^/.*\.php",
    r".*\.txt",
    r".*keyword.*",
    r"[\w]+",
    r"error",
    ALT8,
    r"\w+@\w+\.\w+",
    r"\bword\b",
    r"a+b",
    r"(foo|bar)baz",
    r"[a-c]{2,4}",
    r"x.{0,3}y",
    r"(?i)AbC",
    r"a$",
    r"^a",
    r"(?m)^ab$",
]

ALPHABET = b"ab.0123456789 keyword/xyzphtw\nerror@AcC$"


def _build(pattern):
    nfa = compile_nfa(parse(pattern), with_captures=False)
    u = determinize(nfa, anchored=False, break_at_match=True)
    return build_count_dfa(u)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_count_matches_host_engine(pattern):
    cd = _build(pattern)
    assert cd is not None, f"count DFA failed to build for {pattern!r}"
    eng = Engine.compile(pattern)
    eng.batch_threshold = 1 << 60  # host path only
    rng = random.Random(hash(pattern) & 0xFFFF)
    for trial in range(200):
        n = rng.randrange(0, 48)
        data = bytes(rng.choice(ALPHABET) for _ in range(n))
        arr = np.frombuffer(data, dtype=np.uint8)
        got = cd.count_scan(arr)
        exp = len(eng._all_spans(arr))
        assert got == exp, (pattern, data)


def test_count_structured_texts():
    texts = [
        b"",
        b"1.2.3.4",
        b"1.2.3.4.5.6.7.8",
        b"192.168.0.1 and 10.0.0.255, also 1.2.3",
        b"/index.php\n/foo.php stuff\nbar.php\n/x.php",
        b"a.txt b.txt\nnothing\nc.txt",
        b"keyword here keyword\nno match\nkeyword",
        b"word words sword word",
        b"aaaab aab ab b",
    ]
    for pattern in PATTERNS:
        cd = _build(pattern)
        if cd is None:
            continue
        eng = Engine.compile(pattern)
        eng.batch_threshold = 1 << 60
        for t in texts:
            arr = np.frombuffer(t, dtype=np.uint8)
            assert cd.count_scan(arr) == len(eng._all_spans(arr)), \
                (pattern, t)


def test_chain_explosion_returns_none():
    # `a.*b|a` grows one frame per consecutive `a`: must refuse, not hang
    cd = _build(r"a.*b|a")
    assert cd is None


def test_product_sizes_stay_small():
    for pattern, cap in [(r"\d+\.\d+\.\d+\.\d+", 64), (r"[\w]+", 32),
                         (r".*keyword.*", 128)]:
        cd = _build(pattern)
        assert cd is not None and cd.num_states <= cap, pattern


def test_minimized_equivalence():
    """Mealy minimization preserves exact emission behavior (random
    differential) and strictly shrinks typical tables."""
    import numpy as np

    from coregex_tpu.dfa.countdfa import (build_count_dfa,
                                          build_count_dfa_nullable)
    from coregex_tpu.dfa.determinize import determinize, determinize_py
    from coregex_tpu.meta import literal as litmod
    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.syntax.parser import parse

    rng = np.random.default_rng(9)
    alphabet = np.frombuffer(b"abcdefxyz@.:/ 0123wr+-", dtype=np.uint8)
    shrunk = 0
    for pat in [r"[\w.+-]+@[\w.-]+\.[\w.-]+", r"(ab|cd)+x", r"a*b",
                r"(x|yy)*z", r"[a-f]{2,5}9", r"foo|ba+r"]:
        p = parse(pat)
        nfa = compile_nfa(p, with_captures=False)
        if litmod.is_nullable(p.ast):
            u = determinize_py(nfa, anchored=False, break_at_match=True,
                               track_empty=True)
            cd = build_count_dfa_nullable(u)
        else:
            u = determinize(nfa, anchored=False, break_at_match=True)
            cd = build_count_dfa(u)
        assert cd is not None
        m = cd.minimized()
        assert m.num_states <= cd.num_states
        shrunk += int(m.num_states < cd.num_states)
        for _ in range(30):
            data = rng.choice(alphabet, size=int(rng.integers(0, 100)))
            assert cd.count_scan(data) == m.count_scan(data), pat
    assert shrunk >= 4  # minimization does real work on these shapes
