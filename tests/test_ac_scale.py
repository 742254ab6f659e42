"""Large literal-set (Aho-Corasick scale) coverage: >64 literals route
past the Teddy-class kernels to the dense-DFA pipelines (the eagerly
determinized alternation IS the AC automaton — reference
prefilter/ahocorasick.go:8-45, meta/strategy.go:178), which must stay
exact at 200-600 literals (VERDICT.md round-2 missing item 3).
"""

import re

import numpy as np
import pytest

from coregex_tpu.meta.engine import Engine


def _words(n, seed=5):
    rng = np.random.default_rng(seed)
    out = set()
    while len(out) < n:
        k = int(rng.integers(3, 9))
        out.add("".join(chr(int(c)) for c in
                        rng.integers(ord("a"), ord("z") + 1, size=k)))
    return sorted(out)


@pytest.mark.parametrize("nlits", [100, 200, 600])
def test_ac_scale_spans_and_count(nlits):
    words = _words(nlits)
    pat = "|".join(words)
    e = Engine.compile(pat)
    e.batch_threshold = 0
    rng = np.random.default_rng(nlits)
    parts = []
    for _ in range(400):
        parts.append(words[int(rng.integers(len(words)))])
        parts.append("".join(chr(int(c)) for c in
                             rng.integers(ord("a"), ord("z") + 1,
                                          size=int(rng.integers(1, 12)))))
    data = " ".join(parts).encode()
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert len(want) > 100
    assert e.find_all_index(data) == want
    assert e.count(data) == len(want)
    assert e.is_match(data)
    assert e.find_index(data) == want[0]


def test_ac_scale_leftmost_priority():
    """Alternation priority (leftmost-first, not longest) survives the
    large-set route: earlier alternatives win at a shared start."""
    words = _words(80)
    # make 'abc' and 'abcdef' both present with the SHORT one first
    pat = "|".join(["abc", "abcdef"] + words)
    e = Engine.compile(pat)
    e.batch_threshold = 0
    data = (b"xx abcdef yy " + " ".join(words[:40]).encode()) * 30
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.find_all_index(data) == want


def test_ac_scale_longest_mode():
    words = _words(80)
    pat = "|".join(["abc", "abcdef"] + words)
    e = Engine.compile(pat, longest=True)
    e.batch_threshold = 0
    data = b"xx abcdef yy abc zz " * 50
    # POSIX longest picks abcdef at the shared start
    spans = e.find_all_index(data)
    lens = {data[s:e_].decode() for s, e_ in spans}
    assert "abcdef" in lens
