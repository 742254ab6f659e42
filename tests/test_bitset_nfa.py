"""Bitset-NFA device fallback tests (ops/nfa_scan.py + BITSET_NFA
strategy): the DFA-overflow tier that keeps the corpus scan on device
(SURVEY.md §7 item 5; VERDICT.md round-2 missing item 1).

The scanner is exercised through a small state_limit so ordinary
patterns overflow determinization, and differentially against Python re
(these are ASCII non-nullable patterns where the semantics coincide).
"""

import re

import numpy as np
import pytest

from coregex_tpu.meta.config import Config
from coregex_tpu.meta.engine import Engine
from coregex_tpu.meta.strategy import Strategy
from coregex_tpu.syntax.parser import parse


def overflow_engine(pat: str) -> Engine:
    e = Engine(parse(pat), config=Config(state_limit=16))
    e.batch_threshold = 0
    return e


CASES = [
    (r"[a-f]{2,8}[0-9]{2,8}x", b"zz abc42x dd1x eeeeee33x aa00x qq9x "),
    (r"(ab|cd|ef){3,9}", b"xx ababab yy cdefab zz abcdefabcdef "),
    (r"[a-z]{4,12}[0-9]{1,3}[a-z]{4,12}", b"word5word junk abcd7efgh 123 "),
    (r"x[ab]{8,16}y", b"ss xababababy tt xaaaaaaaaaaaay uu xaby "),
]


@pytest.mark.parametrize("pat,unit", CASES, ids=[c[0] for c in CASES])
def test_bitset_differential(pat, unit):
    e = overflow_engine(pat)
    assert e.strategy == "bitset_nfa", e.strategy_reason
    data = unit * 200
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.find_all_index(data) == (want or None)
    assert e.count(data) == len(want)
    assert e.is_match(data) == bool(want)
    assert e.find_index(data) == (want[0] if want else None)


def test_bitset_host_ends_path():
    """When even the anchored verify DFA overflows, ends resolve on the
    host PikeVM over the device-discovered starts (sparse work)."""
    pat = r"[a-h]{2,10}[0-9]{2,10}[a-h]{2,10}"
    e = overflow_engine(pat)
    assert e.strategy == "bitset_nfa"
    be = e.batch_engine()
    data = b"zzzz abcd1234efgh zz hh00hh z " * 300
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert len(want) > 0
    got = be.find_all_spans(np.frombuffer(data, dtype=np.uint8), -1)
    assert got is not None
    assert [tuple(s) for s in got] == want


def test_bitset_gates():
    """Nullable patterns stay on the host tier; looks now ride the
    device tier via context-grouped closures (round-3 verdict item 3)."""
    e = Engine(parse(r"\b[a-f]{2,9}[0-9]{2,9}\b"),
               config=Config(state_limit=16))
    assert e.strategy == "bitset_nfa", e.strategy_reason
    e2 = Engine(parse(r"([a-f]{2,9}[0-9]{2,9})*"),
                config=Config(state_limit=16))
    assert e2.strategy == "host"


LOOK_CASES = [
    (r"\b[a-f]{2,8}[0-9]{2,8}\b", b"zz abc42 dd1x eee33 aa00x q9 ab12 "),
    (r"\B[a-f]{2,8}[0-9]{2,8}[a-f]{2,6}", b"xxabc42dd zz11 eee33zff aa00bc "),
    (r"(?m)^[a-h]{3,9}[0-9]{2,7}$", b"abc42\nxxeee33\nddd99\nabde777\n"),
    (r"[a-f]{2,8}[0-9]{2,8}\b", b"abc42, dd12x eee33 aa00. q9 "),
]


@pytest.mark.parametrize("pat,unit", LOOK_CASES,
                         ids=[c[0] for c in LOOK_CASES])
def test_bitset_look_differential(pat, unit):
    """Look-around in the overflow tier: context-grouped closure tables
    (word/newline/EOT boundary classes) keep \b/\B/^/$ patterns on the
    device scan, differentially exact vs Python re."""
    e = overflow_engine(pat)
    assert e.strategy == "bitset_nfa", e.strategy_reason
    data = unit * 150
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.find_all_index(data) == (want or None), pat
    assert e.count(data) == len(want)
    assert e.is_match(data) == bool(want)


def test_bitset_look_group_dedup():
    """A \b-only pattern needs only a few distinct closure tables."""
    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.ops.nfa_scan import DeviceBitsetNFA
    nfa = compile_nfa(parse(r"\b[a-f]{2,9}[0-9]{2,9}\b"),
                      with_captures=False)
    d = DeviceBitsetNFA(nfa)
    assert d.has_looks and 1 < d.G <= 4, d.G


def test_bitset_no_match():
    e = overflow_engine(r"[a-f]{2,8}[0-9]{2,8}x")
    data = b"no digits here at all, just words " * 100
    assert e.find_all_index(data) is None
    assert e.count(data) == 0
    assert e.is_match(data) is False


def test_bitset_lane_boundary_matches():
    """Matches spanning the internal lane seams are exact (fixpoint
    repair): place long matches everywhere with a prime stride."""
    pat = r"q[a-p]{20,40}q"
    e = overflow_engine(pat)
    assert e.strategy == "bitset_nfa"
    rng = np.random.default_rng(3)
    filler = rng.integers(ord("r"), ord("z") + 1, size=40_013,
                          dtype=np.uint8).tobytes()
    ins = b"q" + b"abcdefghop" * 3 + b"q"
    parts = []
    for i in range(0, len(filler), 997):
        parts.append(filler[i:i + 997])
        parts.append(ins)
    data = b"".join(parts)
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert len(want) > 30
    assert e.find_all_index(data) == want
    assert e.count(data) == len(want)


def test_bitset_scanner_unit():
    """Direct scanner check: ends() reports exactly the boundaries where
    some match ends."""
    import jax

    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.ops.nfa_scan import BitsetNFAScanner
    jax.config.update("jax_platforms", "cpu")
    nfa = compile_nfa(parse(r"ab+c"), with_captures=False)
    sc = BitsetNFAScanner(nfa)
    data = b"xabcx abbbbc abc"
    dev = np.frombuffer(data, dtype=np.uint8)
    import jax.numpy as jnp
    ends, ok = sc.ends(jnp.asarray(dev))
    assert ok
    want = sorted({m.end() for m in re.finditer(rb"ab+c", data)})
    # all-ends semantics: every end of ANY match (here both the greedy
    # spans end identically)
    assert list(ends) == want


def test_bitset_device_spans_builder():
    """Round 5 (verdict missing item 3): BITSET_NFA extracts
    device-resident — reverse bitset-NFA start discovery + the shared
    interleaved verification / device Go selection — with parity."""
    import jax
    pat, unit = CASES[0]
    e = overflow_engine(pat)
    be = e.batch_engine()
    data = unit * 400
    arr = np.frombuffer(data, dtype=np.uint8)
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    r = be.find_all_spans_device(arr)
    assert r is not None, "device bitset builder out of scope"
    sd, cnt = r
    got = [tuple(int(v) for v in row)
           for row in np.asarray(jax.device_get(sd))[:cnt]]
    assert got == want
