"""OnePass capture DFA vs PikeVM capture parity (the reference's
dfa/onepass tests' cross-engine matrix analogue)."""

import numpy as np
import pytest

from coregex_tpu.dfa.onepass import NotOnePass, build_onepass
from coregex_tpu.engines.pikevm import PikeVM
from coregex_tpu.meta.engine import Engine
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

ONEPASS_PATTERNS = [
    r"(\d+)-(\d+)",
    r"(a+)(b+)",
    r"(foo)(bar)?",
    r"(\w+)@(\w+)",
    r"([a-c]+)x([0-9]*)",
    r"(GET|POST) (/\S*)",
]

AMBIGUOUS = [
    r"(a|ab)(c|bcd)",   # classic not-one-pass
    r"(a*)(a*)",
    r"\b(x)",           # look assertion
]

TEXTS = [b"", b"a", b"12-34", b"aabbb", b"foobar", b"foo", b"x@y",
         b"abcx99", b"GET /idx", b"POST /a/b c", b"aaa", b"a-b 1-2 3-4"]


@pytest.mark.parametrize("pattern", ONEPASS_PATTERNS)
def test_onepass_matches_pikevm(pattern):
    parsed = parse(pattern)
    nfa = compile_nfa(parsed, with_captures=True)
    op = build_onepass(nfa)
    vm = PikeVM(nfa)
    dfa_eng = Engine.compile(pattern)
    for text in TEXTS:
        arr = np.frombuffer(text, dtype=np.uint8)
        span = dfa_eng.find_index(text)
        if span is None:
            continue
        exp = vm.search(text, span[0], anchored=True)
        got = op.apply(arr, span[0], span[1])
        assert got is not None, f"{pattern} on {text!r}: onepass found none"
        assert tuple(got) == tuple(exp), (
            f"{pattern} on {text!r}: onepass {got} vs pikevm {exp}")


@pytest.mark.parametrize("pattern", AMBIGUOUS)
def test_ambiguous_rejected(pattern):
    nfa = compile_nfa(parse(pattern), with_captures=True)
    with pytest.raises(NotOnePass):
        build_onepass(nfa)


def test_engine_uses_onepass():
    eng = Engine.compile(r"(\d+)-(\d+)")
    assert eng._onepass_dfa()  # builds
    assert eng.find_submatch(b"xx 12-34") == [b"12-34", b"12", b"34"]
    out = eng.replace_all(b"12-34 5-6", b"$2:$1")
    assert out == b"34:12 6:5"
