"""Native (C++) determinizer vs Python determinizer: exact table equality."""

import numpy as np
import pytest

from coregex_tpu import native
from coregex_tpu.dfa.determinize import determinize_py
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

PATTERNS = [
    r"abc", r"a|ab", r"\d+\.\d+\.\d+\.\d+", r"[a-z]+[0-9]+",
    r"\bfoo\b", r"(?m)^b.*$", r"a.*?c", r"(?i)hello", r"x$|y",
    r"(foo|bar|baz)+", r"[\w.+-]+@[\w-]+", r"colou?r",
]


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native library unavailable (no C++ toolchain)")
    return l


@pytest.mark.parametrize("pattern", PATTERNS)
@pytest.mark.parametrize("anchored,brk", [(False, True), (False, False),
                                          (True, True)])
def test_native_matches_python(lib, pattern, anchored, brk):
    parsed = parse(pattern)
    for reverse in (False, True):
        nfa = compile_nfa(parsed, reverse=reverse,
                          with_captures=not reverse)
        py = determinize_py(nfa, anchored=anchored, break_at_match=brk)
        nat = native.determinize_native(nfa, anchored, brk, 20_000)
        assert nat is not None
        assert nat.num_states == py.num_states, (
            f"{pattern}: native {nat.num_states} vs py {py.num_states}")
        assert np.array_equal(nat.delta, py.delta)
        assert np.array_equal(nat.match_on, py.match_on)
        assert np.array_equal(nat.match_eoi, py.match_eoi)
        assert np.array_equal(nat.starts, py.starts)


def test_native_overflow(lib):
    from coregex_tpu.dfa.determinize import DFAOverflow
    nfa = compile_nfa(parse(r"(?i)[\w]{40}x{30}[abc]{25}"),
                      with_captures=False)
    with pytest.raises(DFAOverflow):
        native.determinize_native(nfa, False, True, 10)


def test_native_speedup(lib):
    import time
    parsed = parse(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
    nfa = compile_nfa(parsed, with_captures=False)
    t_nat = float("inf")
    t_py = float("inf")
    for _ in range(3):  # best-of-3: sub-ms timings flake under CI load
        t0 = time.perf_counter()
        nat = native.determinize_native(nfa, False, True, 20_000)
        t_nat = min(t_nat, time.perf_counter() - t0)
        t0 = time.perf_counter()
        py = determinize_py(nfa)
        t_py = min(t_py, time.perf_counter() - t0)
    assert np.array_equal(nat.delta, py.delta)
    # native should be much faster; just assert it's not clearly slower
    assert t_nat <= 2 * t_py
