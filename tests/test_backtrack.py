"""BoundedBacktracker vs PikeVM parity (nfa/backtrack_test.go analogue)."""

import pytest

from coregex_tpu.engines.backtrack import BoundedBacktracker
from coregex_tpu.engines.pikevm import PikeVM
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

PATTERNS = [
    r"abc", r"a|ab", r"ab|a", r"a+", r"a*?", r"(a+)(b+)", r"\d+\.\d+",
    r"\bfoo\b", r"(?m)^b.*", r"x$", r"a.*?c", r"(x(y)z)|(xy)",
    r"colou?r", r"(a|b)+c",
]

TEXTS = [b"", b"a", b"ab", b"abc", b"xxabcyy", b"aaa", b"12.5 3.7",
         b"a foo b", b"l1\nb22", b"ax\nb", b"axxc", b"xyz xy",
         b"colour color", b"ababc"]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_backtracker_matches_pikevm(pattern):
    nfa = compile_nfa(parse(pattern), with_captures=True)
    bt = BoundedBacktracker(nfa)
    vm = PikeVM(nfa)
    for text in TEXTS:
        for pos in range(len(text) + 1):
            exp = vm.search(text, pos)
            got = bt.search(text, pos)
            assert got == exp, (
                f"{pattern!r} on {text!r}@{pos}: bt {got} vs vm {exp}")


def test_capacity_gate():
    nfa = compile_nfa(parse(r"a+"), with_captures=True)
    bt = BoundedBacktracker(nfa)
    assert bt.can_handle(1000)
    assert not bt.can_handle(1 << 30)
