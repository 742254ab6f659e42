"""Seq algebra + PREFIX_SET strategy tests (literal/seq.go analogues)."""

import re as pyre

import numpy as np
import pytest

from coregex_tpu.meta import seq as seqmod
from coregex_tpu.meta.engine import Engine
from coregex_tpu.meta.seq import Lit, Seq
from coregex_tpu.syntax.parser import parse

from helpers import compile_oracle, go_all_matches


def prefixes_of(pat: str) -> Seq:
    return seqmod.prefixes(parse(pat).ast)


class TestSeqAlgebra:
    def test_cross_exact(self):
        a = Seq([Lit(b"a"), Lit(b"b")])
        b = Seq([Lit(b"x"), Lit(b"y")])
        got = [l.b for l in a.cross(b).lits]
        assert got == [b"ax", b"ay", b"bx", b"by"]

    def test_cross_inexact_passthrough(self):
        a = Seq([Lit(b"a", exact=False), Lit(b"b")])
        b = Seq([Lit(b"x")])
        got = a.cross(b)
        assert [(l.b, l.exact) for l in got.lits] == [
            (b"a", False), (b"bx", True)]

    def test_cross_infinite_marks_inexact(self):
        a = Seq([Lit(b"foo")])
        got = a.cross(Seq.infinite())
        assert got.is_finite and not got.lits[0].exact

    def test_dedup_inexact_dominates(self):
        s = Seq([Lit(b"fo", exact=False), Lit(b"foo"), Lit(b"fo", False)])
        assert [l.b for l in s.dedup().lits] == [b"fo"]

    def test_keep_first_bytes(self):
        s = Seq([Lit(b"abcdef"), Lit(b"ab")])
        t = s.keep_first_bytes(3)
        assert [(l.b, l.exact) for l in t.lits] == [
            (b"abc", False), (b"ab", True)]

    def test_minimize_overflow_poisons(self):
        lits = [Lit(bytes([a, b])) for a in range(65, 85)
                for b in range(65, 85)]  # 400 distinct 2-byte literals
        s = Seq(lits).minimize(target=32, floor=2)
        assert not s.is_finite

    def test_lcp_lcs(self):
        s = Seq([Lit(b"foobar"), Lit(b"fooqux_ar"), Lit(b"foozar")])
        assert s.longest_common_prefix() == b"foo"
        assert s.longest_common_suffix() == b"ar"

    def test_union_priority_order(self):
        a = Seq([Lit(b"x")])
        b = Seq([Lit(b"y")])
        assert [l.b for l in a.union(b).lits] == [b"x", b"y"]


class TestPrefixExtraction:
    def test_literal_tail(self):
        s = prefixes_of(r"foo\d+bar")
        assert s.is_finite
        assert all(l.b.startswith(b"foo") for l in s.lits)

    def test_alternation(self):
        lits = seqmod.viable_prefix_set(parse(r"(foo\d+|bar\w+)").ast)
        assert lits is not None
        assert set(lits) == {b"foo", b"bar"} or all(
            l[:3] in (b"foo", b"bar") for l in lits)

    def test_star_poisons(self):
        assert seqmod.viable_prefix_set(parse(r".*foo").ast) is None

    def test_leading_class_poisons(self):
        # \d+ has 10 one-byte prefixes: below the min length gate
        assert seqmod.viable_prefix_set(parse(r"\d+foo").ast) is None

    def test_anchor_transparent(self):
        lits = seqmod.viable_prefix_set(parse(r"\bGET /[a-z]+").ast)
        assert lits is not None and lits[0].startswith(b"GE")

    def test_concat_early_stop_is_inexact(self):
        s = prefixes_of(r"ab[0-9a-f]x")  # class too big to expand
        assert s.is_finite
        # every literal is a strict prefix (x not reached) => inexact
        assert all(not l.exact for l in s.lits)
        assert [l.b for l in s.lits] == [b"ab"]

    def test_plus_group(self):
        lits = seqmod.viable_prefix_set(parse(r"(ab)+z").ast)
        assert lits == [b"ab"]


PREFIX_SET_PATTERNS = [
    r"foo\d+bar",
    r"(foo\d+|bar\w+)",
    r"GET /[a-z]+",
    r"err(or|no)\d{2}",
    r"(?i)warn\d+",
    r"v\d+\.\d+\.\d+",
    r"(ab)+z",
]


class TestPrefixSetStrategy:
    @pytest.mark.parametrize("pat", PREFIX_SET_PATTERNS)
    def test_routes_to_prefix_set(self, pat):
        e = Engine.compile(pat)
        assert e.strategy == "prefix_set", (pat, e.strategy)

    @pytest.mark.parametrize("pat", PREFIX_SET_PATTERNS)
    def test_spans_match_oracle(self, pat):
        text = (b"foo123bar zap bar_x GET /abc error42 warn7 WARN88 "
                b"errno99 v1.2.33 foo9barbar abab ababz foofoo1bar "
                b"xbarzz GET /q \n" * 40)
        e = Engine.compile(pat)
        got = [tuple(s) for s in (e.find_all_index(text) or [])]
        exp = go_all_matches(compile_oracle(pat), text)
        assert got == [tuple(s) for s in exp], pat

    def test_count_matches_oracle(self):
        text = b"foo1bar foo22bar nix foo333bar\n" * 100
        e = Engine.compile(r"foo\d+bar")
        assert e.count(text) == 300

    def test_candidate_overflow_falls_back(self):
        # dense candidates (every position) still give exact results
        text = b"ab" * 3000
        e = Engine.compile(r"ab(c|d)?a")
        got = [tuple(s) for s in (e.find_all_index(text) or [])]
        exp = go_all_matches(compile_oracle(r"ab(c|d)?a"), text)
        assert got == [tuple(s) for s in exp]
