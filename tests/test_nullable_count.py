"""Nullable count transducer (Go empty-match FindAll rules compiled into
one weighted DFA) + ASCII-projected engine tables."""

import numpy as np
import pytest

from coregex_tpu.dfa.countdfa import build_count_dfa_nullable
from coregex_tpu.dfa.determinize import determinize, determinize_py
from coregex_tpu.meta.engine import Engine
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.syntax.parser import parse

NULLABLE_PATS = [
    r"a*", r"(?m)^.*$", r"x*y*", r"(ab)*", r"z?", r"a?b?",
    r"x*(?:|y)", r"(?:|a)", r"(a|)(b|)", r"\w*", r"(?:ab)*c?",
    r"(?:a|bc)*", r"[xy]*z?", r"(?m)^a*", r"b*\b", r"(a*)(b*)",
]


def _texts():
    rng = np.random.default_rng(11)
    texts = [b"", b"a", b"aaab", b"b", b"xxy", b"ab\ncd\n", b"\n\n",
             b"axxx", b"abab ab", b"zzz", b"hello world\nfoo\n",
             b"aabbaab", b"yxxyyx", b"bcbca", b"xyzzy"]
    for _ in range(40):
        k = int(rng.integers(0, 40))
        texts.append(bytes(rng.choice(list(b"abcxyz \n"), size=k)))
    return texts


class TestNullableCountDFA:
    @pytest.mark.parametrize("pat", NULLABLE_PATS)
    def test_table_walk_vs_host_loop(self, pat):
        nfa = compile_nfa(parse(pat), with_captures=False)
        u = determinize_py(nfa, anchored=False, break_at_match=True,
                           track_empty=True)
        cd = build_count_dfa_nullable(u)
        assert cd is not None and cd.requires_width1
        host = Engine.compile(pat)
        host.batch_threshold = 1 << 60
        for t in _texts():
            data = np.frombuffer(t, dtype=np.uint8)
            exp = len(host._all_spans(data))
            assert cd.count_scan(data) == exp, (pat, t)

    def test_empty_tracking_same_scan_behavior(self):
        for pat in [r"a*", r"(?m)^.*$", r"\d+"]:
            nfa = compile_nfa(parse(pat), with_captures=False)
            u0 = determinize_py(nfa, anchored=False, break_at_match=True)
            u1 = determinize_py(nfa, anchored=False, break_at_match=True,
                                track_empty=True)
            data = np.frombuffer(b"aa xby 12 ab\nabab\n\n3", np.uint8)
            assert (u0.scan_all_ends(data) == u1.scan_all_ends(data)).all()

    def test_engine_device_count(self):
        rng = np.random.default_rng(5)
        corpus = bytes(rng.choice(list(b"abcxyz \n"), size=150_000))
        for pat in [r"a*", r"(?m)^.*$", r"\w*"]:
            e = Engine.compile(pat)
            e.batch_threshold = 0
            h = Engine.compile(pat)
            h.batch_threshold = 1 << 60
            assert e.count(corpus[:15000]) == h.count(corpus[:15000]), pat
            assert e.stats.kernel_scans >= 1, pat

    def test_utf8_gate_falls_back_exactly(self):
        text = ("héllo wörld\n" * 40).encode()
        for pat in [r"a*", r"\w*"]:
            e = Engine.compile(pat)
            e.batch_threshold = 0
            h = Engine.compile(pat)
            h.batch_threshold = 1 << 60
            assert e.count(text) == h.count(text), pat


class TestAsciiProjection:
    def test_tables_shrink(self):
        for pat, limit in [(r"\d+.\d+.\d+", 300), (r"\w+://[^\s]+", 400)]:
            nfa = compile_nfa(parse(pat), with_captures=False,
                              ascii_only=True)
            u = determinize(nfa, anchored=False, break_at_match=True)
            full = compile_nfa(parse(pat), with_captures=False)
            uf = determinize(full, anchored=False, break_at_match=True)
            assert u.num_states < uf.num_states
            assert u.num_states * u.num_classes < limit

    @pytest.mark.parametrize("pat", [
        r"\d+.\d+.\d+", r"\w+://[^\s]+", r"[\w.+-]+@[\w.-]+\.[\w.-]+",
        r".*keyword.*", r"a*",
    ])
    def test_ascii_scan_equivalence(self, pat):
        """On ASCII input the projected DFA scans identically."""
        nfa_a = compile_nfa(parse(pat), with_captures=False,
                            ascii_only=True)
        nfa_f = compile_nfa(parse(pat), with_captures=False)
        ua = determinize(nfa_a, anchored=False, break_at_match=True)
        uf = determinize(nfa_f, anchored=False, break_at_match=True)
        rng = np.random.default_rng(7)
        for _ in range(20):
            k = int(rng.integers(0, 60))
            data = rng.choice(
                np.frombuffer(b"ab12.5x@y.z://w \n", np.uint8), size=k)
            assert (ua.scan_all_ends(data) == uf.scan_all_ends(data)).all()

    def test_non_ascii_literal_projects_to_fail(self):
        nfa = compile_nfa(parse("é+x"), with_captures=False,
                          ascii_only=True)
        u = determinize(nfa, anchored=False, break_at_match=True)
        data = np.frombuffer(b"aaa x", np.uint8)
        assert not u.scan_all_ends(data).any()

    def test_engine_corpus_switch(self):
        # ASCII corpus uses projected tables; non-ASCII stays exact
        pat = r"\d+.\d+.\d+"
        ascii_c = b"v 1.2.3 and 10x20x30 ok\n" * 500
        uni_c = ("v 1.2.3 ünd 10x20x30 ok\n" * 500).encode()
        for corpus in (ascii_c, uni_c):
            e = Engine.compile(pat)
            e.batch_threshold = 0
            h = Engine.compile(pat)
            h.batch_threshold = 1 << 60
            assert e.count(corpus) == h.count(corpus)
