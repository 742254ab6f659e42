"""Public API surface tests (Go Regexp parity extras)."""

import io
import os
import pickle
import tempfile

import pytest

import coregex_tpu as ct
from coregex_tpu.meta.engine import Engine


def test_package_level():
    assert ct.match(r"\d+", b"abc 123")
    assert ct.match_string(r"h.llo", "hello")
    assert ct.quote_meta("a.b*c") == r"a\.b\*c"
    r = ct.compile(r"x+")
    assert isinstance(r, Engine)


def test_literal_prefix():
    assert Engine.compile(r"hello").literal_prefix() == (b"hello", True)
    p, complete = Engine.compile(r"ab[cd]x").literal_prefix()
    assert p == b"ab" and not complete
    p, complete = Engine.compile(r"\d+").literal_prefix()
    assert p == b"" and not complete


def test_subexp_index():
    eng = Engine.compile(r"(?P<a>x)(y)(?P<b>z)")
    assert eng.subexp_index("a") == 1
    assert eng.subexp_index("b") == 3
    assert eng.subexp_index("nope") == -1
    assert eng.num_subexp == 3


def test_set_longest():
    eng = Engine.compile(r"a|ab")
    assert eng.find_index(b"ab") == (0, 1)
    eng.set_longest(True)
    assert eng.find_index(b"ab") == (0, 2)
    eng.set_longest(False)
    assert eng.find_index(b"ab") == (0, 1)


def test_expand():
    eng = Engine.compile(r"(\w+):(\w+)")
    m = eng.find_submatch_index(b"k:v")
    flat = [x for sp in m for x in (sp if sp else (-1, -1))]
    out = eng.expand(b"$2=$1", b"k:v", flat)
    assert out == b"v=k"


def test_reader_apis():
    eng = Engine.compile(r"needle")
    hay = b"x" * 100000 + b"needle" + b"y" * 10
    assert eng.is_match_reader(io.BytesIO(hay), chunk_size=4096)
    assert not eng.is_match_reader(io.BytesIO(b"nothing here"))
    assert eng.find_reader_index(io.BytesIO(hay)) == (100000, 100006)
    # streaming matches crossing chunk boundaries
    eng2 = Engine.compile(r"ab+c")
    hay2 = b"z" * 4095 + b"abbbbc"
    assert eng2.is_match_reader(io.BytesIO(hay2), chunk_size=4096)


def test_pickle_roundtrip():
    eng = Engine.compile(r"(?i)h[ae]llo")
    e2 = pickle.loads(pickle.dumps(eng))
    assert e2.find_index(b"xx HeLLo") == (3, 8)


def test_artifact_cache_roundtrip(tmp_path):
    from coregex_tpu.utils.artifact_cache import load_dense, save_dense
    eng = Engine.compile(r"\d+x")
    p = save_dense("pattern-key", "fwd", eng.fwd, str(tmp_path))
    assert p and os.path.exists(p)
    back = load_dense("pattern-key", "fwd", str(tmp_path))
    assert back is not None
    import numpy as np
    assert np.array_equal(back.delta, eng.fwd.delta)
    assert np.array_equal(back.match_eoi, eng.fwd.match_eoi)
    assert load_dense("other", "fwd", str(tmp_path)) is None


def test_engine_cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("COREGEX_TPU_CACHE_DIR", str(tmp_path))
    e1 = Engine.compile(r"cache\d+me")
    assert len(os.listdir(tmp_path)) >= 2  # fwd + rev artifacts
    e2 = Engine.compile(r"cache\d+me")  # loads from cache
    assert e2.find_index(b"xcache7me") == (1, 9)


def test_stats_counters():
    eng = Engine.compile(r"abc")
    eng.is_match(b"xxabc")
    assert eng.stats.dfa_searches + eng.stats.nfa_searches >= 1
    eng.stats.reset()
    assert eng.stats.dfa_searches == 0


def test_string_variant_methods():
    eng = Engine.compile(r"(\w+)=(\d+)")
    s = "a=1 bb=22"
    assert eng.find_string_index(s) == (0, 3)
    assert eng.find_all_string_index(s) == [(0, 3), (4, 9)]
    assert eng.find_string_submatch_index(s) == [(0, 3), (0, 1), (2, 3)]
    assert eng.find_all_string_submatch(s) == [["a=1", "a", "1"],
                                               ["bb=22", "bb", "22"]]
    assert eng.find_all_string_submatch_index(s) == [
        [(0, 3), (0, 1), (2, 3)], [(4, 9), (4, 6), (7, 9)]]
    assert eng.replace_all_literal_string(s, "$1") == "$1 $1"
    assert eng.replace_all_string_func(s, str.upper) == "A=1 BB=22"
    m = eng.find_string_submatch_index(s)
    assert eng.expand_string("$2:$1", s, m) == "1:a"
    # Go's flat form works too
    assert eng.expand_string("$2:$1", s, [0, 3, 0, 1, 2, 3]) == "1:a"
    # byte offsets into UTF-8, as in Go
    eng2 = Engine.compile(r"b+")
    assert eng2.find_string_index("ébb") == (2, 4)


def test_marshal_text_roundtrip():
    eng = Engine.compile(r"x\d+")
    assert eng.marshal_text() == rb"x\d+"
    back = Engine.unmarshal_text(eng.marshal_text())
    assert back.find_index(b"a x42") == (2, 5)


def test_find_reader_submatch_index():
    eng = Engine.compile(r"(a+)(b+)")
    hay = b"z" * 5000 + b"aabbb" + b"z" * 10
    got = eng.find_reader_submatch_index(io.BytesIO(hay), chunk_size=1024)
    assert got == [(5000, 5005), (5000, 5002), (5002, 5005)]
    assert eng.find_reader_submatch_index(io.BytesIO(b"zzz")) is None
