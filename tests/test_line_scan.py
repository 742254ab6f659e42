"""Parallel single-launch count kernels (ops/line_scan.py), interpret
mode, differential vs the sequential host references."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from coregex_tpu.ops.count_scan import plan_geometry
from coregex_tpu.ops.line_scan import HitsScanner, LineScanner
from coregex_tpu.ops.seq_scan import line_count_host, multi_count_host


def _rand_text(rng, alphabet, n):
    return bytes(rng.choice(alphabet) for _ in range(n))


def _dev(data):
    return jnp.asarray(np.frombuffer(data, dtype=np.uint8))


SMALL_GEO = (8, 64, 8, 1)       # 8 lanes x 64 bytes: boundary torture
MED_GEO = (1024, 256, 8, 128)   # the production small-corpus geometry


def _line_count(data, needles, prefix=b"", anchored=False, geo=None):
    sc = LineScanner(needles, prefix=prefix, anchored=anchored,
                     interpret=True)
    geo = geo or plan_geometry(len(data), lc=128)
    arr = np.frombuffer(data, dtype=np.uint8)
    return sc.count(_dev(data), data_host=arr, geometry=geo)


def test_line_basic_unanchored():
    data = (b"x keyword y\nno match here\nkeyword keyword\n" * 70)
    got = _line_count(data, [b"keyword"])
    assert got == line_count_host(data, b"keyword", b"", False)


def test_line_basic_anchored():
    rng = random.Random(4)
    data = _rand_text(rng, b"/.phpx\n", 3000)
    got = _line_count(data, [b".php"], prefix=b"/", anchored=True)
    assert got == line_count_host(data, b".php", b"/", True)


def test_line_set():
    nds = [b".txt", b".log"]
    data = (b"a.txt b\nplain\nx.log.txt\nc.log\n" * 80)
    got = _line_count(data, nds)
    assert got == line_count_host(data, nds, b"", False)


@pytest.mark.parametrize("anchored", [False, True])
def test_line_lane_boundaries_random(anchored):
    """Small-lane geometry: lines, needles and prefixes crossing lane
    boundaries; trailing line without newline."""
    rng = random.Random(17)
    needle, prefix = b"ab", b"/"
    for trial in range(40):
        n = rng.randrange(0, 8 * 64)
        data = _rand_text(rng, b"ab/\n x", n)
        got = _line_count(data, [needle],
                          prefix=prefix if anchored else b"",
                          anchored=anchored, geo=SMALL_GEO)
        exp = line_count_host(data, needle, prefix if anchored else b"",
                              anchored)
        assert got == exp, (anchored, trial, data)


def test_line_needle_crosses_lane():
    # place the needle exactly across the 64-byte lane boundary
    data = bytearray(b"." * 200)
    data[62:66] = b"word"
    data[10] = 10
    data[130] = 10
    data = bytes(data)
    got = _line_count(data, [b"word"], geo=SMALL_GEO)
    assert got == line_count_host(data, b"word", b"", False)


def test_line_long_lines_span_many_lanes():
    # a single line spanning all lanes, hit in the last lane
    data = b"x" * 490 + b"needle" + b"y" * 10
    got = _line_count(data, [b"needle"], geo=SMALL_GEO)
    assert got == 1
    # prefix at SOT, hit far away (anchored)
    data2 = b"/" + b"x" * 400 + b"hit" + b"\n"
    got2 = _line_count(data2, [b"hit"], prefix=b"/", anchored=True,
                       geo=SMALL_GEO)
    assert got2 == line_count_host(data2, b"hit", b"/", True)


def test_line_anchored_prefix_at_lane_starts():
    # newline exactly at lane end => next lane starts a line
    data = (b"/" + b"a" * 58 + b"ph" + b"\n") * 6  # 62-byte lines
    got = _line_count(data, [b"ph"], prefix=b"/", anchored=True,
                      geo=SMALL_GEO)
    assert got == line_count_host(data, b"ph", b"/", True)


def test_line_anchored_entry_line_starts_at_lane_zero():
    """Previous lane ends with \\n => the entry line starts exactly at
    this lane's position 0; its validity must come from THIS lane's
    position-0 prefix event (regression: host combine used only the
    exclusive carry and missed it)."""
    # lane size 64: newline at byte 63, "/....ph..." spanning lane 1
    data = b"x" * 63 + b"\n" + b"/" + b"a" * 30 + b"ph" + b"b" * 20 + b"\n"
    got = _line_count(data, [b"ph"], prefix=b"/", anchored=True,
                      geo=SMALL_GEO)
    assert got == line_count_host(data, b"ph", b"/", True) == 1


def test_line_empty_and_tiny():
    assert _line_count(b"", [b"x"]) == 0
    assert _line_count(b"x", [b"x"]) == 1
    assert _line_count(b"x\n", [b"x"]) == 1
    assert _line_count(b"\nx", [b"x"]) == 1
    assert _line_count(b"\n\n", [b"x"]) == 0


def test_line_vs_engine_counts():
    """End-to-end: LineScanner count == Engine span count for the real
    line-shape patterns."""
    from coregex_tpu.meta.engine import Engine
    rng = random.Random(23)
    alphabet = b"keyword.tx/phfoaby\n "
    cases = [
        ([b"keyword"], b"", False, r".*keyword.*"),
        ([b".txt"], b"", False, r".*\.txt"),
        ([b".php"], b"/", True, r"(?m)^/.*\.php"),
    ]
    for needles, prefix, anchored, pattern in cases:
        eng = Engine.compile(pattern)
        eng.batch_threshold = 1 << 60
        for _ in range(30):
            t = _rand_text(rng, alphabet, rng.randrange(0, 300))
            exp = len(eng._all_spans(np.frombuffer(t, dtype=np.uint8)))
            got = _line_count(t, needles, prefix=prefix, anchored=anchored,
                              geo=MED_GEO)
            assert got == exp, (pattern, t)


# -- HitsScanner ----------------------------------------------------------

def _hits_count(data, needles, geo=None):
    sc = HitsScanner(needles, interpret=True)
    geo = geo or plan_geometry(len(data), lc=128)
    return sc.count(_dev(data), geometry=geo)


def test_hits_single_literal():
    data = b"error x error\nerrorerror zz error" * 30
    got = _hits_count(data, [b"error"])
    assert got == multi_count_host(data, [b"error"])


def test_hits_overlap_detected():
    # self-overlapping literal: raw count != Go count -> None
    assert _hits_count(b"aaa", [b"aa"], geo=SMALL_GEO) is None
    # overlapping pair across needles
    data = b"xx deltabort yy"
    got = _hits_count(data, [b"delta", b"abort"], geo=SMALL_GEO)
    assert got is None
    # non-overlapping in THIS data: exact
    data2 = b"delta abort delta"
    got2 = _hits_count(data2, [b"delta", b"abort"], geo=SMALL_GEO)
    assert got2 == 3


def test_hits_cross_lane_overlap():
    # overlap straddling the 64-byte lane boundary must be detected
    data = bytearray(b"." * 200)
    data[60:65] = b"delta"
    data[64:69] = b"abort"  # unreachable: delta wrote 60..64
    data = bytes(data[:60] + b"deltabort" + data[69:])
    got = _hits_count(data, [b"delta", b"abort"], geo=SMALL_GEO)
    assert got is None


def test_hits_random_differential():
    rng = random.Random(31)
    nds = [b"ab", b"cd", b"abc"]
    for _ in range(60):
        t = _rand_text(rng, b"abcd ", rng.randrange(0, 200))
        got = _hits_count(t, nds, geo=SMALL_GEO)
        exp = multi_count_host(t, nds)
        if got is not None:
            assert got == exp, t


def test_hits_empty():
    assert _hits_count(b"", [b"x"]) == 0
    assert _hits_count(b"yyy", [b"x"], geo=SMALL_GEO) == 0
