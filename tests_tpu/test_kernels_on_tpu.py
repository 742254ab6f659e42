"""Real-chip kernel checks: every Mosaic/MXU scan path that the bench
depends on, exercised on a small (4 MB) corpus with exact parity vs
Python re.  A few minutes warm; the class of failure that OOM-killed
the r2 bench (device-path-only bugs) surfaces here before timing runs.
"""

import re

import numpy as np
import pytest

from coregex_tpu.meta.engine import Engine


def _corpus(mb=4, seed=11):
    rng = np.random.default_rng(seed)
    words = [b"alpha", b"beta", b"error", b"warning", b"10.0.0.1",
             b"a@b.cd", b"v1.2.3", b"/index.php", b"file.txt", b"GET",
             b"keyword", b"lorem", b"ipsum", b"x86", b"200"]
    lines = []
    total = 0
    size = mb * 1024 * 1024
    while total < size:
        k = int(rng.integers(3, 10))
        ln = b" ".join(words[int(rng.integers(len(words)))]
                       for _ in range(k)) + b"\n"
        lines.append(ln)
        total += len(ln)
    return b"".join(lines)


CORPUS = _corpus()

# (pattern, exercised device path)
KERNEL_CASES = [
    (r"error", "literal / seq or hits kernel"),
    (r"error|warning|alpha|beta", "multi-literal hits kernel"),
    (r"[\w]+", "tiled class-run count"),
    (r"\d+\.\d+\.\d+\.\d+", "prefix-run / count transducer"),
    (r".*keyword.*", "line kernel"),
    (r"(?m)^/.*\.php", "anchored line kernel"),
    (r"[\w.+-]+@[\w.-]+\.[\w.-]+", "count transducer select tree"),
    (r"(\w{2,8})+", "nullable count transducer"),
]


@pytest.mark.parametrize("pat,_path", KERNEL_CASES,
                         ids=[c[0] for c in KERNEL_CASES])
def test_count_on_tpu(pat, _path):
    e = Engine.compile(pat)
    e.batch_threshold = 0
    got = e.count(CORPUS)
    want = sum(1 for _ in re.finditer(pat.encode(), CORPUS))
    assert got == want, f"{pat}: device {got} vs re {want}"


def test_spans_on_tpu():
    pat = r"\d+\.\d+\.\d+\.\d+"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    got = e.find_all_index(CORPUS[: 1 << 20])
    want = [m.span() for m in re.finditer(pat.encode(), CORPUS[: 1 << 20])]
    assert got == want


def test_bitset_nfa_on_tpu():
    from coregex_tpu.meta.config import Config
    from coregex_tpu.syntax.parser import parse
    pat = r"[a-f]{2,8}[0-9]{2,8}x"
    e = Engine(parse(pat), config=Config(state_limit=16))
    e.batch_threshold = 0
    assert e.strategy == "bitset_nfa"
    data = (b"zz abc42x ff dd1x eeeeee33x aa00x qq9x " * 2000)
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.find_all_index(data) == want
    assert e.count(data) == len(want)


def test_submatch_batch_on_tpu():
    """Batched OnePass capture extraction over many spans (the
    two-phase FindAllSubmatch path) on the real chip."""
    pat = r"(\d+)\.(\d+)\.(\d+)\.(\d+)"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    data = CORPUS[: 8 << 20]
    got = e.find_all_submatch_index(data)
    want = [[m.span()] + [m.span(i) for i in range(1, 5)]
            for m in re.finditer(pat.encode(), data)]
    want = [[tuple(s) for s in row] for row in want]
    assert got is not None and len(got) == len(want)
    assert [list(map(tuple, g)) for g in got] == want


# -- round-4: every Strategy value gets a real-chip parity case ----------

def test_end_anchored_on_tpu():
    pat = r"error\z"
    data = CORPUS[: 1 << 20] + b"trailing error"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    assert e.strategy == "end_anchored"
    assert e.find_all_index(data) == [(len(data) - 5, len(data))]
    assert e.count(data) == 1


def test_prefix_set_on_tpu():
    pat = r"(GET|keyword|alpha)[a-z ]"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    assert e.strategy == "prefix_set", e.strategy_reason
    data = CORPUS[: 4 << 20]
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.count(data) == len(want)
    assert e.find_all_index(data) == (want or None)


def test_line_set_on_tpu():
    """Suffix sets through alternations (.*\\.(txt|log) shapes)."""
    pat = r".*\.(txt|php)"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    data = CORPUS[: 4 << 20]
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.count(data) == len(want)
    assert e.find_all_index(data[: 1 << 20]) == (
        [m.span() for m in re.finditer(pat.encode(), data[: 1 << 20])]
        or None)


def test_longest_mode_on_tpu():
    """POSIX-longest on the chip vs the host longest engine."""
    pat = r"error|error[a-z ]+"
    dev = Engine.compile(pat, longest=True)
    dev.batch_threshold = 0
    host = Engine.compile(pat, longest=True)
    host.batch_threshold = 1 << 60
    data = CORPUS[: 1 << 20]
    arr = np.frombuffer(data, dtype=np.uint8)
    assert dev._all_spans(arr) == host._all_spans(arr)
    assert dev.count(data) == host.count(data)


def test_nullable_count_and_spans_on_tpu():
    """Round-3 verdict item 1 done-criterion: nullable find_all at
    >=100 MB through a device path with exact span parity (sampled)
    and a throughput number."""
    import time
    pat = r"\w*"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    assert e.strategy == "nullable_core"
    reps = (100 * 1024 * 1024) // len(CORPUS) + 1
    big = CORPUS * reps
    arr = np.frombuffer(big, dtype=np.uint8)
    be = e.batch_engine()
    # ORACLE: the host engine (Go allMatches empty-match rules; Python
    # re ACCEPTS an empty right after a match where Go rejects it)
    host = Engine.compile(pat)
    host.batch_threshold = 1 << 60
    tile = np.frombuffer(CORPUS, np.uint8)
    want = host._all_spans(tile)
    r = be.find_all_spans_device(tile)
    # device spans on the 4 MB tile: exact parity
    assert r is not None
    sd, cnt = r
    import jax
    got = [(int(a), int(b))
           for a, b in np.asarray(jax.device_get(sd[:cnt]))]
    assert got == want
    # >=100 MB: count via the nullable transducer must equal the span
    # factorization's count (two independent device paths)
    t0 = time.perf_counter()
    c = e.count(big)
    dt = time.perf_counter() - t0
    # tiling: each tile ends in \n, so non-empty runs don't cross
    # seams, but the empty match at a tile's EOI position IS the next
    # tile's position-0 empty — counted once, not twice
    want_n = reps * len(want) - (reps - 1)
    assert c == want_n
    print(f"\nnullable count 100MB: {len(big)/dt/1e9:.2f} GB/s")
    t0 = time.perf_counter()
    r2 = be.find_all_spans_device(arr)
    assert r2 is not None
    _, cnt2 = r2
    dt2 = time.perf_counter() - t0
    assert cnt2 == want_n
    print(f"nullable find_all {len(big)/1e6:.0f}MB device: "
          f"{len(big)/dt2/1e9:.2f} GB/s")


def test_bitset_look_on_tpu():
    """Round-3 verdict item 3 done-criterion: a \\b-bearing pattern
    forced past state_limit scans ~100 MB on device with span parity."""
    from coregex_tpu.meta.config import Config
    from coregex_tpu.syntax.parser import parse
    pat = r"\b[a-f]{2,8}[0-9]{2,8}\b"
    e = Engine(parse(pat), config=Config(state_limit=16))
    e.batch_threshold = 0
    assert e.strategy == "bitset_nfa", e.strategy_reason
    unit = b"zz abc42 dd1x eee33 aa00x q9 ab12 ff00ff "
    data = unit * ((100 * 1024 * 1024) // len(unit))
    want_unit = len([m for m in re.finditer(pat.encode(), unit * 3)]) // 3
    got = e.count(data)
    # spans on a smaller slice: exact parity incl. boundaries
    small = unit * 4000
    want = [m.span() for m in re.finditer(pat.encode(), small)]
    assert e.find_all_index(small) == (want or None)
    assert got == want_unit * (len(data) // len(unit))


def test_bidi_span_transducer_on_tpu():
    """Round-5 bidirectional extraction: the span-transducer forward
    scan + reverse reset scan, device-resident with exact parity on
    the 4 MB tile and warm sync-free reruns (hinted lane entries)."""
    import jax
    tile = np.frombuffer(CORPUS, np.uint8)
    for pat in (r"\d+\.\d+\.\d+\.\d+", r"\d+.\d+.\d+"):
        e = Engine.compile(pat)
        e.batch_threshold = 0
        be = e.batch_engine()
        want = [m.span() for m in re.finditer(pat.encode(), CORPUS)]
        r = be.find_all_spans_device(tile)
        assert r is not None, pat
        sd, cnt = r
        got = [(int(a), int(b))
               for a, b in np.asarray(jax.device_get(sd[:cnt]))]
        assert got == want, pat
        # warm deferred path: count may be a device scalar, ok deferred
        r2 = be.find_all_spans_device(tile, defer_ok=True)
        sd2, cnt2, ok2 = r2
        cnt2h = (int(jax.device_get(cnt2))
                 if not isinstance(cnt2, int) else cnt2)
        assert cnt2h == len(want)
        assert ok2 is None or bool(jax.device_get(ok2))


def test_bitset_device_spans_on_tpu():
    """Round-5 BITSET_NFA device extraction (verdict missing item 3):
    DFA-overflow pattern extracts device-resident with parity."""
    import jax
    from coregex_tpu.meta.config import Config
    from coregex_tpu.syntax.parser import parse
    pat = r"[a-f]{2,8}[0-9]{2,8}x"
    e = Engine(parse(pat), config=Config(state_limit=16))
    e.batch_threshold = 0
    assert e.strategy == "bitset_nfa", e.strategy_reason
    unit = b"zz abc42x dd1x eeeeee33x aa00x qq9x "
    data = unit * 30000  # ~1 MB
    arr = np.frombuffer(data, np.uint8)
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    be = e.batch_engine()
    r = be.find_all_spans_device(arr)
    assert r is not None
    sd, cnt = r
    got = [(int(a), int(b))
           for a, b in np.asarray(jax.device_get(sd[:cnt]))]
    assert got == want
