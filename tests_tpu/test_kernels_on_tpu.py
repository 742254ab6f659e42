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
