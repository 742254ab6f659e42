"""Exactness of the GB-scale chunked code paths, forced small so the
CPU suite exercises them: chunked multi-literal hits (overlap seams),
segmented ChunkScanner (covered in test_dfa too), two-level vs direct
position compaction, and bounded window-lane batches.
"""

import re

import numpy as np
import pytest

import coregex_tpu.ops.bytescan as bs
from coregex_tpu.meta.engine import Engine


@pytest.fixture
def small_chunks(monkeypatch):
    monkeypatch.setattr(bs, "_MULTI_SPAN_CHUNK", 64)
    monkeypatch.setattr(bs, "_NZ_DIRECT_LIMIT", 32)
    yield


def test_multi_literal_hits_chunked(small_chunks):
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    lits = [b"foo", b"ba", b"barbar", b"x"]
    data = bytes(rng.choice(list(b"fobarx "), size=1500))
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    pos, idx, lens = bs.multi_literal_hits(dev, lits)
    # oracle: first (priority) literal matching at each position
    exp = []
    for p in range(len(data)):
        for j, l in enumerate(lits):
            if data[p:p + len(l)] == l:
                exp.append((p, j, len(l)))
                break
    assert list(zip(pos.tolist(), idx.tolist(), lens.tolist())) == exp


def test_multi_literal_spans_chunked(small_chunks):
    pat = r"foo|ba|barbar|x"
    e = Engine.compile(pat)
    e.batch_threshold = 0
    rng = np.random.default_rng(3)
    data = bytes(rng.choice(list(b"fobarx "), size=3000))
    want = [m.span() for m in re.finditer(pat.encode(), data)]
    assert e.find_all_index(data) == (want or None)
    assert e.find_index(data) == (want[0] if want else None)


def test_mask_nonzero_chunked_vs_direct():
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    mask = rng.random(10_000) < 0.01
    dm = jnp.asarray(mask)
    want = np.flatnonzero(mask)
    cap = 256
    got_c = np.asarray(bs._mask_nonzero_chunked(dm, cap, 64))
    got_d = np.asarray(bs._mask_nonzero_direct(dm, cap))
    assert np.array_equal(got_c[:len(want)], want)
    assert np.array_equal(got_d[:len(want)], want)
    # sentinel for out-of-range queries
    assert (got_c[len(want):] == len(mask)).all()
    # 2-D flattening contract
    got2 = np.asarray(bs._mask_nonzero(dm.reshape(100, 100), cap))
    assert np.array_equal(got2[:len(want)], want)


def test_window_lane_batching(monkeypatch):
    """ends_for_starts with MAX_LANES=8 over many candidates equals the
    unbatched result."""
    import jax.numpy as jnp

    from coregex_tpu.dfa.determinize import determinize
    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.ops.dfa_scan import DeviceDFA, WindowScanner
    from coregex_tpu.syntax.parser import parse

    nfa = compile_nfa(parse(r"\d+x"), with_captures=False)
    dense = determinize(nfa, anchored=True, break_at_match=True)
    dd = DeviceDFA.from_dense(dense)
    rng = np.random.default_rng(6)
    data = bytes(rng.choice(list(b"019x z"), size=4000))
    dev = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
    starts = np.flatnonzero(np.frombuffer(data, np.uint8) != ord(" "))
    ws1 = WindowScanner(dd, init_window=4)
    base_ends = ws1.ends_for_starts(dev, starts)
    ws2 = WindowScanner(dd, init_window=4)
    monkeypatch.setattr(WindowScanner, "MAX_LANES", 8)
    got = ws2.ends_for_starts(dev, starts)
    assert np.array_equal(base_ends, got)


def test_literal_find_first_chunked(monkeypatch):
    """find_first on a LITERAL pattern touches O(chunk) for an early hit:
    every _memmem_mask call sees at most one chunk (+ overlap), and
    chunks after the hit are never scanned (round-3 verdict item 9)."""
    sizes = []
    orig = bs._memmem_mask

    def spy(dev, lit):
        sizes.append(int(dev.shape[0]))
        return orig(dev, lit)

    monkeypatch.setattr(bs, "_memmem_mask", spy)
    e = Engine.compile("needle")
    be = e.batch_engine()
    assert be.plan.strategy.value == "literal"
    data = bytearray(b"x" * 200_000)
    data[1000:1006] = b"needle"
    data[150_000:150_006] = b"needle"
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    m = be.find_first(arr)
    assert m == (1000, 1006)
    # the spy saw only chunk-sized slices, not the whole corpus, and
    # the early hit stopped the walk before the second needle
    assert sizes and all(s <= (1 << 24) + 5 for s in sizes)
    assert len(sizes) == 1
