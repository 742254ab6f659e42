"""Output-sensitive span assembly: fused mask->words producers + the
sparse compaction chain (round 5).

The round-4 span pipeline paid two full-corpus Mosaic compactions plus
eager mask-algebra dispatch per find_all REGARDLESS of match density —
~140 ms per 256 MB where the reference pays only its scan
(/root/reference/meta/findall.go:176-283).  This module restructures
extraction so the cost scales with MATCHES:

- each family's mask algebra runs inside ONE jit that emits the masks
  PRE-PACKED as 32-bit words (ops/compact2.pack_words fuses into the
  producer, so the corpus-sized bool mask never hits HBM) along with
  its hit counts;
- one host sync reads the counts (tight compaction caps);
- the 3-level sparse chain (ops/compact2.sparse_positions_words)
  extracts positions in nw + ~12*hits work instead of n;
- family assembly is pure XLA on hit-sized arrays.

Measured on chip: chain-from-words ~8.6 ms per 256 MB mask at 0.5%
density vs ~28 ms for the single-level kernel, with the pack cost
absorbed by producer fusion.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .bytescan import _class_mask_from_table, _memmem_mask, _range_mask
from .compact2 import pack_words, sparse_positions_words

# sparse-chain crossover (hits/n): below this the chain wins; above it
# callers keep their dense single-level pipelines
SPARSE_OK = 1.0 / 18


def _pad_pack(m, n: int):
    """Pack a [n] mask into words, padded to a POWER-OF-TWO word count:
    downstream chain programs are then cached per (bucket, cap) instead
    of per exact corpus length (program-cache hygiene; see
    compact2.sparse_positions_words)."""
    from .compact2 import _bucket_up
    nw = _bucket_up(max(-(-n // 32), 1))
    pad = nw * 32 - n
    if pad:
        m = jnp.concatenate([m, jnp.zeros(pad, dtype=bool)])
    return pack_words(m, nw)


def _count(m):
    return m.sum(dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Producers: one fused dispatch -> (words..., counts...)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("lit",))
def literal_words(dev, lit: Tuple[int, ...]):
    """(start-words, count) for an exact non-self-overlapping literal."""
    n = dev.shape[0]
    m = _memmem_mask(dev, lit)
    return _pad_pack(m, n), _count(m)


@functools.partial(jax.jit, static_argnames=("ranges", "mmin"))
def class_run_words(dev, ranges, mmin: int):
    """(start-words, end-words, scount, ecount) for maximal runs of the
    class (length >= mmin; ends exclusive-1, i.e. LAST member position
    like _run_masks).  Used by the charclass family when runs are
    sparse."""
    n = dev.shape[0]
    mask = _range_mask(dev, ranges)
    prev = jnp.concatenate([jnp.zeros(1, bool), mask[:-1]])
    nxt = jnp.concatenate([mask[1:], jnp.zeros(1, bool)])
    smask = mask & ~prev
    emask = mask & ~nxt
    if mmin > 1:
        ok_fwd = mask
        ok_bwd = mask
        for j in range(1, mmin):
            z = jnp.zeros(j, dtype=bool)
            ok_fwd = ok_fwd & jnp.concatenate([mask[j:], z])
            ok_bwd = ok_bwd & jnp.concatenate([z, mask[:-j]])
        smask = smask & ok_fwd
        emask = emask & ok_bwd
    return (_pad_pack(smask, n), _pad_pack(emask, n),
            _count(smask), _count(emask))


@functools.partial(jax.jit, static_argnames=("ranges", "mmin"))
def class_run_masks_dense(dev, ranges, mmin: int):
    """Bool (smask, emask) twins of class_run_words for the dense
    single-level fallback (run density too high for the chain)."""
    mask = _range_mask(dev, ranges)
    prev = jnp.concatenate([jnp.zeros(1, bool), mask[:-1]])
    nxt = jnp.concatenate([mask[1:], jnp.zeros(1, bool)])
    smask = mask & ~prev
    emask = mask & ~nxt
    if mmin > 1:
        ok_fwd = mask
        ok_bwd = mask
        for j in range(1, mmin):
            z = jnp.zeros(j, dtype=bool)
            ok_fwd = ok_fwd & jnp.concatenate([mask[j:], z])
            ok_bwd = ok_bwd & jnp.concatenate([z, mask[:-j]])
        smask = smask & ok_fwd
        emask = emask & ok_bwd
    return smask, emask


@functools.partial(jax.jit, static_argnames=("lits",))
def multi_literal_words(dev, lits: Tuple[Tuple[int, ...], ...]):
    """(start-words, end-words, scount, ecount) for an exact literal
    alternation, within-position priority resolved (first listed wins),
    all-bool algebra (no corpus-sized int32)."""
    n = dev.shape[0]
    pad1 = jnp.zeros(1, dtype=bool)
    seen = jnp.zeros(n, dtype=bool)
    emask = jnp.zeros(n + 1, dtype=bool)
    for lit in lits:
        hit = _memmem_mask(dev, lit)
        win = hit & ~seen
        seen = seen | hit
        k = len(lit)
        emask = emask.at[k:].set(emask[k:] | win[:n + 1 - k])
    smask = seen  # priority only affects END choice; starts = any hit
    return (_pad_pack(smask, n), _pad_pack(emask, n + 1),
            _count(smask), _count(emask))


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cap", "k", "interpret"))
def _literal_spans_jit(words, n_dev, cap: int, k: int, interpret: bool):
    starts, cnt, ok = sparse_positions_words(words, n_dev, cap,
                                             interpret=interpret)
    live = jnp.arange(cap, dtype=jnp.int32) < cnt
    ends = jnp.where(live, starts + k, starts)
    return jnp.stack([starts, ends], axis=1), cnt, ok


_I32_CACHE: dict = {}


def _dev_i32(n: int):
    """Cached device scalar: a fresh jnp.int32(n) per call would be a
    (possibly blocking) H2D transfer through the axon tunnel."""
    v = _I32_CACHE.get(n)
    if v is None:
        v = _I32_CACHE[n] = jnp.int32(n)
        if len(_I32_CACHE) > 256:
            _I32_CACHE.pop(next(iter(_I32_CACHE)))
    return v


def literal_spans_sparse(words, n: int, cap: int, k: int,
                         interpret: bool = False):
    """Chain + fixed-length ends: (spans [cap,2], cnt, ok).  `words`
    must be bucket-padded (producers are); programs cache per
    (word-bucket, cap, k), not per corpus length."""
    return _literal_spans_jit(words, _dev_i32(n), cap, k, interpret)


@functools.partial(jax.jit, static_argnames=("cap", "end_adjust",
                                             "interpret"))
def _pair_spans_jit(words_s, words_e, ns_dev, ne_dev, cap: int,
                    end_adjust: int, interpret: bool):
    starts, cs, ok1 = sparse_positions_words(words_s, ns_dev, cap,
                                             interpret=interpret)
    ends, ce, ok2 = sparse_positions_words(words_e, ne_dev, cap,
                                           interpret=interpret)
    live = jnp.arange(cap, dtype=jnp.int32) < cs
    if end_adjust:
        ends = jnp.where(live, ends + end_adjust, ends)
    ok = ok1 & ok2 & (cs == ce)
    ok &= jnp.all(jnp.where(live, starts < ends, True))
    nxt = jnp.concatenate(
        [starts[1:], jnp.full(1, 2**31 - 1, jnp.int32)])
    live_nxt = jnp.arange(cap, dtype=jnp.int32) < cs - 1
    ok &= jnp.all(jnp.where(live_nxt, ends <= nxt, True))
    ends = jnp.where(live, ends, starts)
    return jnp.stack([starts, ends], axis=1), cs, ok


def pair_spans_sparse(words_s, words_e, ns: int, ne: int,
                      cap: int, end_adjust: int = 0,
                      interpret: bool = False):
    """Two chains zipped into spans with the alignment validation of
    spans_from_masks: (spans [cap,2], cnt, ok).  ns/ne: mask domain
    sizes (emask is often [n+1]).  end_adjust is added to compacted end
    positions (charclass emask marks the LAST member, +1 makes it
    exclusive).  `words_*` must be bucket-padded (producers are)."""
    return _pair_spans_jit(words_s, words_e, _dev_i32(ns),
                           _dev_i32(ne), cap, end_adjust, interpret)
