"""Vectorized byte-scan primitives (the reference's simd/ layer, TPU-style).

memchr/memmem/class scans are pure VPU compare-reductions here — the
capability analogues of the reference's AVX2 kernels (simd/memchr_amd64.s,
simd/memmem.go rare-byte search, prefilter/teddy.go bucketed multi-literal),
re-expressed as data-parallel jnp ops that XLA fuses into a handful of
elementwise passes over the corpus.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("byte",))
def _memchr_mask(data: jnp.ndarray, byte: int) -> jnp.ndarray:
    return data == np.uint8(byte)


def memchr(data: jnp.ndarray, byte: int) -> np.ndarray:
    """All positions of `byte` (simd.Memchr analogue)."""
    return np.flatnonzero(np.asarray(jax.device_get(_memchr_mask(data, byte))))


@functools.partial(jax.jit, static_argnames=("needle",))
def _memmem_mask(data: jnp.ndarray, needle: Tuple[int, ...]) -> jnp.ndarray:
    """Mask of start positions where `needle` occurs — k shifted compares
    ANDed (exact, no verification needed)."""
    n = data.shape[0]
    k = len(needle)
    acc = None
    for i, b in enumerate(needle):
        shifted = jnp.roll(data, -i)
        eq = shifted == np.uint8(b)
        acc = eq if acc is None else (acc & eq)
    # positions where the needle would run off the end are invalid
    idx = jnp.arange(n)
    acc = acc & (idx <= n - k)
    return acc


def memmem(data: jnp.ndarray, needle: bytes) -> np.ndarray:
    """All start positions of `needle` (simd.Memmem analogue)."""
    if len(needle) == 0:
        return np.arange(int(data.shape[0]) + 1)
    if len(needle) > int(data.shape[0]):
        return np.empty(0, dtype=np.int64)
    mask = _memmem_mask(data, tuple(needle))
    return np.flatnonzero(np.asarray(jax.device_get(mask)))


@functools.partial(jax.jit, static_argnames=("lits", "case_insensitive"))
def _multi_literal_scan(data: jnp.ndarray, lits: Tuple[Tuple[int, ...], ...],
                        case_insensitive: bool = False):
    """Per-position: index of the first (priority order) literal matching at
    that position, or -1; plus its length.  The Teddy-style multi-pattern
    scan (prefilter/teddy.go analogue) with leftmost-first alternation
    priority resolved via per-literal priority order."""
    n = data.shape[0]
    idx = jnp.arange(n)
    best = jnp.full((n,), -1, dtype=jnp.int32)
    blen = jnp.zeros((n,), dtype=jnp.int32)
    # iterate literals in REVERSE priority so earlier literals overwrite
    for li in range(len(lits) - 1, -1, -1):
        needle = lits[li]
        k = len(needle)
        acc = idx <= n - k
        for i, b in enumerate(needle):
            acc = acc & (jnp.roll(data, -i) == np.uint8(b))
        best = jnp.where(acc, li, best)
        blen = jnp.where(acc, k, blen)
    return best, blen


def multi_literal_hits(data: jnp.ndarray, literals: Sequence[bytes]
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (positions, literal_index, literal_length) for every position
    where some alternation branch matches, with branch priority applied."""
    lits = tuple(tuple(l) for l in literals)
    best, blen = _multi_literal_scan(data, lits)
    best = np.asarray(jax.device_get(best))
    blen = np.asarray(jax.device_get(blen))
    pos = np.flatnonzero(best >= 0)
    return pos, best[pos], blen[pos]


@jax.jit
def _member_mask(data: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    return table[data]


def class_runs(data: jnp.ndarray, membership: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Maximal runs of bytes in the class: returns (starts, ends) arrays.

    The CharClassSearcher single-pass state machine
    (nfa/charclass_searcher.go:89) becomes a mask + boundary diff.
    """
    mask = np.asarray(jax.device_get(
        _member_mask(data, jnp.asarray(membership, dtype=bool))))
    if mask.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    prev = np.concatenate([[False], mask[:-1]])
    nxt = np.concatenate([mask[1:], [False]])
    starts = np.flatnonzero(mask & ~prev)
    ends = np.flatnonzero(mask & ~nxt) + 1
    return starts, ends


@jax.jit
def _newline_mask(data: jnp.ndarray) -> jnp.ndarray:
    return data == np.uint8(10)


def newline_positions(data: jnp.ndarray) -> np.ndarray:
    return np.flatnonzero(np.asarray(jax.device_get(_newline_mask(data))))


def line_starts_for(positions: np.ndarray, newlines: np.ndarray
                    ) -> np.ndarray:
    """For each position, the start offset of its line (0 or after the
    previous \\n) — vectorized via searchsorted."""
    if len(newlines) == 0:
        return np.zeros_like(positions)
    idx = np.searchsorted(newlines, positions, side="left")
    out = np.where(idx > 0, newlines[np.maximum(idx - 1, 0)] + 1, 0)
    return out


def line_ends_for(positions: np.ndarray, newlines: np.ndarray,
                  n: int) -> np.ndarray:
    """For each position, the end offset of its line (index of next \\n, or
    n)."""
    if len(newlines) == 0:
        return np.full_like(positions, n)
    idx = np.searchsorted(newlines, positions, side="left")
    out = np.where(idx < len(newlines),
                   newlines[np.minimum(idx, len(newlines) - 1)], n)
    return out


@jax.jit
def _is_ascii(data: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(data, initial=0) < 0x80


def is_ascii(data: jnp.ndarray) -> bool:
    """simd.IsASCII analogue: one vectorized max-reduction."""
    return bool(jax.device_get(_is_ascii(data)))
