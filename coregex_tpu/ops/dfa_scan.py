"""Data-parallel DFA scan kernels (JAX/XLA path).

The TPU-native re-expression of the reference's hot loop
(dfa/lazy/lazy.go:602-673: one byte -> one class -> one flat-table gather):
instead of a branchy per-byte pointer walk, the corpus is split into L
chunks scanned in parallel lanes, each lane stepping its own DFA state
through a dense [S, C] transition table.

Exactness across chunk boundaries uses *warmup-guess + fixpoint repair*:
every lane first scans a W-byte warmup overlap from a guessed restart state;
lane i's scan is provably exact iff its state at the chunk start equals lane
i-1's claimed exit state, checked transitively from lane 0 (whose entry is
the true start).  Mismatched lanes are rescanned from corrected entries
until the chain fixes — typically zero repair rounds, with a hard cap and
sequential fallback for adversarial patterns.

Two step implementations:
  * "gather":  next = delta_flat[state * C + class]  (XLA gather)
  * "onehot":  next = sum_s onehot(state)_s * (onehot(class) @ delta.T)_s —
               MXU matmul + VPU select, no gathers (TPU-friendly).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dfa.dense import CTX_NL, CTX_OTHER, CTX_SOT, CTX_WORD, DEAD, DenseDFA


# ---------------------------------------------------------------------------
# Device-resident DFA tables
# ---------------------------------------------------------------------------

@dataclass
class DeviceDFA:
    """DFA tables uploaded once per pattern (jnp arrays)."""
    delta: jnp.ndarray        # [S, C] int32
    match_on: jnp.ndarray     # [S, C] bool
    match_eoi: jnp.ndarray    # [S, 4] bool
    starts: jnp.ndarray       # [4] int32
    classes: jnp.ndarray      # [256] int32
    num_states: int
    num_classes: int

    @classmethod
    def from_dense(cls, dfa: DenseDFA) -> "DeviceDFA":
        return cls(
            delta=jnp.asarray(dfa.delta, dtype=jnp.int32),
            match_on=jnp.asarray(dfa.match_on),
            match_eoi=jnp.asarray(dfa.match_eoi),
            starts=jnp.asarray(dfa.starts, dtype=jnp.int32),
            classes=jnp.asarray(dfa.classes, dtype=jnp.int32),
            num_states=dfa.num_states,
            num_classes=dfa.num_classes,
        )


def byte_context(classes_unused, data: jnp.ndarray) -> jnp.ndarray:
    """Context index (CTX_*) of each byte, vectorized (for start states)."""
    is_word = ((data >= 48) & (data <= 57)) | ((data >= 65) & (data <= 90)) \
        | (data == 95) | ((data >= 97) & (data <= 122))
    is_nl = data == 10
    return jnp.where(is_word, CTX_WORD, jnp.where(is_nl, CTX_NL, CTX_OTHER))


# ---------------------------------------------------------------------------
# Chunked full-corpus scan
# ---------------------------------------------------------------------------

def _plan_geometry(n: int, target_chunk: int = 4096, max_lanes: int = 4096,
                   warmup: int = 64) -> Tuple[int, int, int]:
    """Choose (lanes L, chunk T, warmup W); L*T >= n, shapes bucketed to
    limit recompiles."""
    if n <= target_chunk:
        return 1, max(n, 1), 0
    lanes = min(max_lanes, max(1, -(-n // target_chunk)))
    # round lanes to power of two for stable jit shapes
    lanes = 1 << (lanes - 1).bit_length()
    lanes = min(lanes, max_lanes)
    T = -(-n // lanes)
    return lanes, T, warmup


@functools.partial(jax.jit, static_argnames=("L", "T", "W", "n_steps"))
def _chunk_scan(delta_flat, match_flat, cls_chunks, entries, start_offsets,
                marks, L: int, T: int, W: int, n_steps: int):
    """Scan L lanes over [L, W+T] class arrays.

    entries: [L] entry states (applied at local position start_offsets[i])
    start_offsets: [L] local position where the lane becomes live
    marks: [L] local position whose state to capture (exit/EOI state)
    Returns (flags [L, W+T] bool, exits [L] int32).
    """
    C = match_flat.shape[0] // delta_flat.shape[0] if False else None
    num_classes = delta_flat.shape[1]

    def step(carry, xs):
        state, captured, t = carry
        c = xs  # [L]
        live = t >= start_offsets
        st = jnp.where(live, state, entries)
        flag = match_flat[st, c] & live
        nxt = delta_flat[st, c]
        new_state = jnp.where(live, nxt, state)
        captured = jnp.where(t == marks, st, captured)
        # capture exit AFTER the step when mark == t+1 handled next iter via
        # the st value; final capture below handles mark == n_steps.
        return (new_state, captured, t + 1), flag

    init_state = entries
    init_cap = jnp.full((L,), DEAD, dtype=jnp.int32)
    (fin_state, captured, _), flags = jax.lax.scan(
        step, (init_state, init_cap, jnp.int32(0)),
        cls_chunks.T, length=n_steps, unroll=4)
    captured = jnp.where(marks == n_steps, fin_state, captured)
    return flags.T, captured


class ChunkScanner:
    """Full-corpus match-flag scan with exact boundary stitching."""

    def __init__(self, ddfa: DeviceDFA, max_repair: int = 4):
        self.d = ddfa
        self.max_repair = max_repair

    def scan(self, data: jnp.ndarray, sot_start: Optional[int] = None
             ) -> Tuple[np.ndarray, int]:
        """Return (flags bool [n+1], exit_state_at_n).

        flags[p] == "a match ends at offset p" (the host scan_all_ends
        contract).  The DFA should be non-dying (break_at_match off) for
        full-corpus semantics; dying DFAs still stitch correctly because
        DEAD is absorbing.
        """
        d = self.d
        n = int(data.shape[0])
        if n == 0:
            s0 = int(jax.device_get(d.starts)[CTX_SOT])
            eoi = bool(jax.device_get(d.match_eoi)[s0, CTX_SOT])
            return np.array([eoi]), s0

        L, T, W = _plan_geometry(n)
        pad = L * T - n
        cls_all = d.classes[data]
        cls_pad = jnp.pad(cls_all, (0, pad))
        chunks = cls_pad.reshape(L, T)
        if W > 0:
            warm = jnp.roll(chunks, 1, axis=0)[:, T - W:]
            xs = jnp.concatenate([warm, chunks], axis=1)  # [L, W+T]
        else:
            xs = chunks
        n_steps = W + T

        # contexts of the byte preceding each warmup region
        starts_np = np.arange(L) * T
        ctx_pos = starts_np - W - 1
        data_np = None
        # compute guessed entry states: start table indexed by byte context
        prev_idx = jnp.asarray(np.maximum(ctx_pos, 0), dtype=jnp.int32)
        prev_bytes = data[prev_idx]
        ctxs = byte_context(None, prev_bytes)
        ctxs = jnp.where(jnp.asarray(ctx_pos) < 0, CTX_SOT, ctxs)
        guessed = d.starts[ctxs]
        sot = jnp.int32(d.starts[CTX_SOT] if sot_start is None
                        else sot_start)
        entries = guessed.at[0].set(sot)

        start_offsets = jnp.full((L,), 0, dtype=jnp.int32).at[0].set(W)
        # mark: local position of the true chunk end (for exit capture);
        # last lane's true end is n
        ends_local = np.minimum((starts_np + T), n) - starts_np + W
        marks = jnp.asarray(ends_local, dtype=jnp.int32)

        delta_flat = self.d.delta
        match_flat = self.d.match_on

        flags, exits = _chunk_scan(delta_flat, match_flat, xs, entries,
                                   start_offsets, marks, L=L, T=T, W=W,
                                   n_steps=n_steps)
        used = entries
        # fixpoint repair: lane i's entry must equal lane i-1's exit
        for _ in range(self.max_repair):
            want = jnp.concatenate([jnp.array([sot], dtype=jnp.int32),
                                    exits[:-1]])
            bad = bool(jax.device_get(jnp.any(want != used)))
            if not bad:
                break
            used = want
            so = jnp.full((L,), W, dtype=jnp.int32)
            flags, exits = _chunk_scan(delta_flat, match_flat, xs, used,
                                       so, marks, L=L, T=T, W=W,
                                       n_steps=n_steps)
        else:
            # sequential exact fallback: host scan (rare, adversarial)
            return self._host_scan(data, sot_start)

        body = np.asarray(jax.device_get(flags))[:, W:]
        out = np.zeros(n + 1, dtype=bool)
        out[:n] = body.reshape(-1)[:n]
        exit_state = int(jax.device_get(exits)[-1])
        eoi_row = np.asarray(jax.device_get(self.d.match_eoi))
        out[n] = bool(eoi_row[exit_state, CTX_SOT])
        return out, exit_state

    def _host_scan(self, data: jnp.ndarray, sot_start: Optional[int]):
        d = self.d
        dense = DenseDFA(
            delta=np.asarray(jax.device_get(d.delta)),
            match_on=np.asarray(jax.device_get(d.match_on)),
            match_eoi=np.asarray(jax.device_get(d.match_eoi)),
            starts=np.asarray(jax.device_get(d.starts)),
            classes=np.asarray(jax.device_get(d.classes)),
            anchored=False, break_at_match=False)
        arr = np.asarray(jax.device_get(data), dtype=np.uint8)
        flags = dense.scan_all_ends(arr, start_state=sot_start)
        # recompute exit state for API parity
        s = (int(dense.starts[CTX_SOT]) if sot_start is None else sot_start)
        for b in arr:
            s = dense.delta[s, dense.classes[b]]
        return flags, int(s)


# ---------------------------------------------------------------------------
# Batched anchored window scan (candidate verification)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("B", "W"))
def _window_scan(delta, match_on, match_eoi, starts_tbl, classes, data,
                 starts, n, B: int, W: int):
    """Anchored scan of W bytes from each of B start offsets.

    Returns (last_end [B] int32 global end offset or -1,
             alive [B] bool — state still live at window end inside text).
    """
    # entry contexts from the byte before each start
    prev_idx = jnp.maximum(starts - 1, 0)
    prev_b = data[prev_idx]
    ctxs = byte_context(None, prev_b)
    ctxs = jnp.where(starts == 0, CTX_SOT, ctxs)
    state = starts_tbl[ctxs]

    idx = starts[:, None] + jnp.arange(W)[None, :]          # [B, W]
    in_text = idx < n
    bytes_w = data[jnp.minimum(idx, n - 1)]
    cls_w = classes[bytes_w]                                 # [B, W]

    def step(carry, xs):
        st, last = carry
        c, valid, pos = xs  # [B]
        at_eoi = ~valid & (pos == n) & (st != DEAD)
        eoi_flag = match_eoi[st, CTX_SOT] & at_eoi
        flag = match_on[st, c] & valid
        last = jnp.where(flag | eoi_flag, pos, last)
        nxt = jnp.where(valid, delta[st, c], DEAD)
        return (nxt, last), None

    pos_grid = idx.T                                         # [W, B]
    (fin_state, last), _ = jax.lax.scan(
        step, (state, jnp.full((B,), -1, dtype=jnp.int32)),
        (cls_w.T, in_text.T, pos_grid), length=W)
    # EOI exactly at window end
    end_pos = starts + W
    at_eoi_end = (end_pos == n) & (fin_state != DEAD)
    eoi_flag = match_eoi[fin_state, CTX_SOT] & at_eoi_end
    last = jnp.where(eoi_flag, end_pos, last)
    alive = (fin_state != DEAD) & (end_pos < n)
    return last, alive


@functools.partial(jax.jit, static_argnames=("B", "W"))
def _window_scan_flags(delta, match_on, match_eoi, starts_tbl, classes, data,
                       starts, n, edge_limit, B: int, W: int):
    """Like _window_scan but returns the full per-position flag bitmap
    [B, W+1] (flag[t] == match end at starts+t; column W == flag exactly at
    window edge) plus alive.  `edge_limit` bounds the scan per lane: the
    lane is cut at global position edge_limit[b] with the window-edge
    context taken from the byte at that position (bounded reverse scans)."""
    prev_idx = jnp.maximum(starts - 1, 0)
    prev_b = data[prev_idx]
    ctxs = byte_context(None, prev_b)
    ctxs = jnp.where(starts == 0, CTX_SOT, ctxs)
    state = starts_tbl[ctxs]

    idx = starts[:, None] + jnp.arange(W)[None, :]
    valid = (idx < n) & (idx < edge_limit[:, None])
    bytes_w = data[jnp.minimum(idx, n - 1)]
    cls_w = classes[bytes_w]

    # context at each lane's cut position (for edge flags)
    cut = jnp.minimum(edge_limit, n)
    cut_b = data[jnp.minimum(cut, n - 1)]
    cut_ctx = jnp.where(cut >= n, CTX_SOT, byte_context(None, cut_b))

    def step(carry, xs):
        st = carry
        c, v, pos = xs
        at_cut = ~v & (pos == cut) & (st != DEAD)
        flag = (match_on[st, c] & v) | (match_eoi[st, cut_ctx] & at_cut)
        nxt = jnp.where(v, delta[st, c], DEAD)
        return nxt, flag

    (fin_state), flags = jax.lax.scan(
        step, state, (cls_w.T, valid.T, idx.T), length=W)
    end_pos = starts + W
    at_cut_end = (end_pos == cut) & (fin_state != DEAD)
    edge_flag = match_eoi[fin_state, cut_ctx] & at_cut_end
    alive = (fin_state != DEAD) & (end_pos < cut)
    return jnp.concatenate([flags.T, edge_flag[:, None]], axis=1), alive


class WindowScanner:
    """Batched anchored verification: leftmost-first end from each start
    (anchored_last_end analogue), with geometric window escalation."""

    def __init__(self, ddfa: DeviceDFA, init_window: int = 64,
                 max_window: int = 1 << 22):
        self.d = ddfa
        self.init_window = init_window
        self.max_window = max_window

    def ends_for_starts(self, data: jnp.ndarray, starts: np.ndarray
                        ) -> np.ndarray:
        """For each start offset, the leftmost-first anchored match end
        (global offset) or -1."""
        n = int(data.shape[0])
        if len(starts) == 0:
            return np.empty(0, dtype=np.int64)
        d = self.d
        ends = np.full(len(starts), -1, dtype=np.int64)
        todo = np.arange(len(starts))
        W = self.init_window
        cur_starts = np.asarray(starts, dtype=np.int64)
        while len(todo):
            B = 1 << max(0, (len(todo) - 1)).bit_length()
            sb = np.zeros(B, dtype=np.int32)
            sb[:len(todo)] = cur_starts[todo]
            last, alive = _window_scan(
                d.delta, d.match_on, d.match_eoi, d.starts, d.classes,
                data, jnp.asarray(sb), jnp.int32(n), B=B, W=min(W, n + 1))
            last = np.asarray(jax.device_get(last))[:len(todo)]
            alive = np.asarray(jax.device_get(alive))[:len(todo)]
            ends[todo] = last
            still = alive & (W < self.max_window) & (W <= n)
            todo = todo[still]
            W *= 4
        return ends
