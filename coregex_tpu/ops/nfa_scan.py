"""Bitset-NFA device scan: the DFA-overflow fallback engine.

When eager determinization overflows (dfa/determinize.py state_limit),
the reference degrades to lazy determinization with cache clears and
finally its PikeVM (dfa/lazy/lazy.go:1472-1502, nfa/pikevm.go); this
repo's former fallback was the host PikeVM alone (~MB/s).  This module
keeps the corpus scan on the TPU for those patterns (SURVEY.md §7 build
item 5):

  * NFA RANGE states become lanes of a dense activity vector; a set of
    live Thompson threads is a 0/1 vector over the S range states plus a
    match flag.
  * One byte step is
        alive  = active ∧ (lo[s] <= b <= hi[s])          (VPU compares)
        next   = (alive @ CT) > 0                        (MXU matmul)
    where CT[s] is the epsilon-closure bitset of state s's target —
    the "precomputed move masks + or-reduce" of the survey expressed as
    a boolean mat-vec so the or-reduce runs on the MXU (sums of 0/1
    terms are exactly zero iff all terms are zero, so bf16/f32 rounding
    can never flip the >0 test).
  * Unanchored search seeds the anchored start closure at every
    position (the (?s:.)*? prefix unrolled into the step), so a flag at
    boundary p means "some match ends at p" — priority-free, which is
    why this engine discovers match ENDS/STARTS (sets), never
    leftmost-first ends (priority): those are resolved by the anchored
    verify DFA when it fits, else the host PikeVM, on the sparse
    candidate set (meta/batch.py:_bitset_* pipelines).

Scope gate (checked at build): no LOOK states (word boundaries and
anchors keep the host path) and S <= MAX_BITSET_STATES.  Exactness at
lane seams comes from the same entry/exit fixpoint repair as the DFA
chunk scan; `converged` is returned honestly and callers fall back.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nfa.nfa import NFA, Kind

MAX_BITSET_STATES = 512


class LookUnsupported(Exception):
    """NFA contains LOOK assertions: bitset closure is context-free."""


def _closure(nfa: NFA, sid: int, range_id: dict) -> Tuple[set, bool]:
    """Epsilon closure of `sid`: (set of RANGE state ids, match flag).
    Raises LookUnsupported on LOOK states (context-dependent closure)."""
    seen = set()
    out: set = set()
    match = False
    stack = [sid]
    while stack:
        s = stack.pop()
        if s in seen:
            continue
        seen.add(s)
        st = nfa.states[s]
        k = st[0]
        if k == Kind.RANGE:
            out.add(range_id[s])
        elif k == Kind.MATCH:
            match = True
        elif k == Kind.SPLIT:
            stack.extend(st[1:])
        elif k == Kind.CAPTURE:
            stack.append(st[2])
        elif k == Kind.LOOK:
            raise LookUnsupported()
        # FAIL: drop
    return out, match


class DeviceBitsetNFA:
    """Device tables for the bitset scan.

    lo/hi: [S] int32 per-range byte bounds.
    ct:    [S, S+1] bf16 — row s = closure(target(s)) with column S the
           match flag.
    start: [S+1] f32 — closure(start_anchored), seeded at every byte.
    """

    def __init__(self, nfa: NFA):
        range_states = [i for i, st in enumerate(nfa.states)
                        if st[0] == Kind.RANGE]
        if len(range_states) > MAX_BITSET_STATES:
            raise LookUnsupported(
                f"{len(range_states)} range states > {MAX_BITSET_STATES}")
        rid = {s: j for j, s in enumerate(range_states)}
        S = len(range_states)
        self.S = S
        lo = np.zeros(S, dtype=np.int32)
        hi = np.zeros(S, dtype=np.int32)
        ct = np.zeros((S, S + 1), dtype=np.float32)
        for s, j in rid.items():
            st = nfa.states[s]
            lo[j], hi[j] = st[1], st[2]
            tgt_set, m = _closure(nfa, st[3], rid)
            for t in tgt_set:
                ct[j, t] = 1.0
            if m:
                ct[j, S] = 1.0
        sset, smatch = _closure(nfa, nfa.start_anchored, rid)
        start = np.zeros(S + 1, dtype=np.float32)
        for t in sset:
            start[t] = 1.0
        start[S] = 1.0 if smatch else 0.0
        self.nullable = bool(smatch)  # matches empty: callers must gate
        # bf16 on the MXU (0/1 inputs with f32 accumulation are exact);
        # CPU XLA lacks bf16 dot, so tests run the same math in f32
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
        self.dtype = dt
        self.lo = jnp.asarray(lo)
        self.hi = jnp.asarray(hi)
        self.ct = jnp.asarray(ct, dtype=dt)
        self.start = jnp.asarray(start[:S])
        self.host_start = start[:S]


def plan_bitset_geometry(n: int, S: int) -> Tuple[int, int]:
    """(L, T): L lanes of T bytes.  Lane count balances MXU batch shape
    (>=128 rows) against per-lane state memory L*S."""
    from .count_scan import size_bucket
    nb = size_bucket(max(n, 1))
    L = 256
    while L > 8 and L * 64 > nb:
        L //= 2
    T = -(-nb // L)
    T = -(-T // 64) * 64
    return L, T


@functools.partial(
    jax.jit, static_argnames=("S", "L", "T", "max_repair"))
def _bitset_scan(lo, hi, ct, start, data_u8, n, S: int, L: int, T: int,
                 max_repair: int = 4):
    """Full-corpus unanchored all-ends scan.  Returns (flags [L*T] bool —
    flag at global position p-1 set iff a match ends at boundary p —
    and converged bool)."""
    pad = L * T - data_u8.shape[0]
    chunks = jnp.pad(data_u8, (0, pad)).reshape(L, T)
    limits = jnp.clip(n - jnp.arange(L, dtype=jnp.int32) * T, 0, T)

    dt = ct.dtype
    startv = start.astype(dt)                    # [S]

    def step(active, b, live):
        """active [L,S] bf16; b [L] int32; live [L] bool."""
        ok = ((b[:, None] >= lo[None, :])
              & (b[:, None] <= hi[None, :]))
        alive = jnp.where(ok, active, 0).astype(dt)
        nxt = jnp.dot(alive, ct, preferred_element_type=jnp.float32)
        flag = (nxt[:, S] > 0) & live
        nr = (nxt[:, :S] > 0).astype(dt)
        # unanchored restart: seed the start closure at every position
        nr = jnp.maximum(nr, startv[None, :])
        act2 = jnp.where(live[:, None], nr, active)
        return act2, flag

    def scan_once(entries):
        def body(carry, xc):
            active, t = carry, xc[0]
            b = xc[1]
            live = t < limits
            act2, flag = step(active, b, live)
            return act2, flag

        xs = (jnp.arange(T, dtype=jnp.int32), chunks.T)
        exits, flags = jax.lax.scan(body, entries, xs)
        return flags, exits                      # flags [T, L]

    entries0 = jnp.broadcast_to(startv[None, :], (L, S)).astype(dt)
    flags0, exits0 = scan_once(entries0)

    lane_ids = jnp.arange(L, dtype=jnp.int32)
    real = (lane_ids * T) < n

    def want_of(exits):
        prev = jnp.concatenate([startv[None, :], exits[:-1]])
        return prev

    def differs(entries, exits):
        w = want_of(exits)
        return jnp.any(real[:, None] & (w != entries))

    def cond(stv):
        k, entries, flags, exits = stv
        return (k < max_repair) & differs(entries, exits)

    def rep(stv):
        k, entries, flags, exits = stv
        ne = want_of(exits)
        f2, e2 = scan_once(ne)
        return (k + 1, ne, f2, e2)

    k, entries, flags, exits = jax.lax.while_loop(
        cond, rep, (jnp.int32(0), entries0, flags0, exits0))
    converged = ~differs(entries, exits)
    return flags.T.reshape(L * T), converged


class BitsetNFAScanner:
    """Unanchored all-ends scan for one byte-NFA (forward or reverse).

    ends(dev, n) -> (sorted unique end boundaries np.int64, ok bool):
    boundary p in 1..n is reported iff some match ends exactly at p."""

    def __init__(self, nfa: NFA):
        self.d = DeviceBitsetNFA(nfa)
        if self.d.nullable:
            # empty matches end everywhere; the candidate set degenerates
            raise LookUnsupported("nullable pattern")

    def flags(self, dev: jnp.ndarray):
        n = int(dev.shape[0])
        L, T = plan_bitset_geometry(n, self.d.S)
        flags, conv = _bitset_scan(
            self.d.lo, self.d.hi, self.d.ct, self.d.start, dev,
            jnp.int32(n), S=self.d.S, L=L, T=T)
        return flags, conv

    def ends(self, dev: jnp.ndarray) -> Tuple[Optional[np.ndarray], bool]:
        from .bytescan import mask_positions
        n = int(dev.shape[0])
        if n == 0:
            return np.empty(0, dtype=np.int64), True
        flags, conv = self.flags(dev)
        if not bool(jax.device_get(conv)):
            return None, False
        pos = mask_positions(flags[:n])
        return pos + 1, True
