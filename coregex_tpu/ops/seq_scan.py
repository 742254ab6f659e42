"""Predicate-compressed sequential count kernels.

Where the CountDFA scan steps a dense table per byte, these kernels exploit
pattern shapes whose per-byte state is tiny once positional predicates are
known.  Needle occurrences are detected by masked word compares vectorized
across whole VMEM tiles (the Teddy/memmem analogue, prefilter/teddy.go and
simd/memmem.go re-expressed for the VPU); only a few boolean flags step
sequentially per byte.  Modes:

  MODE_MULTI — exact non-overlapping leftmost-first count over a literal
    alternation (priority = order).  Sequential state: a countdown to the
    current match's end.  Covers LITERAL (incl. self-overlapping literals)
    and MULTI_LITERAL counts.

  MODE_LINE — count lines containing >= 1 needle occurrence, optionally
    requiring a (?m)^prefix at the line start with the needle at offset
    >= plen.  Sequential state: {prev-byte-was-newline, line-valid,
    already-counted, offset-since-line-start}.  Covers the LINE_SHAPE
    counts (.*lit, lit.*, .*lit.*, (?m)^P.*lit...): the reference's
    ReverseSuffix / ReverseInner / MultilineReverseSuffix Count paths.

Needle masks live in SMEM as runtime values, so kernels compile per
(J needles, M words, mode) shape bucket, not per pattern.  Corpus word
tiles and the warmup + in-jit fixpoint repair scheme are shared with
ops/count_scan.py; the per-lane exit state is the packed sequential state,
so stitching is exact or honestly reports non-convergence.

Scope gates (callers fall back otherwise): needles/prefix are NUL-free
(zero padding must not fake hits), lengths <= 4*M_MAX bytes.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .count_scan import corpus_word_tiles, plan_geometry

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

MODE_MULTI = 0
MODE_LINE = 1

M_MAX = 4          # max words a phase-shifted needle may span (13+ bytes)
LEN_MAX = 4 * (M_MAX - 1) + 1


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def needle_phase_plans(needle: bytes) -> List[List[Tuple[int, int]]]:
    """Per phase kk (start byte mod 4): [(mask, value)] per word offset,
    little-endian packing."""
    plans = []
    for kk in range(4):
        mwords = (kk + len(needle) + 3) // 4
        masks = [0] * mwords
        vals = [0] * mwords
        for j, b in enumerate(needle):
            m, lane = (kk + j) // 4, (kk + j) % 4
            masks[m] |= 0xFF << (8 * lane)
            vals[m] |= b << (8 * lane)
        plans.append([(_i32(m), _i32(v)) for m, v in zip(masks, vals)])
    return plans


def build_mask_tables(needles: Sequence[bytes], M: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[J, 4, M] mask/value arrays + [J] lengths.  Unused word slots get
    mask=0/value=1 (an impossible compare disables the slot: the kernel
    ANDs (w & 0) == 1 -> False would kill the hit, so unused slots use
    mask=0/value=0 which is always True)."""
    J = len(needles)
    masks = np.zeros((J, 4, M), dtype=np.int64)
    vals = np.zeros((J, 4, M), dtype=np.int64)
    lens = np.zeros((J,), dtype=np.int32)
    for j, nd in enumerate(needles):
        assert 0 < len(nd) <= LEN_MAX and 0 not in nd
        lens[j] = len(nd)
        for kk, plan in enumerate(needle_phase_plans(nd)):
            assert len(plan) <= M
            for m, (mk, vl) in enumerate(plan):
                masks[j, kk, m] = mk
                vals[j, kk, m] = vl
    return (masks.astype(np.int32), vals.astype(np.int32), lens)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _seq_kernel(masks_ref, vals_ref, lens_ref, entries_ref, offsets_ref,
                limits_ref, warm_ref, heads_ref, tiles_ref,
                counts_ref, exits_ref, sync_ref, state_scr, cnt_scr,
                tail_scr, ev_scr, sync_scr, *, J: int, M: int, Tt4: int,
                W4: int, Lc: int, mode: int, anchored: bool, plen: int):
    g = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    D4 = M  # lookahead words = processing delay

    def events_of(full, Q):
        """Packed event plane [Q, 8, Lc] int32 from full [Q+M, 8, Lc].

        MODE_MULTI bits: hit_any at kk, winner len at 4+5kk (5 bits).
        MODE_LINE bits:  lit hit at kk, newline at 4+kk,
                         prefix-at-position at 8+kk."""
        ev = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        base = full[:Q]

        def hit(j, kk):
            h = None
            for m in range(M):
                c = (full[m:m + Q] & masks_ref[j, kk, m]) \
                    == vals_ref[j, kk, m]
                h = c if h is None else (h & c)
            return h

        # accumulate per needle so at most a handful of [Q, 8, Lc]
        # planes are live at once (J*4 live planes blow VMEM at J=32)
        if mode == MODE_MULTI:
            for kk in range(4):
                wl = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
                for j in range(J):
                    # earlier j wins: only claim where nothing won yet
                    wl = jnp.where((wl == 0) & hit(j, kk),
                                   lens_ref[j], wl)
                ev = ev | jnp.where(wl > 0, 1 << kk, 0)
                ev = ev | (wl << (4 + 5 * kk))
        else:
            jh = J - 1 if anchored else J  # last slot holds the prefix
            for kk in range(4):
                b = (base >> (8 * kk)) & 255
                any_h = hit(0, kk)
                for j in range(1, jh):
                    any_h = any_h | hit(j, kk)
                ev = ev | jnp.where(any_h, 1 << kk, 0)
                ev = ev | jnp.where(b == 10, 1 << (4 + kk), 0)
                if anchored:
                    ev = ev | jnp.where(hit(jh, kk), 1 << (8 + kk), 0)
        return ev

    def substep(state, cnt, evq, kk, live_state, live_count):
        # `commit` drives the state machine everywhere it is live (warm
        # region included, so states converge to the true process);
        # `live_count` only gates the count
        if mode == MODE_MULTI:
            cd = state
            hit = ((evq >> kk) & 1) == 1
            wl = (evq >> (4 + 5 * kk)) & 31
            commit = hit & (cd == 0)
            ncd = jnp.where(commit, wl - 1, jnp.maximum(cd - 1, 0))
            state = jnp.where(live_state, ncd, state)
            cnt = cnt + (commit & live_count).astype(jnp.int32)
            return state, cnt
        prev_nl = (state & 1) == 1
        hit = ((evq >> kk) & 1) == 1
        is_nl = ((evq >> (4 + kk)) & 1) == 1
        if not anchored and plen == 0:
            # unanchored line machine: `valid` is constant-true and the
            # since-line-start counter is unused — only prev_nl and seen
            # remain (state bits 0 and 2, same encoding as the full
            # machine so entries/exits stay comparable)
            seen = (((state >> 2) & 1) == 1) & ~prev_nl
            commit = hit & ~seen
            cnt = cnt + (commit & live_count).astype(jnp.int32)
            seen = seen | commit
            nstate = (is_nl.astype(jnp.int32)
                      | (seen.astype(jnp.int32) << 2))
            state = jnp.where(live_state, nstate, state)
            return state, cnt
        valid = ((state >> 1) & 1) == 1
        seen = ((state >> 2) & 1) == 1
        slc = (state >> 3) & 31
        if anchored:
            # NB: jnp.where over two bool vectors trips a Mosaic i8->i1
            # truncation; use boolean algebra instead
            pfx = ((evq >> (8 + kk)) & 1) == 1
            valid = (prev_nl & pfx) | (~prev_nl & valid)
        else:
            valid = valid | prev_nl
        seen = seen & ~prev_nl
        slc = jnp.where(prev_nl, 0, jnp.minimum(slc + 1, 31))
        commit = hit & valid & ~seen & (slc >= plen)
        cnt = cnt + (commit & live_count).astype(jnp.int32)
        seen = seen | commit
        nstate = (is_nl.astype(jnp.int32)
                  | (valid.astype(jnp.int32) << 1)
                  | (seen.astype(jnp.int32) << 2) | (slc << 3))
        state = jnp.where(live_state, nstate, state)
        return state, cnt

    def consume(Q, cb_base):
        """Run the sequential machine over ev_scr[0:Q]; chunk-relative
        byte index of (q=0, kk=0) is cb_base (can be negative in warm)."""
        offs = offsets_ref[:]
        lim = limits_ref[:]

        def body(q, _):
            evq = ev_scr[q]
            s = state_scr[:]
            cnt = cnt_scr[:]
            for kk in range(4):
                cb = cb_base + q * 4 + kk
                live_state = (cb >= offs - W4 * 4) & (cb < lim)
                live_count = (cb >= 0) & (cb < lim)
                s, cnt = substep(s, cnt, evq, kk, live_state, live_count)
                # snapshot the state AT the lane start (post-warmup):
                # the repair fixpoint compares this against the previous
                # lane's exit — states at the same position — so a
                # converged warmup costs no rescan
                sync_scr[:] = jnp.where(cb == -1, s, sync_scr[:])
            state_scr[:] = s
            cnt_scr[:] = cnt
            return 0

        jax.lax.fori_loop(0, Q, body, 0, unroll=1)

    @pl.when(g == 0)
    def _():
        state_scr[:] = entries_ref[:]
        cnt_scr[:] = jnp.zeros_like(cnt_scr)
        sync_scr[:] = entries_ref[:]
        warm = warm_ref[:]
        zpad = jnp.zeros((M, 8, Lc), dtype=jnp.int32)
        wfull = jnp.concatenate([warm, zpad], axis=0)
        # warm positions [0, (W4-D4)*4) — the tail is re-seen by the main
        # loop's delayed window
        Qw = W4 - D4
        if Qw > 0:
            ev_scr[0:Qw] = events_of(wfull, Qw)
            consume(Qw, -W4 * 4)
        if D4 == 0:
            sync_scr[:] = state_scr[:]
        tail_scr[:] = warm[W4 - D4:]

    # main: seq positions are delayed by D4 words behind the tile stream
    tile = tiles_ref[:]
    full = jnp.concatenate([tail_scr[:], tile], axis=0)  # [D4+Tt4, 8, Lc]
    ev_scr[0:Tt4] = events_of(full, Tt4)
    consume(Tt4, (g * Tt4 - D4) * 4)
    tail_scr[:] = tile[Tt4 - D4:]

    @pl.when(g == n_tiles - 1)
    def _():
        ffull = jnp.concatenate([tail_scr[:], heads_ref[:]], axis=0)
        ev_scr[0:D4] = events_of(ffull, D4)
        consume(D4, (n_tiles * Tt4 - D4) * 4)
        counts_ref[:] = cnt_scr[:]
        exits_ref[:] = state_scr[:]
        sync_ref[:] = sync_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("J", "M", "T4", "Tt4", "W4", "Lc", "mode",
                     "anchored", "plen", "interpret"))
def _pallas_seq_once(masks, vals, lens, tiles, warm, heads, entries,
                     offsets, limits, J: int, M: int, T4: int, Tt4: int,
                     W4: int, Lc: int, mode: int, anchored: bool,
                     plen: int, interpret: bool = False):
    n_tiles = T4 // Tt4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        scratch_shapes=[
            pltpu.VMEM((8, Lc), jnp.int32),          # state
            pltpu.VMEM((8, Lc), jnp.int32),          # count
            pltpu.VMEM((M, 8, Lc), jnp.int32),       # tail
            pltpu.VMEM((max(Tt4, 1), 8, Lc), jnp.int32),  # events
            pltpu.VMEM((8, Lc), jnp.int32),          # sync (lane entry)
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # masks [J,4,M]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # vals [J,4,M]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lens [J]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # entries
            pl.BlockSpec(memory_space=pltpu.VMEM),   # offsets
            pl.BlockSpec(memory_space=pltpu.VMEM),   # limits
            pl.BlockSpec(memory_space=pltpu.VMEM),   # warm [W4,8,Lc]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # heads [M,8,Lc]
            pl.BlockSpec((Tt4, 8, Lc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # tiles
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_seq_kernel, J=J, M=M, Tt4=Tt4, W4=W4,
                             Lc=Lc, mode=mode, anchored=anchored,
                             plen=plen)
    counts, exits, sync = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((8, Lc), jnp.int32),
            jax.ShapeDtypeStruct((8, Lc), jnp.int32),
            jax.ShapeDtypeStruct((8, Lc), jnp.int32),
        ),
        interpret=interpret,
    )(masks, vals, lens, entries, offsets, limits, warm, heads, tiles)
    return counts, exits, sync


# ---------------------------------------------------------------------------
# Full scan with repair (mirrors count_scan._count_full)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("L", "T", "W", "J", "M", "Tt4", "Lc", "mode",
                     "anchored", "plen", "max_repair", "interpret"))
def _seq_full(masks, vals, lens, data_u8, tiles, n,
              L: int, T: int, W: int, J: int, M: int, Tt4: int, Lc: int,
              mode: int, anchored: bool, plen: int, max_repair: int = 4,
              interpret: bool = False):
    T4, W4 = T // 4, W // 4
    n = jnp.int32(n)

    flat_tail = tiles[T4 - W4:].reshape(W4, L)
    warm = jnp.roll(flat_tail, 1, axis=1).reshape(W4, 8, Lc)
    flat_head = tiles[:M].reshape(M, L)
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    heads = jnp.where(lane_ids[None, :] == L - 1, 0,
                      jnp.roll(flat_head, -1, axis=1)).reshape(M, 8, Lc)

    limits = jnp.clip(n - lane_ids * T, 0, T)
    simple_line = mode == MODE_LINE and not anchored and plen == 0
    if mode == MODE_MULTI:
        guess = jnp.zeros((L,), jnp.int32)
        entry0 = jnp.zeros((), jnp.int32)
    else:
        prev_b = data_u8[jnp.clip(lane_ids * T - W - 1, 0,
                                  data_u8.shape[0] - 1)].astype(jnp.int32)
        pnl = (prev_b == 10).astype(jnp.int32)
        if simple_line:
            guess = pnl                      # bits 1/3+ unused
            entry0 = jnp.int32(1)
        else:
            base = 0 if anchored else 2      # valid=1 when no prefix gate
            guess = pnl | base | (31 << 3)
            entry0 = jnp.int32(1 | base)     # position 0 is a line start
    entries0 = guess.at[0].set(entry0)
    offsets0 = jnp.zeros((L,), jnp.int32).at[0].set(W)

    # Entry-independent lanes need no repair.  For the line machine every
    # state component (prev_nl, valid, seen, slc) is recomputed from
    # scratch at a newline, so a lane whose warmup window contains one is
    # exact whatever its entry guess was; lane 0 runs from the true start.
    if mode == MODE_LINE:
        wnl = jnp.zeros(warm.shape[1:], dtype=jnp.bool_)
        for k in range(4):
            wnl = wnl | jnp.any(((warm >> (8 * k)) & 255) == 10, axis=0)
        clean = wnl.reshape(L).at[0].set(True)
    else:
        clean = jnp.zeros((L,), dtype=jnp.bool_).at[0].set(True)

    def scan_once(entries, offsets):
        counts, exits, sync = _pallas_seq_once(
            masks, vals, lens, tiles, warm, heads,
            entries.reshape(8, Lc), offsets.reshape(8, Lc),
            limits.reshape(8, Lc), J=J, M=M, T4=T4, Tt4=Tt4, W4=W4,
            Lc=Lc, mode=mode, anchored=anchored, plen=plen,
            interpret=interpret)
        return counts.reshape(L), exits.reshape(L), sync.reshape(L)

    counts0, exits0, sync0 = scan_once(entries0, offsets0)
    real = (lane_ids * T) < n

    def want_of(exits):
        return jnp.concatenate([entry0[None], exits[:-1]])

    dirty = real & ~clean

    # compare the previous lane's exit with the POST-warmup state at
    # the lane start (same position) — comparing the pre-warmup entry
    # guess forced a spurious full rescan on nearly every run
    def cond(st):
        k, entries, counts, exits, sync = st
        return (k < max_repair) & jnp.any(
            dirty & (want_of(exits) != sync))

    def rep(st):
        k, entries, counts, exits, sync = st
        new_entries = want_of(exits)
        offs = jnp.full((L,), W, jnp.int32)
        c2, e2, s2 = scan_once(new_entries, offs)
        return (k + 1, new_entries, c2, e2, s2)

    k, entries, counts, exits, sync = jax.lax.while_loop(
        cond, rep, (jnp.int32(0), entries0, counts0, exits0, sync0))
    converged = ~jnp.any(dirty & (want_of(exits) != sync))
    return counts.sum(dtype=jnp.int32), converged


# ---------------------------------------------------------------------------
# Host reference (oracle for tests) + public entries
# ---------------------------------------------------------------------------

def multi_count_host(data: bytes, needles: Sequence[bytes]) -> int:
    """Sequential reference of MODE_MULTI (Go alternation FindAll count)."""
    n = len(data)
    pos = 0
    count = 0
    while pos < n:
        best = None
        for j, nd in enumerate(needles):
            if data.startswith(nd, pos):
                best = j
                break
        if best is not None:
            count += 1
            pos += len(needles[best])
        else:
            pos += 1
    return count


def line_count_host(data: bytes, needles, prefix: bytes,
                    anchored: bool) -> int:
    """Sequential reference of MODE_LINE (any-of needle set per line)."""
    if isinstance(needles, (bytes, bytearray)):
        needles = [bytes(needles)]
    count = 0
    for ls in _line_starts(data):
        le = data.find(b"\n", ls)
        if le < 0:
            le = len(data)
        line = data[ls:le]
        if anchored:
            if not line.startswith(prefix):
                continue
            body = line[len(prefix):]
            if any(nd in body for nd in needles):
                count += 1
        else:
            if any(nd in line for nd in needles):
                count += 1
    return count


def _line_starts(data: bytes):
    yield 0
    start = 0
    while True:
        i = data.find(b"\n", start)
        if i < 0:
            return
        yield i + 1
        start = i + 1


class SeqScanner:
    """Device pipeline for one needle-set/mode; exact counts or None on
    stitching non-convergence."""

    def __init__(self, mode: int, needles: Sequence[bytes],
                 prefix: bytes = b"", anchored: bool = False,
                 interpret: bool = False):
        self.mode = mode
        self.needles = [bytes(nd) for nd in needles]
        self.prefix = bytes(prefix)
        self.anchored = anchored
        self.interpret = interpret
        self.plen = len(prefix) if anchored else 0
        items = list(self.needles)
        if mode == MODE_LINE and anchored:
            items = items + [self.prefix]
        kmax = max(len(x) for x in items)
        self.M = min(M_MAX, (3 + kmax + 3) // 4)
        masks, vals, lens = build_mask_tables(items, self.M)
        self.masks = jnp.asarray(masks)
        self.vals = jnp.asarray(vals)
        self.lens = jnp.asarray(lens)
        self.J = len(items)

    @staticmethod
    def supported(needles: Sequence[bytes], prefix: bytes = b"",
                  line_mode: bool = False) -> bool:
        """NUL bytes would let zero padding fake hits; newlines only
        conflict with the line machine."""
        items = [bytes(x) for x in needles] + ([bytes(prefix)]
                                               if prefix else [])
        if not items or len(items) > 64:
            return False
        return all(0 < len(x) <= LEN_MAX and 0 not in x
                   and (not line_mode or 10 not in x)
                   for x in items)

    def count(self, data_dev: jnp.ndarray,
              geometry: Optional[Tuple[int, int, int, int]] = None
              ) -> Optional[int]:
        n = int(data_dev.shape[0])
        if n == 0:
            return 0
        # Lc=512/Tt4=32 keeps the event-plane temporaries (J*4 hit planes
        # of [Tt4, 8, Lc] i32) inside the 16 MB VMEM budget
        L, T, W, Lc = geometry or plan_geometry(n, lc=512, warmup=128)
        W = max(W, 4 * self.M + 4)
        W = min(W, T)
        tiles = corpus_word_tiles(data_dev, L, T)
        total, conv = jax.device_get(_seq_full(
            self.masks, self.vals, self.lens, data_dev, tiles,
            jnp.int32(n), L=L, T=T, W=W, J=self.J, M=self.M,
            Tt4=min(32, T // 4), Lc=Lc, mode=self.mode,
            anchored=self.anchored, plen=self.plen,
            interpret=self.interpret))
        if not bool(conv):
            return None
        return int(total)
