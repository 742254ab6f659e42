"""Fully-parallel single-launch count kernels (no sequential per-byte state).

Where ops/seq_scan.py steps a tiny state machine byte-by-byte (with warmup
lanes and a fixpoint repair loop), these kernels re-express the same counts
as pure data-parallel reductions over running maxima, so one launch always
yields the exact answer:

  LineScanner — "count lines containing a qualifying needle hit" (the
    LINE_SHAPE / line-set Count paths: the reference's ReverseSuffix /
    ReverseInner / MultilineReverseSuffix Count, meta/reverse_suffix.go,
    meta/reverse_inner.go, meta/reverse_suffix_multiline.go).  A line
    commits at its terminating newline iff, just before it,
       last-valid-line-start > last-newline   (anchored (?m)^prefix gate)
       last-qualifying-hit   > last-newline   (needle at offset >= plen)
    Those are three running maxima — cummax trees over word tiles, no
    sequential state.  Cross-lane stitching is exact: each lane's entry
    state only affects its first line, whose commit is computed on host
    from O(1) per-lane kernel outputs.

  HitsScanner — non-overlapping leftmost-first count of a literal set
    (the LITERAL / MULTI_LITERAL Count paths, the Teddy/memmem analogue).
    When no occurrence starts inside another occurrence's span, Go's
    count equals the raw any-hit popcount.  The kernel counts hits AND
    detects overlaps exactly (length-grouped reach cummax); on overlap
    the caller falls back to the sequential kernel.

Needle occurrence detection is the same masked-word-compare scheme as
seq_scan (4 phase plans x M words, little-endian packing); corpus tiles
and geometry are shared with ops/count_scan.py.  Scope gates match
SeqScanner.supported: NUL-free needles (zero padding must not fake hits),
len <= 13; line mode additionally newline-free needles/prefix.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .count_scan import corpus_word_tiles, plan_geometry
from .seq_scan import LEN_MAX, build_mask_tables, needle_phase_plans

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

NEG = -(1 << 30)


def _cummax0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along axis 0 (log-depth shift tree)."""
    q = x.shape[0]
    sh = 1
    while sh < q:
        x = jnp.concatenate([x[:sh], jnp.maximum(x[sh:], x[:-sh])], axis=0)
        sh *= 2
    return x


def _excl(incl: jnp.ndarray, carry: jnp.ndarray) -> jnp.ndarray:
    """Exclusive running max from the inclusive one + cross-tile carry."""
    q = incl.shape[0]
    neg = jnp.full((1,) + incl.shape[1:], NEG, dtype=incl.dtype)
    shifted = jnp.concatenate([neg, incl[:-1]], axis=0) if q > 1 else neg
    return jnp.maximum(shifted, carry[None])


# ---------------------------------------------------------------------------
# Line kernel
# ---------------------------------------------------------------------------

def _line_kernel(masks_ref, vals_ref, pnl_ref, heads_ref, tiles_ref,
                 counts_ref, lnl_ref, lp_ref, lh_ref, mpre_ref,
                 tail_scr, cnt_scr, mpre_scr, cln_scr, clp_scr,
                 clh_scr, *, J: int, M: int, Tt4: int, Lc: int,
                 anchored: bool, plen: int, nw: tuple = ()):
    """One grid step processes Tt4 word rows per lane, delayed M rows for
    needle lookahead.  All passes are vectorized over rows; only the
    4-phase unrolls are explicit."""
    g = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    jh = J  # needle slots; slot J holds the prefix when anchored

    def hit_plane(full, Q, j):
        h = None
        out = 0
        for kk in range(4):
            c = None
            # static per-(needle, phase) word count: unused trailing
            # slots (mask 0 == always true) are skipped at trace time
            for m in range(nw[j][kk] if nw else M):
                e = (full[m:m + Q] & masks_ref[j, kk, m]) \
                    == vals_ref[j, kk, m]
                c = e if c is None else (c & e)
            if c is None:
                c = jnp.ones(full.shape[1:], dtype=jnp.bool_)[None]
            out = out | jnp.where(c, 1 << kk, 0)
        return out

    def events_of(full, Q):
        """Packed events [Q,8,Lc] i32: hit kk, nl 4+kk, pfx 8+kk."""
        ev = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        base = full[:Q]
        hits = hit_plane(full, Q, 0)
        for j in range(1, jh):
            hits = hits | hit_plane(full, Q, j)
        ev = ev | hits
        for kk in range(4):
            b = (base >> (8 * kk)) & 255
            ev = ev | jnp.where(b == 10, 1 << (4 + kk), 0)
        if anchored:
            ev = ev | (hit_plane(full, Q, jh) << 8)
        return ev

    def process(full, Q, row0):
        ev = events_of(full, Q)
        rowpos = (jax.lax.broadcasted_iota(jnp.int32, (Q, 8, Lc), 0)
                  + row0) * 4
        pnl = pnl_ref[:][None]

        # pass A: per-word nl extrema -> running newline maxima
        wm_nl = jnp.full((Q, 8, Lc), NEG, dtype=jnp.int32)
        for kk in range(4):
            is_nl = ((ev >> (4 + kk)) & 1) == 1
            wm_nl = jnp.where(is_nl, rowpos + kk, wm_nl)
        incl_nl = _cummax0(wm_nl)
        excl_nl = _excl(incl_nl, cln_scr[:])

        # pass B1: line-start / qualifying-hit events (need running ln)
        ev2 = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        wm_lh = jnp.full((Q, 8, Lc), NEG, dtype=jnp.int32)
        mpre = jnp.full((Q, 8, Lc), -1, dtype=jnp.int32)
        if anchored:
            wm_lp = jnp.full((Q, 8, Lc), NEG, dtype=jnp.int32)
        ln = excl_nl
        for kk in range(4):
            pos = rowpos + kk
            hit = (ev >> kk) & 1
            is_nl = (ev >> (4 + kk)) & 1
            if anchored:
                prev_nl = jnp.where(pos == 0, pnl,
                                    (ln == pos - 1).astype(jnp.int32))
                pfx = (ev >> (8 + kk)) & 1
                lps = prev_nl & pfx
                ev2 = ev2 | (lps << (8 + kk))
                wm_lp = jnp.where(lps == 1, pos, wm_lp)
                qual = hit & (ln >= 0).astype(jnp.int32) \
                    & (pos - ln - 1 >= plen).astype(jnp.int32)
            else:
                qual = hit
            ev2 = ev2 | (qual << kk)
            wm_lh = jnp.where(qual == 1, pos, wm_lh)
            mpre = jnp.where((hit == 1) & (ln < 0), pos, mpre)
            ln = jnp.where(is_nl == 1, pos, ln)
        if anchored:
            incl_lp = _cummax0(wm_lp)
            excl_lp = _excl(incl_lp, clp_scr[:])
        incl_lh = _cummax0(wm_lh)
        excl_lh = _excl(incl_lh, clh_scr[:])

        # pass B3: commits at newline bytes
        cnt = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        ln, lh = excl_nl, excl_lh
        if anchored:
            lp = excl_lp
        for kk in range(4):
            pos = rowpos + kk
            is_nl = (ev >> (4 + kk)) & 1
            commit = is_nl & (lh > ln).astype(jnp.int32) \
                & (ln >= 0).astype(jnp.int32)
            if anchored:
                commit = commit & (lp > ln).astype(jnp.int32)
            cnt = cnt + commit
            ln = jnp.where(is_nl == 1, pos, ln)
            qual = (ev2 >> kk) & 1
            lh = jnp.where(qual == 1, pos, lh)
            if anchored:
                lps = (ev2 >> (8 + kk)) & 1
                lp = jnp.where(lps == 1, pos, lp)

        # reductions + carries
        cnt_scr[:] += cnt.sum(axis=0)
        mpre_scr[:] = jnp.maximum(mpre_scr[:], mpre.max(axis=0))
        cln_scr[:] = jnp.maximum(cln_scr[:], incl_nl[Q - 1])
        if anchored:
            clp_scr[:] = jnp.maximum(clp_scr[:], incl_lp[Q - 1])
        clh_scr[:] = jnp.maximum(clh_scr[:], incl_lh[Q - 1])

    @pl.when(g == 0)
    def _():
        tail_scr[:] = jnp.zeros_like(tail_scr)
        cnt_scr[:] = jnp.zeros_like(cnt_scr)
        mpre_scr[:] = jnp.full_like(mpre_scr, -1)
        cln_scr[:] = jnp.full_like(cln_scr, NEG)
        clp_scr[:] = jnp.full_like(clp_scr, NEG)
        clh_scr[:] = jnp.full_like(clh_scr, NEG)

    tile = tiles_ref[:]
    full = jnp.concatenate([tail_scr[:], tile], axis=0)  # [M+Tt4, 8, Lc]
    process(full, Tt4, g * Tt4 - M)
    tail_scr[:] = tile[Tt4 - M:]

    @pl.when(g == n_tiles - 1)
    def _():
        ffull = jnp.concatenate([tail_scr[:], heads_ref[:]], axis=0)
        process(ffull, M, n_tiles * Tt4 - M)
        counts_ref[:] = cnt_scr[:]
        lnl_ref[:] = cln_scr[:]
        lp_ref[:] = clp_scr[:]
        lh_ref[:] = clh_scr[:]
        mpre_ref[:] = mpre_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("J", "M", "T4", "Tt4", "Lc", "anchored", "plen",
                     "nw", "interpret"))
def _pallas_line(masks, vals, pnl, heads, tiles, J: int, M: int, T4: int,
                 Tt4: int, Lc: int, anchored: bool, plen: int,
                 nw: tuple = (), interpret: bool = False):
    n_tiles = T4 // Tt4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        scratch_shapes=[
            pltpu.VMEM((M, 8, Lc), jnp.int32),   # tail
            pltpu.VMEM((8, Lc), jnp.int32),      # count
            pltpu.VMEM((8, Lc), jnp.int32),      # max pre-e0 hit
            pltpu.VMEM((8, Lc), jnp.int32),      # carry ln
            pltpu.VMEM((8, Lc), jnp.int32),      # carry lp
            pltpu.VMEM((8, Lc), jnp.int32),      # carry lh
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # masks
            pl.BlockSpec(memory_space=pltpu.SMEM),   # vals
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pnl [8,Lc]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # heads [M,8,Lc]
            pl.BlockSpec((Tt4, 8, Lc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # tiles
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
    )
    kern = functools.partial(_line_kernel, J=J, M=M, Tt4=Tt4, Lc=Lc,
                             anchored=anchored, plen=plen, nw=nw)
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((8, Lc), jnp.int32)
                        for _ in range(5)),
        interpret=interpret,
    )(masks, vals, pnl, heads, tiles)
    return outs


def _lane_heads(tiles, M: int, L: int, Lc: int):
    """Next-lane lookahead words: heads[m, lane] = tiles[m, lane+1]."""
    flat_head = tiles[:M].reshape(M, L)
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    return jnp.where(lane_ids[None, :] == L - 1, 0,
                     jnp.roll(flat_head, -1, axis=1)).reshape(M, 8, Lc)


class LineScanner:
    """Exact single-launch line-hit count (MODE_LINE analogue).

    count(data_dev) = number of lines (newline-terminated, plus the final
    unterminated line) that contain >= 1 needle occurrence — with, in
    anchored mode, the line starting with `prefix` and the occurrence at
    offset >= len(prefix) from the line start."""

    def __init__(self, needles: Sequence[bytes], prefix: bytes = b"",
                 anchored: bool = False, interpret: bool = False):
        self.needles = [bytes(nd) for nd in needles]
        self.prefix = bytes(prefix)
        self.anchored = bool(anchored and len(prefix) > 0)
        self.plen = len(prefix) if self.anchored else 0
        self.interpret = interpret
        items = list(self.needles)
        if self.anchored:
            items = items + [self.prefix]
        kmax = max(len(x) for x in items)
        self.M = (3 + kmax + 3) // 4
        masks, vals, _ = build_mask_tables(items, self.M)
        self.masks = jnp.asarray(masks)
        self.vals = jnp.asarray(vals)
        self.J = len(self.needles)
        self.nw = tuple(tuple(len(p) for p in needle_phase_plans(x))
                        for x in items)

    @staticmethod
    def supported(needles: Sequence[bytes], prefix: bytes = b"") -> bool:
        items = [bytes(x) for x in needles] + ([bytes(prefix)]
                                               if prefix else [])
        if not items or len(items) > 64:
            return False
        return all(0 < len(x) <= LEN_MAX and 0 not in x and 10 not in x
                   for x in items)

    def count(self, data_dev: jnp.ndarray, data_host=None,
              geometry: Optional[Tuple[int, int, int, int]] = None) -> int:
        n = int(data_dev.shape[0])
        if n == 0:
            return 0
        L, T, _, Lc = geometry or plan_geometry(n, lc=512)
        T4 = T // 4
        tiles = corpus_word_tiles(data_dev, L, T)
        heads = _lane_heads(tiles, self.M, L, Lc)
        # pnl[lane] = lane's byte -1 is a newline (lane 0: SOT line start)
        lane_ids = jnp.arange(L, dtype=jnp.int32)
        prev_b = data_dev[jnp.clip(lane_ids * T - 1, 0, n - 1)]
        pnl = (prev_b == np.uint8(10)).astype(jnp.int32)
        pnl = pnl.at[0].set(1)
        # Tt4=64 halves grid steps and cummax-tree launches vs 32; the
        # stage-split probe measured hit-detection 1.5x faster at 64
        outs = _pallas_line(
            self.masks, self.vals, pnl.reshape(8, Lc), heads, tiles,
            J=self.J, M=self.M, T4=T4, Tt4=min(64, T4), Lc=Lc,
            anchored=self.anchored, plen=self.plen, nw=self.nw,
            interpret=self.interpret)
        cnt, lnl, lpe, lhe, mpre = (
            np.asarray(v).reshape(L).astype(np.int64)
            for v in jax.device_get(outs))
        return self._combine(n, L, T, cnt, lnl, lpe, lhe, mpre,
                             data_host)

    def _combine(self, n, L, T, cnt, lnl, lpe, lhe, mpre, data_host):
        """Vectorized O(L) host stitching: each lane's entry state only
        affects its first line (committed at the lane's first in-lane
        newline, which the kernel excluded), plus the final EOI line.

        Carries are running maxima of GLOBAL positions:
          ln = last newline; lp = last valid line start (anchored);
          lh = last qualifying hit.  A lane's kernel outputs contribute
        lane-local maxima; maxing stale values is harmless because every
        comparison is against a newline position that supersedes them."""
        NEGH = np.int64(-(1 << 62))
        total = int(cnt.sum())
        bases = np.arange(L, dtype=np.int64) * T
        has_nl = lnl > NEG // 2

        # exclusive running last-newline (entry_ln[i] covers lanes < i);
        # SOT sentinel is -1 (line start at position 0)
        nl_contrib = np.where(has_nl, bases + lnl, NEGH)
        incl_ln = np.maximum.accumulate(nl_contrib)
        entry_ln = np.concatenate([[NEGH], incl_ln[:-1]])
        entry_ln = np.maximum(entry_ln, -1)

        # qualifying-hit carry: in-kernel qualified hits (lhe) plus
        # first-segment hits qualified against the entry line start
        lh_contrib = np.where(lhe > NEG // 2, bases + lhe, NEGH)
        mpre_ok = (mpre >= 0) & (bases + mpre >= entry_ln + 1 + self.plen)
        lh_contrib = np.maximum(lh_contrib,
                                np.where(mpre_ok, bases + mpre, NEGH))
        incl_lh = np.maximum.accumulate(lh_contrib)
        entry_lh = np.concatenate([[NEGH], incl_lh[:-1]])

        if self.anchored:
            # valid-line-start carry: in-kernel events (lpe, which include
            # each lane's position-0 event via the pnl input)
            lp_contrib = np.where(lpe > NEG // 2, bases + lpe, NEGH)
            incl_lp = np.maximum.accumulate(lp_contrib)
            entry_lp = np.concatenate([[NEGH], incl_lp[:-1]])
            # the entry line may start at THIS lane's position 0 (previous
            # lane ended with \n): that event is in lpe[i], not entry_lp
            pb = np.asarray(data_host)
            ends = np.minimum(bases + self.plen, n)
            pnl_h = np.zeros(L, dtype=bool)
            pnl_h[0] = True
            prev_idx = np.clip(bases[1:] - 1, 0, max(n - 1, 0))
            if n > 0:
                pnl_h[1:] = pb[prev_idx] == 10
            pfx0 = np.zeros(L, dtype=bool)
            P = np.frombuffer(self.prefix, dtype=np.uint8)
            for i in range(L):
                if bases[i] + self.plen <= n and pnl_h[i] and \
                        np.array_equal(pb[bases[i]:ends[i]], P):
                    pfx0[i] = True
            lp0 = np.where(pfx0, bases, NEGH)
            valid = np.maximum(entry_lp, lp0) > entry_ln
            final_valid = incl_lp[-1] > max(int(incl_ln[-1]), -1)
        else:
            valid = np.ones(L, dtype=bool)
            final_valid = True

        # first-line commits: at each lane's first newline
        s = entry_ln + 1
        qual = (entry_lh > entry_ln) | \
               ((mpre >= 0) & (bases + mpre >= s + self.plen))
        total += int((has_nl & valid & qual).sum())

        # EOI: the final (unterminated) line commits like a newline at n
        final_ln = max(int(incl_ln[-1]), -1)
        if final_valid and int(incl_lh[-1]) > final_ln:
            total += 1
        return total


# ---------------------------------------------------------------------------
# Overlap-free multi-literal hits kernel
# ---------------------------------------------------------------------------

def _hits_kernel(masks_ref, vals_ref, heads_ref, tiles_ref,
                 counts_ref, ov_ref, fh_ref, reach_ref,
                 tail_scr, cnt_scr, ov_scr, fh_scr, crc_scr, *,
                 groups: Tuple[Tuple[int, int], ...], M: int, Tt4: int,
                 Lc: int, nw: tuple = ()):
    """groups = ((j_start, length), ...) partition of needle slots by
    length (slots [j_start, next_start) share `length`)."""
    g = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    starts = [js for js, _ in groups] + [None]

    def process(full, Q, row0):
        rowpos = (jax.lax.broadcasted_iota(jnp.int32, (Q, 8, Lc), 0)
                  + row0) * 4
        # per-kk per-group any-hit bits; reach events per word
        ev = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)    # anyhit bits 0-3
        wm_reach = jnp.full((Q, 8, Lc), NEG, dtype=jnp.int32)
        wf_hit = jnp.full((Q, 8, Lc), 1 << 30, dtype=jnp.int32)
        ghits = []
        for gi, (js, glen) in enumerate(groups):
            je = starts[gi + 1] if starts[gi + 1] is not None \
                else masks_ref.shape[0]
            gh = None
            for j in range(js, je):
                out = 0
                for kk in range(4):
                    c = None
                    # unused trailing word slots skipped at trace time
                    for m in range(nw[j][kk] if nw else M):
                        e = (full[m:m + Q] & masks_ref[j, kk, m]) \
                            == vals_ref[j, kk, m]
                        c = e if c is None else (c & e)
                    if c is None:
                        c = jnp.ones(full.shape[1:],
                                     dtype=jnp.bool_)[None]
                    out = out | jnp.where(c, 1 << kk, 0)
                gh = out if gh is None else (gh | out)
            ghits.append((gh, glen))
            ev = ev | gh
        for kk in range(4):
            for gh, glen in ghits:
                hk = ((gh >> kk) & 1) == 1
                wm_reach = jnp.where(hk, jnp.maximum(
                    wm_reach, rowpos + kk + glen - 1), wm_reach)
            anyk = ((ev >> kk) & 1) == 1
            wf_hit = jnp.where(anyk & (wf_hit == (1 << 30)),
                               rowpos + kk, wf_hit)
        # wf_hit: first hit needs min; the where above only fills empty
        # slots per kk in ascending pos order, so it is the first hit
        incl_r = _cummax0(wm_reach)
        excl_r = _excl(incl_r, crc_scr[:])
        # overlap: a hit whose position is still covered by prior reach
        ov = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        run = excl_r
        cnt = jnp.zeros((Q, 8, Lc), dtype=jnp.int32)
        for kk in range(4):
            pos = rowpos + kk
            anyk = (ev >> kk) & 1
            ov = ov | (anyk & (run >= pos).astype(jnp.int32))
            cnt = cnt + anyk
            for gh, glen in ghits:
                hk = ((gh >> kk) & 1) == 1
                run = jnp.where(hk, jnp.maximum(run, pos + glen - 1), run)
        cnt_scr[:] += cnt.sum(axis=0)
        ov_scr[:] = ov_scr[:] | (ov.max(axis=0))
        fh_scr[:] = jnp.minimum(fh_scr[:], wf_hit.min(axis=0))
        crc_scr[:] = jnp.maximum(crc_scr[:], incl_r[Q - 1])

    @pl.when(g == 0)
    def _():
        tail_scr[:] = jnp.zeros_like(tail_scr)
        cnt_scr[:] = jnp.zeros_like(cnt_scr)
        ov_scr[:] = jnp.zeros_like(ov_scr)
        fh_scr[:] = jnp.full_like(fh_scr, 1 << 30)
        crc_scr[:] = jnp.full_like(crc_scr, NEG)

    tile = tiles_ref[:]
    full = jnp.concatenate([tail_scr[:], tile], axis=0)
    process(full, Tt4, g * Tt4 - M)
    tail_scr[:] = tile[Tt4 - M:]

    @pl.when(g == n_tiles - 1)
    def _():
        ffull = jnp.concatenate([tail_scr[:], heads_ref[:]], axis=0)
        process(ffull, M, n_tiles * Tt4 - M)
        counts_ref[:] = cnt_scr[:]
        ov_ref[:] = ov_scr[:]
        fh_ref[:] = fh_scr[:]
        reach_ref[:] = crc_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("groups", "M", "T4", "Tt4", "Lc", "nw",
                     "interpret"))
def _pallas_hits(masks, vals, heads, tiles, groups, M: int, T4: int,
                 Tt4: int, Lc: int, nw: tuple = (),
                 interpret: bool = False):
    n_tiles = T4 // Tt4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        scratch_shapes=[
            pltpu.VMEM((M, 8, Lc), jnp.int32),
            pltpu.VMEM((8, Lc), jnp.int32),
            pltpu.VMEM((8, Lc), jnp.int32),
            pltpu.VMEM((8, Lc), jnp.int32),
            pltpu.VMEM((8, Lc), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt4, 8, Lc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    )
    kern = functools.partial(_hits_kernel, groups=groups, M=M, Tt4=Tt4,
                             Lc=Lc, nw=nw)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((8, Lc), jnp.int32)
                        for _ in range(4)),
        interpret=interpret,
    )(masks, vals, heads, tiles)


class HitsScanner:
    """Raw-hit count + exact overlap detection for a literal set.

    count() returns the exact Go non-overlapping count, or None when an
    actual overlap occurs in the data (caller falls back)."""

    def __init__(self, needles: Sequence[bytes], interpret: bool = False):
        # group needle slots by length (static per-kernel); order within
        # the set does not matter for any-hit counting
        nds = sorted({bytes(nd) for nd in needles}, key=len)
        self.needles = nds
        self.interpret = interpret
        kmax = max(len(x) for x in nds)
        self.M = (3 + kmax + 3) // 4
        masks, vals, _ = build_mask_tables(nds, self.M)
        self.masks = jnp.asarray(masks)
        self.vals = jnp.asarray(vals)
        self.nw = tuple(tuple(len(p) for p in needle_phase_plans(x))
                        for x in nds)
        groups: List[Tuple[int, int]] = []
        for j, nd in enumerate(nds):
            if not groups or len(nd) != groups[-1][1]:
                groups.append((j, len(nd)))
        self.groups = tuple(groups)

    @staticmethod
    def supported(needles: Sequence[bytes]) -> bool:
        items = [bytes(x) for x in needles]
        if not items or len(items) > 64:
            return False
        if len(set(items)) != len(items):
            pass  # duplicates are deduped in __init__
        # a needle that is a proper prefix of another changes which match
        # is consumed at a shared start — the raw-hit count is still the
        # position count, but the consumed span differs; conservatively
        # rely on the runtime overlap detector for that case too
        return all(0 < len(x) <= LEN_MAX and 0 not in x for x in items)

    def count(self, data_dev: jnp.ndarray,
              geometry: Optional[Tuple[int, int, int, int]] = None
              ) -> Optional[int]:
        n = int(data_dev.shape[0])
        if n == 0:
            return 0
        # prefix-of-another needles make the consumed length priority-
        # dependent; the reach cummax uses the max length so the overlap
        # check stays conservative-correct
        L, T, _, Lc = geometry or plan_geometry(n, lc=512)
        T4 = T // 4
        tiles = corpus_word_tiles(data_dev, L, T)
        heads = _lane_heads(tiles, self.M, L, Lc)
        # large needle sets keep more per-group planes live: shrink the
        # tile rows to stay inside the ~16MB scoped-VMEM budget
        import os
        J = len(self.needles)
        tt4 = int(os.environ.get("COREGEX_TPU_HITS_TT4", "0")) or \
            (64 if J <= 8 else (32 if J <= 24 else 16))
        outs = _pallas_hits(self.masks, self.vals, heads, tiles,
                            groups=self.groups, M=self.M, T4=T4,
                            Tt4=min(tt4, T4), Lc=Lc, nw=self.nw,
                            interpret=self.interpret)
        cnt, ov, fh, reach = (np.asarray(v).reshape(L).astype(np.int64)
                              for v in jax.device_get(outs))
        if ov.any():
            return None
        # cross-lane overlap: a hit's reach extending past its lane end
        # covering the next lane's first hit
        BIG = 1 << 30
        run = NEG
        for i in range(L):
            base = i * T
            if fh[i] < BIG and run >= base + fh[i]:
                return None
            if reach[i] > NEG // 2:
                run = max(run, base + reach[i])
        return int(cnt.sum())
