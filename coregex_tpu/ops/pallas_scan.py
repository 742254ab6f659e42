"""Pallas TPU kernel for the chunked DFA scan.

The XLA lax.scan implementation pays ~8µs of loop overhead per step; this
kernel runs the whole time loop inside one Mosaic program with the class
stream tiled through VMEM, so the per-step cost is the actual VPU work
(S×C select-accumulate per lane).

Layout: L = 8 * Lc lanes; the class stream is [TT, 8, Lc] int32 (time
major), flags come back as [TT, 8, Lc] int8.  Tables live in SMEM and are
read as scalars inside statically-unrolled select trees — no gathers, no
matmuls, pure VPU.

Exposed as scan_once(entries, offsets) with identical semantics to the
XLA path in dfa_scan._chunk_scan_full, so the warmup/repair machinery is
shared.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _kernel(delta_ref, match_ref, true_steps_ref, entries_ref, offsets_ref,
            cls_ref, flags_ref, exits_ref, state_scr,
            *, S: int, C: int, Tt: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        state_scr[:] = entries_ref[:]

    def step(t, _):
        gt = g * Tt + t
        c = cls_ref[t]                       # [8, Lc] int32
        s = state_scr[:]                     # [8, Lc] int32
        live = (gt >= offsets_ref[:]) & (gt < true_steps_ref[0])
        nxt = jnp.zeros_like(s)
        flg = jnp.zeros_like(s)
        for si in range(S):
            s_eq = s == si
            drow = jnp.zeros_like(s)
            mrow = jnp.zeros_like(s)
            for ci in range(C):
                c_eq = c == ci
                drow = jnp.where(c_eq, delta_ref[si, ci], drow)
                mrow = jnp.where(c_eq, match_ref[si, ci], mrow)
            nxt = jnp.where(s_eq, drow, nxt)
            flg = jnp.where(s_eq, mrow, flg)
        state_scr[:] = jnp.where(live, nxt, s)
        flags_ref[t] = (flg * live.astype(jnp.int32)).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, Tt, step, 0, unroll=1)
    exits_ref[:] = state_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("S", "C", "TT", "Lc", "Tt", "interpret"))
def pallas_scan_once(delta, match_on, cls_tl, entries, offsets, true_steps,
                     S: int, C: int, TT: int, Lc: int, Tt: int = 128,
                     interpret: bool = False):
    """cls_tl: [TT, 8, Lc] int32 (TT divisible by Tt); entries/offsets:
    [8, Lc] int32; true_steps: [1] int32 (steps beyond it are frozen).

    Returns (flags [TT, 8, Lc] int8, exits [8, Lc] int32)."""
    n_tiles = TT // Tt
    match_i32 = match_on.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        scratch_shapes=[pltpu.VMEM((8, Lc), jnp.int32)],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # delta [S, C]
            pl.BlockSpec(memory_space=pltpu.SMEM),      # match [S, C]
            pl.BlockSpec(memory_space=pltpu.SMEM),      # true_steps [1]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # entries
            pl.BlockSpec(memory_space=pltpu.VMEM),      # offsets
            pl.BlockSpec((Tt, 8, Lc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # cls tile
        ],
        out_specs=[
            pl.BlockSpec((Tt, 8, Lc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # flags tile
            pl.BlockSpec(memory_space=pltpu.VMEM),      # exits
        ],
    )
    kern = functools.partial(_kernel, S=S, C=C, Tt=Tt)
    flags, exits = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((TT, 8, Lc), jnp.int8),
            jax.ShapeDtypeStruct((8, Lc), jnp.int32),
        ),
        interpret=interpret,
    )(delta, match_i32, true_steps, entries, offsets, cls_tl)
    return flags, exits
