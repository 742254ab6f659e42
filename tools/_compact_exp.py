"""Experimental parameterized stream-compaction kernel (profiling rig).

A parameterized variant of ops/compact.py's kernel used to measure, on
the real chip, where the ~70 ms/256MB goes and which levers pay:
  - do_route / do_dma: ablations (results invalid; timing only)
  - skip_empty: skip all work for hit-free blocks
  - cond_dma:  write only ceil(wrows) rows via a size ladder instead of
               the unconditional R+1-row overwrite write
  - R:         rows per block (128 -> 16K mask entries; 512 -> 64K)
  - npay:      payload arrays routed in lockstep with the positions

The winning configuration graduates into ops/compact2.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DMASK = (1 << 15) - 1


def _roll_rowmajor(x, s):
    s_row, s_lane = s // 128, s % 128

    def rollr(v, k):
        return jnp.roll(v, -k, axis=0) if k else v

    if s_lane == 0:
        return rollr(x, s_row)
    a = jnp.roll(rollr(x, s_row), -s_lane, axis=1)
    b = jnp.roll(a, -1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < 128 - s_lane, a, b)


def _rot_right_dyn_P(s):
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (((lane + s) % 128) == tgt).astype(jnp.float32)


def _rot_apply(x, P, s, R):
    def rot(v):
        lo = (v & 0xFFFF).astype(jnp.float32)
        hi = ((v >> 16) & 0xFFFF).astype(jnp.float32)
        rlo = jax.lax.dot(lo, P, precision=jax.lax.Precision.HIGHEST)
        rhi = jax.lax.dot(hi, P, precision=jax.lax.Precision.HIGHEST)
        return rlo.astype(jnp.int32) | (rhi.astype(jnp.int32) << 16)

    xr = rot(x)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    prev = jnp.roll(xr, 1, axis=0)
    y = jnp.where(lane1 < s, prev, xr)
    spill = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < s,
        xr[R - 1:R, :], 0)
    return y, spill


def make_kernel(R, npay, do_route, do_dma, skip_empty, cond_dma):
    CH = R * 128
    nbits = max(1, (CH - 1).bit_length())

    def kernel(*refs):
        # layout: mask, pay*[npay], out, pay_out*[npay], cnt, scal,
        #         carry, carry_pay*[npay], asm, asm_pay*[npay], sem
        i = 0
        mask_ref = refs[i]; i += 1
        pay_refs = refs[i:i + npay]; i += npay
        out_ref = refs[i]; i += 1
        payout_refs = refs[i:i + npay]; i += npay
        cnt_ref = refs[i]; i += 1
        scal_ref = refs[i]; i += 1
        carry_ref = refs[i]; i += 1
        carrypay_refs = refs[i:i + npay]; i += npay
        asm_ref = refs[i]; i += 1
        asmpay_refs = refs[i:i + npay]; i += npay
        sem = refs[i]

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            scal_ref[0] = 0
            scal_ref[1] = 0
            scal_ref[2] = 0
            cnt_ref[0] = 0

        m = (mask_ref[:] != 0)
        mf = m.astype(jnp.float32)
        cnt_fast = m.astype(jnp.int32).sum()

        def body():
            src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            tgt = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            triu = (src <= tgt).astype(jnp.float32)
            incl = jax.lax.dot(mf, triu,
                               precision=jax.lax.Precision.HIGHEST)
            rowsum = incl[:, 127:128]
            rs = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
            ts = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
            tril = (rs > ts).astype(jnp.float32)
            rowbase = jax.lax.dot(tril, rowsum,
                                  precision=jax.lax.Precision.HIGHEST)
            cum_excl = (rowbase + incl - mf).astype(jnp.int32)
            cnt = (rowbase[R - 1, 0] + rowsum[R - 1, 0]).astype(jnp.int32)

            flat = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
            d = jnp.where(m, flat - cum_excl, 0)
            pack = (flat << 15) | d
            pays = [p[:] for p in pay_refs]
            if do_route:
                for b in range(nbits):
                    s = 1 << b
                    moved_in = _roll_rowmajor(pack, s)
                    valid_src = flat < (CH - s)
                    src_here = valid_src & ((moved_in & _DMASK & s) != 0)
                    self_moves = (pack & _DMASK & s) != 0
                    pack = jnp.where(
                        src_here, moved_in - s,
                        jnp.where(self_moves,
                                  pack & ~jnp.int32(_DMASK), pack))
                    for k in range(npay):
                        pays[k] = jnp.where(
                            src_here, _roll_rowmajor(pays[k], s), pays[k])
            local = (pack >> 15) & _DMASK
            positions = local + pid * CH

            clen = scal_ref[0]
            P = _rot_right_dyn_P(clen)
            rot, spill = _rot_apply(positions, P, clen, R)
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            rot = jnp.where((row == 0) & (lane < clen),
                            carry_ref[0:1, :], rot)
            asm_ref[0:R, :] = rot
            asm_ref[R:R + 1, :] = spill
            for k in range(npay):
                rp, sp = _rot_apply(pays[k], P, clen, R)
                rp = jnp.where((row == 0) & (lane < clen),
                               carrypay_refs[k][0:1, :], rp)
                asmpay_refs[k][0:R, :] = rp
                asmpay_refs[k][R:R + 1, :] = sp
            total_here = clen + cnt
            wrows = total_here // 128
            new_clen = total_here % 128
            carry_ref[0:1, :] = asm_ref[pl.ds(wrows, 1), :]
            for k in range(npay):
                carrypay_refs[k][0:1, :] = asmpay_refs[k][pl.ds(wrows, 1), :]
            base_row = scal_ref[1]
            cap_rows = out_ref.shape[0]

            if do_dma and not cond_dma:
                @pl.when(base_row + R + 1 <= cap_rows)
                def _write():
                    cp = pltpu.make_async_copy(
                        asm_ref.at[0:R + 1, :],
                        out_ref.at[pl.ds(base_row, R + 1), :], sem)
                    cp.start()
                    cp.wait()
                    for k in range(npay):
                        cpk = pltpu.make_async_copy(
                            asmpay_refs[k].at[0:R + 1, :],
                            payout_refs[k].at[pl.ds(base_row, R + 1), :],
                            sem)
                        cpk.start()
                        cpk.wait()
            elif do_dma:
                # size-laddered conditional write: wrows rows live in
                # asm[0:wrows]; garbage above gets overwritten later
                for lo, W in ((0, 8), (8, 32), (32, R)):
                    @pl.when((wrows > lo) & (wrows <= W)
                             & (base_row + W <= cap_rows))
                    def _write(W=W):
                        cp = pltpu.make_async_copy(
                            asm_ref.at[0:W, :],
                            out_ref.at[pl.ds(base_row, W), :], sem)
                        cp.start()
                        cp.wait()
                        for k in range(npay):
                            cpk = pltpu.make_async_copy(
                                asmpay_refs[k].at[0:W, :],
                                payout_refs[k].at[pl.ds(base_row, W), :],
                                sem)
                            cpk.start()
                            cpk.wait()

            scal_ref[0] = new_clen
            scal_ref[1] = base_row + wrows
            scal_ref[2] = scal_ref[2] + cnt

        if skip_empty:
            @pl.when(cnt_fast > 0)
            def _run():
                body()
        else:
            body()

        @pl.when(pid == pl.num_programs(0) - 1)
        def _flush():
            n_sent = pl.num_programs(0) * CH
            fin = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                < scal_ref[0], carry_ref[0:1, :], n_sent)
            asm_ref[0:1, :] = fin
            cp2 = pltpu.make_async_copy(
                asm_ref.at[0:1, :],
                out_ref.at[pl.ds(scal_ref[1], 1), :], sem)
            cp2.start()
            cp2.wait()
            for k in range(npay):
                asmpay_refs[k][0:1, :] = carrypay_refs[k][0:1, :]
                cpk = pltpu.make_async_copy(
                    asmpay_refs[k].at[0:1, :],
                    payout_refs[k].at[pl.ds(scal_ref[1], 1), :], sem)
                cpk.start()
                cpk.wait()
            cnt_ref[0] = scal_ref[2]

    return kernel, CH


@functools.partial(
    jax.jit, static_argnames=("cap", "R", "npay", "do_route", "do_dma",
                              "skip_empty", "cond_dma", "interpret"))
def compact_exp(mask8, *pays, cap, R=128, npay=0, do_route=True,
                do_dma=True, skip_empty=False, cond_dma=False,
                interpret=False):
    n = mask8.shape[0]
    kernel, CH = make_kernel(R, npay, do_route, do_dma, skip_empty,
                             cond_dma)
    nc = n // CH
    cap_rows = -(-cap // 128) + R + 2
    grid = (nc,)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0))]
        + [pl.BlockSpec((R, 128), lambda i: (i, 0))] * npay,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * npay
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((cap_rows, 128), jnp.int32)]
        * (1 + npay)
        + [jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ] + [pltpu.VMEM((1, 128), jnp.int32)] * npay + [
            pltpu.VMEM((R + 1, 128), jnp.int32),
        ] + [pltpu.VMEM((R + 1, 128), jnp.int32)] * npay + [
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(mask8.reshape(nc * R, 128),
      *[p.reshape(nc * R, 128) for p in pays])
    out = outs[0]
    pay_out = outs[1:1 + npay]
    cnt = outs[1 + npay]
    flat = out.reshape(-1)[:cap]
    flat = jnp.where(jnp.arange(cap, dtype=jnp.int32) < cnt[0], flat,
                     jnp.int32(nc * CH))
    pflat = [p.reshape(-1)[:cap] for p in pay_out]
    return (flat, *pflat, cnt[0])
