"""On-chip profiling driver for the experimental compaction kernel.

Usage: python tools/profile_compact.py VARIANT [MB] [density]
  VARIANT in {baseline, noroute, nodma, skipempty, conddma, condskip,
              r256, r512, pay1, pay2, pay1cond, check}
Each variant runs in its own process (compile failures poison the
process; see memory notes).  Prints ms per run on a mask of MB (default
256) at the given hit density (default 1/200, literal_error-like).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax

for _k, _v in (("jax_compilation_cache_dir", _CACHE),
               ("jax_persistent_cache_min_entry_size_bytes", 0),
               ("jax_persistent_cache_min_compile_time_secs", 0.5)):
    try:
        jax.config.update(_k, _v)
    except Exception:
        pass

import jax.numpy as jnp

from tools._compact_exp import compact_exp

VARIANTS = {
    "baseline": dict(),
    "noroute": dict(do_route=False),
    "nodma": dict(do_dma=False),
    "noroute_nodma": dict(do_route=False, do_dma=False),
    "skipempty": dict(skip_empty=True),
    "conddma": dict(cond_dma=True),
    "condskip": dict(cond_dma=True, skip_empty=True),
    "r256": dict(R=256),
    "r512": dict(R=512),
    "r256cond": dict(R=256, cond_dma=True, skip_empty=True),
    "r512cond": dict(R=512, cond_dma=True, skip_empty=True),
    "pay1": dict(npay=1),
    "pay2": dict(npay=2),
    "pay1cond": dict(npay=1, cond_dma=True, skip_empty=True),
    "pay2cond": dict(npay=2, cond_dma=True, skip_empty=True),
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dens = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0 / 200

    if variant == "check":
        return check()
    if variant == "prod":
        return prod()

    kw = dict(VARIANTS[variant])
    npay = kw.get("npay", 0)
    n = mb * 1024 * 1024
    rng = np.random.default_rng(11)
    mask = (rng.random(n) < dens).astype(np.int8)
    nhits = int(mask.sum())
    cap = -(-max(nhits, 16) // 16) * 16
    m_dev = jax.device_put(jnp.asarray(mask))
    pays = [jax.device_put(jnp.arange(n, dtype=jnp.int32))
            for _ in range(npay)]
    print(f"{variant}: n={n} hits={nhits} cap={cap} kw={kw}",
          file=sys.stderr)

    t0 = time.perf_counter()
    out = compact_exp(m_dev, *pays, cap=cap, **kw)
    got = int(jax.device_get(out[-1]))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s cnt={got}",
          file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compact_exp(m_dev, *pays, cap=cap, **kw)
        got = int(jax.device_get(out[-1]))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    valid = kw.get("do_route", True) and kw.get("do_dma", True)
    okstr = ""
    if valid:
        # verify against numpy on a host fetch of the first 100k entries
        k = min(100000, nhits)
        exp = np.flatnonzero(mask)[:k]
        gotpos = np.asarray(jax.device_get(out[0][:k]))
        ok = bool((gotpos == exp).all()) and got == nhits
        if npay and ok:
            gp = np.asarray(jax.device_get(out[1][:k]))
            ok = bool((gp == exp).all())  # payload==iota==position
        okstr = " ok" if ok else " MISMATCH"
    print(f"{variant}: {ms:.2f} ms ({n/1e9/(ms/1e3):.2f} GB/s)" + okstr)


def check():
    # interpret-mode correctness over random cases (CPU-safe)
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(5)
    for trial in range(8):
        R = [128, 256][trial % 2]
        CH = R * 128
        nc = int(rng.integers(1, 4))
        n = nc * CH
        dens = [0.001, 0.05, 0.5, 0.0][trial % 4]
        mask = (rng.random(n) < dens).astype(np.int8)
        pay = rng.integers(-2**31, 2**31 - 1, n, dtype=np.int32)
        nh = int(mask.sum())
        cap = max(16, -(-nh // 16) * 16 + 16)
        for kw in (dict(), dict(cond_dma=True, skip_empty=True)):
            out = compact_exp(jnp.asarray(mask), jnp.asarray(pay),
                              cap=cap, R=R, npay=1, interpret=True, **kw)
            pos, pv, cnt = (np.asarray(jax.device_get(o)) for o in out)
            exp = np.flatnonzero(mask)
            assert int(cnt) == nh, (trial, kw, int(cnt), nh)
            assert (pos[:nh] == exp).all(), (trial, kw)
            assert (pv[:nh] == pay[exp]).all(), (trial, kw)
            assert (pos[nh:] >= n).all(), (trial, kw)
        print(f"trial {trial} R={R} n={n} hits={nh}: ok")
    print("check: all ok")



def prod():
    # production-path timing: ops/compact2 on the real chip
    import jax.numpy as jnp
    from coregex_tpu.ops.compact2 import sparse_positions, compact_pay
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dens = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0 / 200
    n = mb * 1024 * 1024
    rng = np.random.default_rng(11)
    mask = (rng.random(n) < dens)
    nhits = int(mask.sum())
    cap = -(-max(nhits, 16) // 16) * 16
    m_dev = jax.device_put(jnp.asarray(mask))
    for name, fn in (("sparse", lambda: sparse_positions(m_dev, cap)),
                     ("dense", lambda: compact_pay(m_dev, (), cap))):
        t0 = time.perf_counter()
        out = fn()
        got = int(jax.device_get(out[-2]))
        print(f"  {name} compile+first: {time.perf_counter()-t0:.1f}s "
              f"cnt={got}", file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            got = int(jax.device_get(out[-2]))
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        k = min(100000, nhits)
        exp = np.flatnonzero(mask)[:k]
        gotpos = np.asarray(jax.device_get(out[0][:k]))
        ok = bool((gotpos == exp).all()) and got == nhits \
            and bool(jax.device_get(out[-1]))
        print(f"{name}: {ms:.2f} ms ({n/1e9/(ms/1e3):.2f} GB/s) "
              f"{'ok' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
