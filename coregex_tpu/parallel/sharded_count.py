"""Multi-chip exact Go-count: the CountDFA transducer under shard_map.

The count transducer (dfa/countdfa.py) turns the whole FindAll restart
loop into one weighted DFA, so the exact Go match count distributes the
same way a plain DFA scan does (parallel/shard.py two-phase scheme):

  phase 1 — each device scans its corpus shard once, computing BOTH the
            shard's state-transfer function F: S -> S AND the per-entry-
            state emission totals E: S -> int (how many matches the shard
            commits if entered in state s);
  phase 2 — transfer functions all_gather over ICI; each device folds its
            predecessors' F to find its true entry state, selects E[entry],
            and the counts psum.  One collective, no rescan: because
            phase 1 enumerates ALL S entry states, the second pass of the
            plain-DFA scheme collapses into a table lookup.

The tail of a corpus not divisible by the mesh size is finished on host
from the folded final state (a < ndev-byte walk), so arbitrary lengths are
exact.  This is the sequence-parallel path Engine.count takes when more
than one device is visible (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..dfa.countdfa import CountDFA
from ..dfa.dense import CTX_SOT


class ShardedGoCount:
    """Per-(pattern, mesh) compiled sharded counter."""

    def __init__(self, cd: CountDFA, mesh: Mesh, axis: str = "data"):
        self.cd = cd
        self.mesh = mesh
        self.axis = axis
        self.ndev = int(mesh.shape[axis])
        S = cd.num_states
        delta = jnp.asarray(cd.delta.astype(np.int32))
        emit = jnp.asarray(cd.emit.astype(np.int32))
        classes = jnp.asarray(cd.classes.astype(np.int32))
        ndev = self.ndev

        def body(data_shard, delta, emit, classes):
            my = jax.lax.axis_index(axis)
            cls = classes[data_shard]

            # phase 1: joint (transfer fn, per-entry emission totals)
            def step(carry, c):
                F, E = carry
                E = E + emit[F, c]
                return (delta[F, c], E), None

            F0 = jnp.arange(S, dtype=jnp.int32)
            E0 = jnp.zeros((S,), jnp.int32)
            (F, E), _ = jax.lax.scan(step, (F0, E0), cls, unroll=4)
            Fs = jax.lax.all_gather(F, axis)          # [D, S]
            Es = jax.lax.all_gather(E, axis)          # [D, S]

            # phase 2: fold predecessors' transfer functions
            sot = jnp.int32(self.cd.starts[CTX_SOT])

            def fold(d, e):
                return jnp.where(d < my, Fs[d][e], e)
            entry = jax.lax.fori_loop(0, ndev, fold, sot)
            my_count = E[entry]
            # final state of the whole (sharded) prefix, for the host tail
            fin = jax.lax.fori_loop(0, ndev, lambda d, e: Fs[d][e], sot)
            total = jax.lax.psum(my_count, axis)
            return total[None], fin[None]

        smapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(), P(), P()),
            out_specs=(P(axis), P(axis)),
            check_vma=False)

        @jax.jit
        def run(data):
            tot, fin = smapped(data, delta, emit, classes)
            return tot[0], fin[0]

        self._run = run

    def count(self, data: np.ndarray) -> int:
        """Exact Go match count of `data` (host uint8 array)."""
        n = len(data)
        cd = self.cd
        if n == 0:
            return int(cd.eoi_commits[int(cd.starts[CTX_SOT]), CTX_SOT])
        cut = (n // self.ndev) * self.ndev
        if cut == 0:
            return cd.count_scan(data)
        total, fin = jax.device_get(self._run(jnp.asarray(data[:cut])))
        total, s = int(total), int(fin)
        # host tail: < ndev bytes from the exact folded state
        for c in cd.classes[np.asarray(data[cut:], dtype=np.uint8)]:
            total += int(cd.emit[s, c])
            s = cd.delta[s, c]
        return total + int(cd.eoi_commits[s, CTX_SOT])
