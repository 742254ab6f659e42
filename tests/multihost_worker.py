"""Worker for the multi-process distributed-count test (spawned by
tests/test_multihost.py).  Each process owns half the corpus and two
virtual CPU devices; the global mesh is 2 processes x 2 devices = 4.

argv: coordinator_address num_processes process_id out_path
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from coregex_tpu.parallel import distributed as dist

    ok = dist.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)
    assert ok and jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc

    from coregex_tpu.dfa.determinize import determinize
    from coregex_tpu.nfa.thompson import compile_nfa
    from coregex_tpu.ops.dfa_scan import DeviceDFA
    from coregex_tpu.syntax.parser import parse

    pattern = r"\d+\.\d+"
    nfa = compile_nfa(parse(pattern), with_captures=False)
    dense = determinize(nfa, anchored=False, break_at_match=False)
    ddfa = DeviceDFA.from_dense(dense)

    rng = np.random.default_rng(7)
    n = 32_768
    corpus = rng.choice(list(b"ab 12.5 cd 3.14.15 x\n"),
                        size=n).astype(np.uint8)
    shard = n // nproc
    local = corpus[pid * shard:(pid + 1) * shard]

    mesh = dist.global_mesh()
    got = dist.distributed_count(ddfa, local, mesh=mesh)
    exp = int(dense.scan_all_ends(corpus).sum())

    with open(out_path, "w") as f:
        f.write(f"{got} {exp}\n")
    assert got == exp, f"process {pid}: {got} != {exp}"


if __name__ == "__main__":
    main()
