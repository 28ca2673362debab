"""Worker process for the REAL 2-process jax.distributed test.

Launched by tests/test_distributed.py::test_two_process_jax_distributed
as `python tests/distributed_worker.py PID NPROC PORT OUT`. Each rank:

  * forces CPU with 2 local virtual devices,
  * joins the localhost coordinator via jax.distributed.initialize,
  * asserts the GLOBAL device view (2 * nproc devices) -- proof the
    distributed backend actually connected,
  * builds the same deterministic index, runs its contiguous read
    slice, writes its part, and rank 0 merges after a real cross-
    process barrier (multihost_utils.sync_global_devices).

Output-parity contract: one line per read in input order, byte-equal to
a single-process run (ref: /root/reference/include/search_fmin.hh:54-65).
"""

import os
import sys


def main() -> int:
    pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from finito_tpu.utils import relax_cpu_collective_timeouts

    relax_cpu_collective_timeouts()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from finito_tpu.parallel import distributed as dist

    got_pid, got_np = dist.init_distributed(f"localhost:{port}", nproc, pid)
    assert (got_pid, got_np) == (pid, nproc), (got_pid, got_np)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 2
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np

    from finito_tpu.query.engine import DeviceQueryEngine
    from tests.test_device_engine import build_index, gen_dspss

    rng = np.random.default_rng(99)  # same seed on every rank
    k = 6
    unitigs = gen_dspss(rng, 12, 10, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    reads = []
    for _ in range(25):
        if rng.random() < 0.5:
            reads.append(unitigs[int(rng.integers(len(unitigs)))].encode())
        else:
            reads.append(
                "".join(rng.choice(list("ACGT"), int(rng.integers(k, 30)))).encode()
            )

    dist.run_distributed_queries(engine, reads, out, pid, nproc, barrier=True)
    # after the in-call merged barrier the final file must exist for ALL ranks
    assert os.path.exists(out)
    if pid == 0:
        sys.stdout.write("rank0: merged\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
