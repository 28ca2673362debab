"""Worker for the cross-process TP-SHARDED INDEX test.

Unlike distributed_worker.py (data-parallel: replicated index, split
reads), here the INDEX ITSELF is sharded across processes: 2 ranks x 2
local CPU devices = a 4-device global mesh, the minimizer index's text
and tables shard over tp=4, so each process physically holds only HALF
the index -- the layout that lets a pangenome index exceed one host's
memory (SURVEY.md section 2.5; BASELINE configs[4]). The sharded locate
compiles as ONE cross-process SPMD program whose psum-combined answers
must equal the host oracle on every read.

Launched as `python tests/distributed_tp_worker.py PID NPROC PORT`.
"""

import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from finito_tpu.utils import relax_cpu_collective_timeouts

    relax_cpu_collective_timeouts()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from finito_tpu.parallel import distributed as dist

    dist.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.device_count() == 2 * nproc

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from finito_tpu.io.seqdb import decode_seq
    from finito_tpu.parallel.mesh import (
        ShardedMinimizerIndex,
        make_mesh,
        sharded_minimizer_locate_fn,
    )
    from tests.test_device_engine import build_index, gen_dspss

    tp = 2 * nproc
    rng = np.random.default_rng(123)  # same seed on every rank
    k = 8
    unitigs = gen_dspss(rng, 30, 20, 60, k)
    index = build_index(unitigs, k)
    concat = np.asarray(index.unitigs.concat)
    ends = np.asarray(index.unitigs.ends, dtype=np.int64)
    sh = ShardedMinimizerIndex.build(concat, ends, k, tp=tp)
    mesh = make_mesh(tp, tp=tp)

    # the index is REALLY split across processes: this rank's devices
    # hold exactly 2 of the tp=4 text shards
    probe = jax.device_put(
        sh.text_arr, NamedSharding(mesh, P("tp", *([None] * (sh.text_arr.ndim - 1))))
    )
    local_rows = sum(s.data.shape[0] for s in probe.addressable_shards)
    assert local_rows * nproc == sh.text_arr.shape[0], (
        local_rows, sh.text_arr.shape)

    B, L = 16, 40
    reads = np.zeros((B, L), np.uint8)
    for b in range(B):
        if b % 2 == 0 and concat.size > L:
            a = int(rng.integers(0, concat.size - L))
            reads[b] = concat[a : a + L]  # in-text (may straddle unitig ends)
        else:
            reads[b] = rng.integers(0, 4, size=L)

    W = L - k + 1
    locate = sharded_minimizer_locate_fn(mesh, sh, K_slow=B * W)
    uid, off, _ = locate(reads)
    uid = np.asarray(jax.device_get(uid.addressable_data(0)))
    off = np.asarray(jax.device_get(off.addressable_data(0)))

    n_found = 0
    for b in range(B):
        exp = index.search(decode_seq(reads[b])).local_offsets
        got = [(int(uid[b, w]), int(off[b, w])) for w in range(W)]
        assert got == exp, f"rank{pid}: mismatch read {b}"
        n_found += sum(1 for u, _ in exp if u >= 0)
    assert n_found > 0, "test must exercise found k-mers"
    print(f"rank{pid}: tp-sharded locate verified ({n_found} found windows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
