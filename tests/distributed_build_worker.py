"""Worker for the cross-process MESH-SHARDED BUILD test.

distributed_tp_worker.py covers the QUERY path with the index split
across OS processes; this covers CONSTRUCTION: 2 ranks x 2 local CPU
devices form a 4-device global mesh and run `sharded_sbwt_build` +
`sharded_index_build` as cross-process SPMD programs. Each rank packs
only its own shards' window keys (parallel.shard_build._put_shard_blocks
skips non-addressable devices), and the assembled results must equal the
single-host builders bit-for-bit.

Launched as `python tests/distributed_build_worker.py PID NPROC PORT`.
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
    assert jax.process_count() == nproc

    import numpy as np

    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB, decode_seq
    from finito_tpu.parallel.shard_build import (
        _put_shard_blocks,
        sharded_index_build,
        sharded_sbwt_build,
    )
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    # deterministic DSPSS input, identical on every rank
    rng = np.random.default_rng(321)
    k = 9
    genome = rng.integers(0, 4, size=3000, dtype=np.uint8)
    cuts = [0]
    while cuts[-1] < genome.size - k:
        cuts.append(min(genome.size - k + 1, cuts[-1] + int(rng.integers(60, 200))))
    unitigs = [decode_seq(genome[a : b + k - 1]) for a, b in zip(cuts[:-1], cuts[1:])]

    # the staging is REALLY split: this rank only packs its own shards
    calls = []
    orig = _put_shard_blocks

    def counting(mesh, block_fn, spec):
        def wrapped(s):
            calls.append(s)
            return block_fn(s)

        return orig(mesh, wrapped, spec)

    import finito_tpu.parallel.shard_build as sb

    sb._put_shard_blocks = counting
    try:
        sbwt_mesh = sharded_sbwt_build(unitigs, k, n_devices=2 * nproc)
        index_mesh = sharded_index_build(unitigs, k, n_devices=2 * nproc)
    finally:
        sb._put_shard_blocks = orig
    my_devs = {
        i for i, d in enumerate(jax.devices()) if d.process_index == pid
    }
    assert set(calls) <= my_devs, (
        f"rank{pid} packed non-addressable shards: {sorted(set(calls) - my_devs)}"
    )

    # single-host reference (built locally on each rank)
    sbwt_host = build_plain_matrix_sbwt(unitigs, k)
    assert np.array_equal(sbwt_host.bit_rows(), sbwt_mesh.bit_rows()), (
        f"rank{pid}: mesh SBWT != host SBWT"
    )
    index_host = FinimizerIndexBuilder(
        sbwt_host, lcs_array(sbwt_host), SeqDB.from_sequences(unitigs)
    ).get_index()
    assert np.array_equal(
        np.asarray(index_mesh.fmin), np.asarray(index_host.fmin)
    ), f"rank{pid}: fmin differs"
    assert np.array_equal(
        index_mesh.global_offsets, index_host.global_offsets
    ), f"rank{pid}: global_offsets differ"
    assert np.array_equal(
        np.asarray(index_mesh.LCS), np.asarray(index_host.LCS)
    ), f"rank{pid}: LCS differs"

    # query parity through the mesh-built index
    q = unitigs[1][:40]
    assert index_mesh.search(q).local_offsets == index_host.search(q).local_offsets

    print(f"rank{pid}: cross-process mesh build verified "
          f"({sbwt_mesh.number_of_subsets()} nodes, "
          f"{len(calls)} local shard blocks packed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
