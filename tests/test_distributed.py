"""Multi-host orchestration: contiguous splits + rank-ordered merge must
be byte-equal to a single-process run -- simulated with N sequential
'processes' on one host, AND with a real 2-process jax.distributed run
(localhost coordinator, subprocess per rank)."""

import os
import socket
import subprocess
import sys

import numpy as np

from finito_tpu.parallel import distributed as dist
from finito_tpu.query.engine import DeviceQueryEngine

from tests.test_device_engine import build_index, gen_dspss


def test_process_slice_partition():
    for n in (0, 1, 7, 100):
        for np_ in (1, 2, 3, 8):
            spans = [dist.process_slice(n, p, np_) for p in range(np_)]
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c and b >= a


def test_distributed_equals_single(tmp_path):
    rng = np.random.default_rng(17)
    k = 6
    unitigs = gen_dspss(rng, 10, 10, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    reads = []
    for _ in range(23):
        if rng.random() < 0.5:
            u = unitigs[int(rng.integers(len(unitigs)))]
            reads.append(u.encode())
        else:
            reads.append("".join(rng.choice(list("ACGT"), int(rng.integers(k, 30)))).encode())

    single = str(tmp_path / "single.txt")
    dist.run_distributed_queries(engine, reads, single, 0, 1)

    multi = str(tmp_path / "multi.txt")
    NP = 3
    for pid in range(NP):
        dist.run_distributed_queries(engine, reads, multi, pid, NP)
    dist.merge_parts(multi, NP)

    assert open(multi).read() == open(single).read()


def test_two_process_jax_distributed(tmp_path):
    """REAL multi-process run: 2 OS processes join a localhost
    jax.distributed coordinator (2 virtual CPU devices each, 4 global),
    split the reads, sync on a cross-process barrier, and rank 0 merges.
    The merged file must byte-equal a single-process run of the same
    deterministic workload."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_multi = str(tmp_path / "multi.txt")
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out_multi],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert b"rank0: merged" in outs[0][0]

    # single-process reference of the identical deterministic workload
    from finito_tpu.query.engine import DeviceQueryEngine

    rng = np.random.default_rng(99)
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
    out_single = str(tmp_path / "single.txt")
    dist.run_distributed_queries(engine, reads, out_single, 0, 1)

    assert open(out_multi).read() == open(out_single).read()
    assert open(out_multi).read().count("\n") == 25


def test_two_process_tp_sharded_index():
    """REAL cross-process INDEX sharding: 2 OS processes form a
    4-device global mesh; the minimizer index's text/tables shard over
    tp=4 so each process holds only half the index (the
    pangenome-exceeds-one-host layout), and the sharded locate runs as
    one cross-process SPMD program verified against the host oracle
    inside each rank."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "distributed_tp_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
        assert b"tp-sharded locate verified" in so


def test_two_process_mesh_build():
    """REAL cross-process CONSTRUCTION: 2 OS processes form a 4-device
    global mesh and run sharded_sbwt_build + sharded_index_build as one
    SPMD program; each rank packs only its own shards' window keys
    (asserted inside the worker) and the result must equal the
    single-host builders bit-for-bit."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "distributed_build_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
        assert b"cross-process mesh build verified" in so
