"""Multi-host orchestration: contiguous splits + rank-ordered merge must
be byte-equal to a single-process run (simulated with N sequential
'processes' on one host)."""

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
