"""Replica engine stress: mutation-heavy reads exercise the drop-based
recovery loop, the SU closed form, and the branch-vs-finimizer dictionary
selection; the host oracle (exact reference algorithm) is the arbiter."""

import numpy as np
import pytest

from finito_tpu.query.engine import DeviceQueryEngine

from tests.test_device_engine import build_index, gen_dspss


@pytest.mark.parametrize("k", [4, 6, 11])
def test_replica_mutation_heavy(k):
    rng = np.random.default_rng(100 + k)
    unitigs = gen_dspss(rng, 10, max(8, k + 2), 50, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="replica")

    queries = []
    # clean substrings
    for _ in range(15):
        u = unitigs[int(rng.integers(len(unitigs)))]
        if len(u) <= k:
            continue
        a = int(rng.integers(0, len(u) - k))
        b = int(rng.integers(a + k, len(u) + 1))
        queries.append(u[a:b])
    # mutated substrings (recovery-heavy): flip several positions
    for _ in range(25):
        u = unitigs[int(rng.integers(len(unitigs)))]
        if len(u) < k + 3:
            continue
        s = list(u)
        for _m in range(1 + int(rng.integers(0, 3))):
            p = int(rng.integers(0, len(s)))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        queries.append("".join(s))
    # chimeric junctions
    for _ in range(10):
        u1 = unitigs[int(rng.integers(len(unitigs)))]
        u2 = unitigs[int(rng.integers(len(unitigs)))]
        queries.append(u1[-(k + 2) :] + u2[: k + 2])

    for q in queries:
        got = engine.search_fwd_rc(q.encode())[0]
        want = index.search(q.encode())
        assert got.local_offsets == want.local_offsets, q
        assert got.n_found == want.n_found, q


def test_replica_batched_mixed_lengths():
    rng = np.random.default_rng(77)
    k = 6
    unitigs = gen_dspss(rng, 8, 10, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="replica")
    reads = []
    for _ in range(20):
        L = int(rng.integers(k, 35))
        reads.append("".join(rng.choice(list("ACGT"), L)).encode())
    out = engine.process_reads(reads)
    for read, (f, _r) in zip(reads, out):
        want = index.search(read)
        assert f.local_offsets == want.local_offsets, read
