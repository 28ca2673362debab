"""Pipeline-composition test at pangenome shape: variant genomes ->
native canonical unitigs (dbg) -> finimizer index -> tp-shard-local
device index -> sharded mesh locate vs the host oracle.

CI-sized twin of scripts/pangenome_verify.py (which runs the same
composition at 40+ Mbp input).
"""

from __future__ import annotations

import numpy as np

from finito_tpu.dbg import build_unitigs
from finito_tpu.index.builder import FinimizerIndexBuilder
from finito_tpu.io.seqdb import SeqDB, decode_seq
from finito_tpu.parallel.mesh import (
    ShardedMinimizerIndex,
    make_mesh,
    sharded_minimizer_locate_fn,
)
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array


def test_pangenome_composition_sharded_vs_oracle():
    rng = np.random.default_rng(77)
    k, L, tp = 31, 96, 2
    base = rng.integers(0, 4, size=30_000, dtype=np.uint8)
    genomes = [base]
    for _ in range(3):
        v = base.copy()
        pos = rng.choice(v.size, size=60, replace=False)
        v[pos] = (v[pos] + rng.integers(1, 4, size=60)) % 4
        genomes.append(v)

    unitigs = build_unitigs(genomes, k, canonical=True)
    n_kmers = sum(u.size - k + 1 for u in unitigs)
    # pangenome compression: far fewer distinct k-mers than input bases
    assert n_kmers < sum(g.size for g in genomes) // 2

    useqs = [decode_seq(u) for u in unitigs]
    sbwt, node_keys = build_plain_matrix_sbwt(useqs, k, return_keys=True)
    index = FinimizerIndexBuilder(
        sbwt, lcs_array(sbwt), SeqDB.from_sequences(useqs), node_keys=node_keys
    ).get_index()

    concat = np.asarray(index.unitigs.concat)
    ends = np.asarray(index.unitigs.ends, dtype=np.int64)
    sh = ShardedMinimizerIndex.build(concat, ends, k, tp=tp)
    mesh = make_mesh(tp, tp=tp)
    W = L - k + 1
    B = 16
    starts = rng.integers(0, base.size - L, size=B)
    gsel = rng.integers(0, len(genomes), size=B)
    reads = np.stack([genomes[g][s : s + L] for g, s in zip(gsel, starts)])
    locate = sharded_minimizer_locate_fn(mesh, sh, K_slow=B * W)
    uid, off, _ = locate(reads)
    uid, off = np.asarray(uid), np.asarray(off)
    for b in range(B):
        exp = index.search(decode_seq(reads[b])).local_offsets
        got = [(int(uid[b, w]), int(off[b, w])) for w in range(W)]
        assert got == exp, f"read {b}"
