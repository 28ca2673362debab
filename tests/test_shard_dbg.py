"""Mesh-sharded unitig construction vs the host builder (bit-exact)."""

from __future__ import annotations

import numpy as np
import pytest

from finito_tpu.dbg import build_unitigs
from finito_tpu.parallel.shard_dbg import sharded_unitig_build


def _norm(unis):
    return sorted(bytes(u) for u in unis)


def _gen_pangenome(rng, base_len, n_var, snp):
    base = rng.integers(0, 4, size=base_len, dtype=np.uint8)
    out = [base]
    for _ in range(n_var):
        v = base.copy()
        pos = rng.choice(base_len, size=max(1, int(snp * base_len)), replace=False)
        v[pos] = (v[pos] + rng.integers(1, 4, size=pos.size)) % 4
        out.append(v)
    return out


@pytest.mark.parametrize("k,n_dev", [(31, 8), (5, 4), (63, 8)])
def test_sharded_equals_host(k, n_dev):
    rng = np.random.default_rng(k)
    seqs = _gen_pangenome(rng, 4000, 3, 0.01)
    host = build_unitigs(seqs, k, canonical=True)
    shard = sharded_unitig_build(seqs, k, n_devices=n_dev)
    assert _norm(shard) == _norm(host)


def test_sharded_overflow_retry():
    rng = np.random.default_rng(2)
    seqs = _gen_pangenome(rng, 3000, 2, 0.02)
    host = build_unitigs(seqs, 15, canonical=True)
    # slack so small the first successor-exchange capacity must overflow
    shard = sharded_unitig_build(seqs, 15, n_devices=8, slack=0.02)
    assert _norm(shard) == _norm(host)


def test_sharded_rejects_even_k():
    with pytest.raises(ValueError):
        sharded_unitig_build([np.zeros(20, np.uint8)], 8, n_devices=2)


def test_sharded_handles_n_splits_and_bytes_input():
    from finito_tpu.io.seqdb import encode_seq

    rng = np.random.default_rng(5)
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    with_n = s[:150] + "N" + s[150:]
    host = build_unitigs([encode_seq(with_n.encode())], 9)
    # bytes input + an embedded N (sequence split) through the mesh path
    shard = sharded_unitig_build([with_n.encode()], 9, n_devices=4)
    assert _norm(shard) == _norm(host)
