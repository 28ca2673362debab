"""Mesh-sharded SBWT construction vs the host constructor.

The device key algebra (ops.keys_jax) is equality-tested against its
host twin (sbwt.keys), and the full sample-sort construction
(parallel.shard_build) must reproduce build_plain_matrix_sbwt
bit-exactly on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

from finito_tpu.sbwt import keys as kw
from finito_tpu.ops import keys_jax as kj


def _rand_keys(rng, n, k):
    mat = rng.integers(0, 5, size=(n, k)).astype(np.uint8)
    return mat, kw.pack_rows(mat)


@pytest.mark.parametrize("k", [4, 21, 22, 31, 43, 63])
def test_keys_jax_matches_host(k):
    rng = np.random.default_rng(k)
    n = 257
    mat, host = _rand_keys(rng, n, k)
    planes = kj.from_host(host)
    assert planes.shape == (n, kj.n_planes(k))
    # round trip
    back = kj.to_host(planes)
    for a, b in zip(back, host):
        np.testing.assert_array_equal(a, b)

    import jax.numpy as jnp

    dev = jnp.asarray(planes)
    # sort order == host colex sort order (both stable over identical keys
    # -> compare the sorted keys, not the permutation)
    got = np.asarray(jnp.take(dev, kj.argsort_rows(dev), axis=0))
    want = kj.from_host(kw.sort_keys(host))
    np.testing.assert_array_equal(got, want)
    # adjacency equality on the sorted keys
    np.testing.assert_array_equal(
        np.asarray(kj.eq_adjacent_rows(jnp.asarray(want))),
        kw.eq_adjacent(kw.sort_keys(host)),
    )
    # char-drop / mask / shift / top-char algebra
    np.testing.assert_array_equal(
        kj.to_host(np.asarray(kj.shift_right3_rows(dev)))[0],
        kw.shift_right3(host)[0],
    )
    for chars in [1, k // 2, k - 1]:
        got_m = kj.to_host(np.asarray(kj.mask_low_rows(dev, chars)))
        want_m = kw.mask_low(host, chars)
        for a, b in zip(got_m, want_m):
            np.testing.assert_array_equal(a, b)
        got_s = kj.to_host(np.asarray(kj.shift_left_rows(kj.from_host(want_m), k - chars)))
        want_s = kw.shift_left(want_m, k - chars)
        for a, b in zip(got_s, want_s):
            np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(kj.top_char_rows(dev, k)), kw.top_char(host, k)
    )


def test_keys_jax_match_rows():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    k = 19
    matR, hostR = _rand_keys(rng, 100, k)
    hostR = kw.dedup_sorted(kw.sort_keys(hostR))
    nR = hostR[0].size
    # queries: half present, half absent
    matQ, hostQ = _rand_keys(rng, 60, k)
    pick = rng.integers(0, nR, size=40)
    Q = np.concatenate([kj.from_host(hostQ), kj.from_host(hostR)[pick]])
    R = kj.from_host(hostR)
    # pad R with sentinels (vals -1)
    Rp = np.concatenate([R, np.full((13, R.shape[1]), 0xFFFFFFFF, np.uint32)])
    vals = np.concatenate([np.arange(nR, dtype=np.int32), np.full(13, -1, np.int32)])
    # sentinel query must return -1
    Qp = np.concatenate([Q, np.full((3, R.shape[1]), 0xFFFFFFFF, np.uint32)])
    got = np.asarray(kj.match_rows(jnp.asarray(Qp), jnp.asarray(Rp), jnp.asarray(vals)))
    want = np.concatenate([kw.match_into(hostQ, hostR), pick, [-1, -1, -1]])
    np.testing.assert_array_equal(got, want)


# ---------------- full mesh-sharded construction ----------------


def _host_sbwt(seqs, k):
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt

    return build_plain_matrix_sbwt(seqs, k, return_keys=True)


def _assert_sbwt_equal(got, want):
    np.testing.assert_array_equal(got.bit_rows(), want.bit_rows())
    np.testing.assert_array_equal(got.get_C_array(), want.get_C_array())
    assert got.number_of_kmers() == want.number_of_kmers()
    assert got.number_of_subsets() == want.number_of_subsets()
    assert got.get_k() == want.get_k()


@pytest.mark.parametrize("k", [5, 31, 63])
def test_sharded_sbwt_build_matches_host(k):
    from finito_tpu.parallel.shard_build import sharded_sbwt_build

    rng = np.random.default_rng(k)
    # arbitrary string set: shared k-mers across strings, shared (k-1)
    # overlaps (non-source continuation), plus standalone sources
    seqs = []
    genome = "".join(rng.choice(list("ACGT"), 3000))
    for _ in range(40):
        s = int(rng.integers(0, len(genome) - k - 60))
        seqs.append(genome[s : s + int(rng.integers(k, k + 60))].encode())
    for _ in range(8):
        seqs.append("".join(rng.choice(list("ACGT"), k + 5)).encode())
    want, want_keys = _host_sbwt(seqs, k)
    got, got_keys = sharded_sbwt_build(seqs, k, n_devices=8, return_keys=True)
    _assert_sbwt_equal(got, want)
    for a, b in zip(got_keys, want_keys):
        np.testing.assert_array_equal(a, b)


def test_sharded_sbwt_build_tiny_and_empty_shards():
    from finito_tpu.parallel.shard_build import sharded_sbwt_build

    # fewer k-mers than shards: some shards receive nothing
    seqs = [b"ACGTAC", b"TTTT"]
    want, _ = _host_sbwt(seqs, 4)
    got = sharded_sbwt_build(seqs, 4, n_devices=8)
    _assert_sbwt_equal(got, want)
    # the reference paper example
    spss = [b"GTAAGTCT", b"AGGAAA", b"ACAGG", b"GTAGG", b"AGGTA"]
    want, _ = _host_sbwt(spss, 4)
    got = sharded_sbwt_build(spss, 4, n_devices=8)
    _assert_sbwt_equal(got, want)


def test_sharded_sbwt_build_forced_overflow_retry():
    from finito_tpu.parallel.shard_build import sharded_sbwt_build

    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), 90)).encode() for _ in range(20)]
    want, _ = _host_sbwt(seqs, 11)
    # slack tiny enough that phases C-E overflow and must retry-double
    got = sharded_sbwt_build(seqs, 11, n_devices=8, slack=0.02)
    _assert_sbwt_equal(got, want)


# ---------------- mesh finimizer selection / full index build ----------------


def _host_index(spss, k):
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.lcs import lcs_array

    sbwt = build_host_sbwt(spss, k)
    return FinimizerIndexBuilder(
        sbwt, lcs_array(sbwt), SeqDB.from_sequences(spss)
    ).get_index()


def build_host_sbwt(spss, k):
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt

    return build_plain_matrix_sbwt(spss, k)


def _assert_index_equal(got, want):
    _assert_sbwt_equal(got.sbwt, want.sbwt)
    np.testing.assert_array_equal(got.LCS, want.LCS)
    np.testing.assert_array_equal(got.fmin, want.fmin)
    np.testing.assert_array_equal(got.global_offsets, want.global_offsets)
    np.testing.assert_array_equal(got.Ustart, want.Ustart)
    np.testing.assert_array_equal(
        np.asarray(got.unitigs.concat), np.asarray(want.unitigs.concat)
    )
    np.testing.assert_array_equal(
        np.asarray(got.unitigs.ends), np.asarray(want.unitigs.ends)
    )
    assert got.offsets_width == want.offsets_width


@pytest.mark.parametrize("k,n_unitigs", [(4, 6), (11, 25), (31, 12)])
def test_sharded_index_build_matches_host(k, n_unitigs):
    from tests.test_device_engine import gen_dspss
    from finito_tpu.parallel.shard_build import sharded_index_build

    rng = np.random.default_rng(100 + k)
    spss = [s.encode() for s in gen_dspss(rng, n_unitigs, k, k + 40, k)]
    want = _host_index(spss, k)
    got = sharded_index_build(spss, k, n_devices=8)
    _assert_index_equal(got, want)
    # stats parity with the host fast path's packed set
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.lcs import lcs_array

    sb = build_host_sbwt(spss, k)
    host_b = FinimizerIndexBuilder(sb, lcs_array(sb), SeqDB.from_sequences(spss))
    assert got.finimizer_stats == host_b.finimizer_stats
    # query parity on reads straddling unitig seams
    reads = []
    for _ in range(20):
        u = spss[int(rng.integers(0, len(spss)))]
        a = int(rng.integers(0, max(1, len(u) - k)))
        reads.append(u[a : a + k + 10])
    reads.append(b"A" * (k + 3))
    for r in reads:
        rw = want.search(r)
        rg = got.search(r)
        assert rw.local_offsets == rg.local_offsets
        assert rw.n_found == rg.n_found


def test_sharded_index_build_paper_example():
    from finito_tpu.parallel.shard_build import sharded_index_build

    spss = [b"GTAAGTCT", b"AGGAAA", b"ACAGG", b"GTAGG", b"AGGTA"]
    want = _host_index(spss, 4)
    got = sharded_index_build(spss, 4, n_devices=8)
    _assert_index_equal(got, want)


def test_sharded_finimizer_select_forced_reroute_overflow():
    # slack tiny enough that phase B (the overwrite-rule routing)
    # overflows and must retry-double
    from tests.test_device_engine import gen_dspss
    from finito_tpu.index.packed_strings import permute_unitigs
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.parallel.shard_build import (
        sharded_finimizer_select,
        sharded_sbwt_build,
    )
    from finito_tpu.sbwt.lcs import lcs_array

    rng = np.random.default_rng(77)
    k = 9
    spss = [s.encode() for s in gen_dspss(rng, 12, k, k + 30, k)]
    sbwt, node_keys = sharded_sbwt_build(spss, k, n_devices=8, return_keys=True)
    LCS = lcs_array(sbwt)
    packed, _ustart, _ = permute_unitigs(sbwt, SeqDB.from_sequences(spss))
    fmin, glob, _stats = sharded_finimizer_select(
        sbwt, LCS, packed, node_keys, 8, slack=0.01
    )
    want = _host_index(spss, k)
    np.testing.assert_array_equal(fmin, want.fmin)
    np.testing.assert_array_equal(
        glob[fmin == 1].astype(np.uint64), want.global_offsets
    )


def test_sharded_index_build_feeds_sharded_locate():
    """ShardedIndex.build consumes the mesh build's per-shard position
    slices (index.mesh_pos) -- no single-host build_position_table pass
    -- and must equal from_index's tables AND the host oracle's answers
    through the tp-sharded locate."""
    import jax

    from tests.test_device_engine import gen_dspss
    from finito_tpu.io.seqdb import decode_seq, encode_seq
    from finito_tpu.parallel.mesh import (
        ShardedIndex,
        make_mesh,
        sharded_locate_fn,
    )
    from finito_tpu.parallel.shard_build import sharded_index_build
    from finito_tpu.query.engine import DeviceQueryEngine

    rng = np.random.default_rng(88)
    k = 7
    spss = [s.encode() for s in gen_dspss(rng, 14, k, k + 40, k)]
    index = sharded_index_build(spss, k, n_devices=8)
    assert index.mesh_pos is not None

    tp = 2
    built = ShardedIndex.build(index, tp=tp)
    # field-for-field equality with the dense-engine-backed constructor
    eng = DeviceQueryEngine(index, mode="dense")
    ref = ShardedIndex.from_index(index, np.asarray(eng.pos_table), tp=tp)
    np.testing.assert_array_equal(built.words, ref.words)
    np.testing.assert_array_equal(built.blocks, ref.blocks)
    np.testing.assert_array_equal(built.loc_table, ref.loc_table)
    np.testing.assert_array_equal(built.node_start, ref.node_start)

    # end-to-end: tp-sharded locate over the shard-locally built tables
    mesh = make_mesh(8, tp=tp)
    locate = sharded_locate_fn(mesh, built)
    B, L = 8, 40
    reads = np.zeros((B, L), np.uint8)
    for b in range(B):
        u = encode_seq(spss[b % len(spss)])
        reads[b, : min(L, u.size)] = u[:L]
        if b % 2:
            reads[b, 5] = (reads[b, 5] + 1) % 4
    uid, off = locate(reads)
    uid, off = np.asarray(uid), np.asarray(off)
    W = L - k + 1
    for b in range(B):
        exp = index.search(decode_seq(reads[b])).local_offsets
        assert [(int(uid[b, w]), int(off[b, w])) for w in range(W)] == exp
