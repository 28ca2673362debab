"""Differential tests: native C++ build kernels vs the NumPy fallbacks.

Every kernel in finito_tpu/native/sort_native.cpp has a pure-Python twin
(finito_tpu/sbwt/keys.py, index/builder.py, index/minimizer.py); these
tests pin them equal on randomized inputs, including the end-to-end
builder fast path with and without the native library.
"""

import os
from contextlib import contextmanager

import numpy as np
import pytest

from finito_tpu import native
from finito_tpu.sbwt import keys as kw

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@contextmanager
def no_native():
    os.environ["FINITO_NO_NATIVE"] = "1"
    try:
        yield
    finally:
        del os.environ["FINITO_NO_NATIVE"]


def test_pack_windows_matches_python():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    # 171..255 exceed the native kernel's 8-word era buffer; the wrapper
    # must route them to the NumPy path rather than overflow the stack
    for k in (2, 5, 21, 22, 31, 42, 63, 64, 100, 170, 171, 200, 255):
        a = kw.pack_windows(codes, k)
        with no_native():
            b = kw.pack_windows(codes, k)
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), k


def test_radix_argsort_stable_and_sorted_keys():
    rng = np.random.default_rng(1)
    for W, n in ((1, 20000), (2, 9000), (3, 5000), (4, 3000)):
        words = [rng.integers(0, 1 << 63, size=n).astype(np.uint64) for _ in range(W)]
        words[-1] >>= np.uint64(40)  # exercise used_bits < 64 * W
        # force TIES so stability is actually tested
        words[0] &= np.uint64(0xFF)
        ub = kw.used_bits(words)
        with no_native():
            ref = kw.sort_order(words)
        idx, sk = native.radix_argsort(words, ub, want_keys=True)
        assert np.array_equal(idx, ref)
        assert all(np.array_equal(s, w[ref]) for s, w in zip(sk, words))


def test_match_into_against_python():
    rng = np.random.default_rng(2)
    A = [rng.integers(0, 700, size=6000).astype(np.uint64) for _ in range(2)]
    B = [rng.integers(0, 700, size=900).astype(np.uint64) for _ in range(2)]
    B = kw.dedup_sorted(kw.take(B, np.lexsort(tuple(B))))
    got = kw.match_into(A, B)
    with no_native():
        ref = kw.match_into(A, B)
    assert np.array_equal(got, ref)
    assert np.any(got >= 0) and np.any(got < 0)  # both outcomes exercised


def test_match_into_unsorted_b_falls_back():
    # B not sorted-unique: the native merge-join precondition fails and
    # the lexsort path must produce the documented first-match semantics
    A = [np.array([5, 7, 5], dtype=np.uint64)]
    B = [np.array([7, 5, 5], dtype=np.uint64)]
    out = kw.match_into(A, B)
    assert out.tolist() == [1, 0, 1]


def test_scatter_max_and_unique():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 257, size=30000).astype(np.int64)
    key = rng.integers(0, 1 << 50, size=30000).astype(np.int64)
    best = np.full(257, -1, dtype=np.int64)
    ref = best.copy()
    np.maximum.at(ref, idx, key)
    assert native.scatter_max(best, idx, key)
    assert np.array_equal(best, ref)

    v = rng.integers(0, 999, size=40000).astype(np.int64)
    assert np.array_equal(native.unique_sorted_i64(v), np.unique(v))
    assert np.array_equal(
        native.argsort_u64(v.view(np.uint64)), np.argsort(v, kind="stable")
    )


def test_minimizer_build_differential():
    from finito_tpu.index.minimizer import MinimizerIndex

    rng = np.random.default_rng(4)
    ends = np.cumsum(rng.integers(5, 300, size=80)).astype(np.int64)
    concat = rng.integers(0, 4, size=int(ends[-1]), dtype=np.uint8)
    for k, m in ((31, 16), (15, 7), (63, 16), (9, 9)):
        a = MinimizerIndex.build(concat.copy(), ends.copy(), k, m)
        with no_native():
            b = MinimizerIndex.build(concat.copy(), ends.copy(), k, m)
        for f in ("desc", "occ_key", "occ_gstart", "occ_uid", "occ_off"):
            assert np.array_equal(getattr(a, f), getattr(b, f)), (k, m, f)


def test_minimizer_build_repeat_heavy():
    # low-entropy text: repeated minimizer values (saturated slots) and
    # boundary-only unitigs must agree between the deque and numpy paths
    from finito_tpu.index.minimizer import MinimizerIndex

    rng = np.random.default_rng(5)
    ends = np.cumsum(rng.integers(3, 120, size=50)).astype(np.int64)
    concat = rng.integers(0, 2, size=int(ends[-1]), dtype=np.uint8)  # AC only
    a = MinimizerIndex.build(concat.copy(), ends.copy(), 11, 5)
    with no_native():
        b = MinimizerIndex.build(concat.copy(), ends.copy(), 11, 5)
    for f in ("desc", "occ_key", "occ_gstart", "occ_uid", "occ_off"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f


def test_builder_fast_path_differential():
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB, decode_seq
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    for seed, k, glen in ((1, 17, 15000), (2, 31, 20000), (3, 5, 2000)):
        rng = np.random.default_rng(seed)
        genome = rng.integers(0, 4, size=glen, dtype=np.uint8)
        cuts = [0]
        while cuts[-1] < genome.size - k:
            cuts.append(
                min(genome.size - k + 1, cuts[-1] + int(rng.integers(50, 400)))
            )
        unitigs = [decode_seq(genome[a:b + k - 1]) for a, b in zip(cuts[:-1], cuts[1:])]
        sbwt, node_keys = build_plain_matrix_sbwt(unitigs, k, return_keys=True)
        LCS = lcs_array(sbwt)
        db = SeqDB.from_sequences(unitigs)
        b_nat = FinimizerIndexBuilder(sbwt, LCS, db, node_keys=node_keys)
        with no_native():
            b_py = FinimizerIndexBuilder(sbwt, LCS, db, node_keys=node_keys)
        for name in ("fmin", "global_offsets", "Ustart"):
            assert np.array_equal(
                np.asarray(getattr(b_nat.get_index(), name)),
                np.asarray(getattr(b_py.get_index(), name)),
            ), (seed, name)
        assert b_nat.finimizer_stats == b_py.finimizer_stats
        n, sf, sl = b_nat.finimizer_stats.stats_sums()
        tuples = set(b_nat.finimizer_stats)
        assert (n, sf, sl) == (
            len(tuples),
            sum(x[1] for x in tuples),
            sum(x[0] for x in tuples),
        )


def test_sbwt_construction_differential():
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt

    rng = np.random.default_rng(6)
    seqs = [
        rng.choice(np.frombuffer(b"ACGT", np.uint8), size=int(rng.integers(10, 400))).tobytes()
        for _ in range(40)
    ]
    for k in (4, 21, 33):
        a, ka = build_plain_matrix_sbwt(seqs, k, return_keys=True)
        with no_native():
            b, kb = build_plain_matrix_sbwt(seqs, k, return_keys=True)
        assert a.get_k() == b.get_k()
        assert np.array_equal(a.words, b.words)
        assert np.array_equal(a.C, b.C)
        assert all(np.array_equal(x, y) for x, y in zip(ka, kb))


def test_blocked_cumsum_matches_numpy():
    import jax.numpy as jnp

    from finito_tpu.ops.streaming import blocked_cumsum_i32

    rng = np.random.default_rng(9)
    for n in (1, 127, 128, 129, 255, 4096, 100_001):
        x = rng.integers(0, 3, size=n).astype(np.int32)
        got = np.asarray(blocked_cumsum_i32(jnp.asarray(x)))
        assert np.array_equal(got, np.cumsum(x)), n


def test_compact_mask_select_form():
    """The select-based compact_mask (block scatter + cummax fill +
    nth-set-bit descend) equals first-K-set-indices exactly, including
    overflow (count > K), empty masks, and non-multiple-of-32 sizes."""
    import jax.numpy as jnp

    from finito_tpu.ops.streaming import compact_mask

    rng = np.random.default_rng(11)

    def ref(mask, K):
        idx = np.flatnonzero(mask)
        out = np.full(K, -1, np.int64)
        out[: min(K, idx.size)] = idx[:K]
        return out, idx.size

    cases = [(rng.random(4096) < p, 512) for p in (0.0, 0.01, 0.1, 0.5, 1.0)]
    cases += [
        (rng.random(4097) < 0.3, 64),       # overflow + pad tail
        (np.ones(257, bool), 32),            # dense overflow
        (np.zeros(64, bool), 32),            # empty
        (np.ones(32, bool), 32),             # exactly K
        (rng.random(100_001) < 0.005, 2048),  # sparse at scale
    ]
    for mask, K in cases:
        got, n = compact_mask(jnp.asarray(mask), K)
        exp, en = ref(mask, K)
        assert int(n) == en
        assert np.array_equal(np.asarray(got), exp)
