"""Minimizer seed-and-verify index: host oracle, device engine, and the
kmer-mapper-style property tests (mirrors the reference's Rust test
strategy, ref_implementation/src/minimizer_index.rs:437-610: brute-force
occurrence map as ground truth, deterministic seeds, serialize round-trip).
"""

import numpy as np
import pytest

import jax

from finito_tpu.index.builder import FinimizerIndexBuilder
from finito_tpu.index.minimizer import MinimizerIndex, pack_mvals
from finito_tpu.io.seqdb import SeqDB, encode_seq
from finito_tpu.query.engine import DeviceQueryEngine
from finito_tpu.query.minimizer_engine import DeviceMinimizerIndex, make_minimizer_locate
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array

from tests.test_device_engine import build_index, gen_dspss


def brute_force_occurrences(unitigs, k):
    """uid, offset of every k-mer (assumes each occurs at most once)."""
    table = {}
    for uid, u in enumerate(unitigs):
        for i in range(len(u) - k + 1):
            table[u[i : i + k]] = (uid, i)
    return table


def test_pack_mvals_lexicographic_order():
    # numeric compare of packed values == lexicographic compare of m-mers
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.integers(0, 4, size=6).astype(np.uint8)
        b = rng.integers(0, 4, size=6).astype(np.uint8)
        va, vb = int(pack_mvals(a, 6)[0]), int(pack_mvals(b, 6)[0])
        assert (va < vb) == (a.tobytes() < b.tobytes())


def test_host_lookup_vs_brute_force():
    rng = np.random.default_rng(7)
    k = 8
    unitigs = gen_dspss(rng, 10, 10, 60, k)
    permuted = _permuted_unitigs(unitigs, k)
    concat = np.concatenate([encode_seq(u.encode()) for u in permuted])
    ends = np.cumsum([len(u) for u in permuted])
    mi = MinimizerIndex.build(concat, ends, k)
    truth = brute_force_occurrences(permuted, k)
    # all present k-mers
    for kmer, want in truth.items():
        got = mi.lookup_kmer_host(encode_seq(kmer.encode()))
        assert got == want, kmer
    # random (mostly absent) k-mers
    for _ in range(200):
        kmer = "".join(rng.choice(list("ACGT"), k))
        got = mi.lookup_kmer_host(encode_seq(kmer.encode()))
        assert got == truth.get(kmer, (-1, -1)), kmer


def _permuted_unitigs(unitigs, k):
    """Unitig order of the built FinimizerIndex (colex of first k-mer),
    so (uid, off) answers line up with the SBWT engines."""
    index = build_index(unitigs, k)
    out = []
    start = 0
    from finito_tpu.io.seqdb import decode_seq

    for e in np.asarray(index.unitigs.ends):
        out.append(decode_seq(index.unitigs.concat[start:e]).decode())
        start = int(e)
    return out


def test_serialize_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    k = 8
    unitigs = gen_dspss(rng, 6, 12, 40, k)
    concat = np.concatenate([encode_seq(u.encode()) for u in unitigs])
    ends = np.cumsum([len(u) for u in unitigs])
    mi = MinimizerIndex.build(concat, ends, k)
    p = str(tmp_path / "idx.ftm")
    mi.serialize(p)
    mi2 = MinimizerIndex.load(p)
    assert mi2.k == mi.k and mi2.m == mi.m
    np.testing.assert_array_equal(mi2.desc, mi.desc)
    np.testing.assert_array_equal(mi2.occ_gstart, mi.occ_gstart)
    np.testing.assert_array_equal(mi2.concat, mi.concat)
    for _ in range(50):
        kmer = encode_seq("".join(rng.choice(list("ACGT"), k)).encode())
        assert mi.lookup_kmer_host(kmer) == mi2.lookup_kmer_host(kmer)


def test_minimizer_engine_matches_oracle():
    rng = np.random.default_rng(42)
    k = 6
    unitigs = gen_dspss(rng, 12, 8, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    queries = []
    for _ in range(25):
        u = unitigs[int(rng.integers(len(unitigs)))]
        if len(u) <= k:
            continue
        a = int(rng.integers(0, len(u) - k + 1))
        b = int(rng.integers(a + k, len(u) + 1))
        queries.append(u[a:b].encode())
    for _ in range(25):
        L = int(rng.integers(k, 30))
        queries.append("".join(rng.choice(list("ACGT"), L)).encode())
    for q in queries:
        f, _ = engine.search_fwd_rc(q)
        want = index.search(q)
        assert f.local_offsets == want.local_offsets, q
        assert f.n_found == want.n_found


@pytest.mark.parametrize("m", [3, 4])
def test_minimizer_slow_path_small_m(m):
    """Tiny m forces multi-occurrence buckets -> the while-loop slow path."""
    rng = np.random.default_rng(11)
    k = 8
    unitigs = gen_dspss(rng, 8, 12, 50, k)
    permuted = _permuted_unitigs(unitigs, k)
    concat = np.concatenate([encode_seq(u.encode()) for u in permuted])
    ends = np.cumsum([len(u) for u in permuted])
    mi = MinimizerIndex.build(concat, ends, k, m=m)
    assert int((mi.desc & 7).max()) >= 2, "fixture must exercise buckets >= 2"
    dmi = DeviceMinimizerIndex(mi)
    locate = make_minimizer_locate(dmi, 4096)
    truth = brute_force_occurrences(permuted, k)

    L = 40
    B = 32
    reads = np.full((B, L), 255, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int64)
    for b in range(B):
        if b % 2 == 0:
            u = permuted[int(rng.integers(len(permuted)))]
            a = int(rng.integers(0, max(1, len(u) - L)))
            s = u[a : a + L]
        else:
            s = "".join(rng.choice(list("ACGT"), int(rng.integers(k, L))))
        codes = encode_seq(s.encode())
        reads[b, : codes.size] = codes
        lens[b] = codes.size

    uid, off, n_slow = locate(reads)
    uid, off = np.asarray(uid), np.asarray(off)
    assert int(n_slow) <= 4096
    for b in range(B):
        n_win = int(lens[b]) - k + 1
        s_codes = reads[b, : lens[b]]
        s_str = "".join("ACGT"[c] for c in s_codes)
        for w in range(n_win):
            want = truth.get(s_str[w : w + k], (-1, -1))
            assert (int(uid[b, w]), int(off[b, w])) == want, (b, w)


def test_minimizer_engine_padded_and_invalid():
    rng = np.random.default_rng(5)
    k = 6
    unitigs = gen_dspss(rng, 8, 8, 30, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    reads = [b"ACGTACGTACGT", unitigs[0].encode(), b"ACG", b"ACGNACGTACG"]
    out = engine.process_reads(reads)
    for read, (f, _r) in zip(reads, out):
        assert f.local_offsets == index.search(read).local_offsets, read


@pytest.mark.parametrize("k", [33, 63])
def test_minimizer_engine_large_k(k):
    """k > 32 uses the multi-word rolling text verify."""
    rng = np.random.default_rng(200 + k)
    unitigs = gen_dspss(rng, 4, k + 5, k + 60, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    queries = []
    for u in unitigs:
        queries.append(u.encode())
        # single mutation inside a copy
        s = list(u)
        s[len(s) // 2] = "ACGT"[(("ACGT".index(s[len(s) // 2])) + 1) % 4]
        queries.append("".join(s).encode())
    queries.append("".join(rng.choice(list("ACGT"), k + 10)).encode())
    for q in queries:
        f, _ = engine.search_fwd_rc(q)
        want = index.search(q)
        assert f.local_offsets == want.local_offsets, (k, q[:20])


def test_repeat_heavy_text_saturated_slots():
    """A minimizer value selected far more than 63 times (repeats) must
    build and query exactly: the stored slot length saturates and the
    slow path derives exact ends from the next slot's start. Regression:
    the table-growth loop used to livelock (equal values share a slot at
    any table size)."""
    from finito_tpu.index.minimizer import mix32, pack_mvals

    rng = np.random.default_rng(33)
    k = 31
    # a 16-mer with a tiny selection hash: it wins as minimizer wherever
    # it appears; repeated 100x with fresh context so all 31-mers stay
    # distinct (valid DSPSS) while one bucket holds ~100 occurrences
    cands = rng.integers(0, 4, size=(4096, 16)).astype(np.uint8)
    vals = np.array([pack_mvals(c, 16)[0] for c in cands])
    M = decode_from_codes = cands[int(np.argmin(mix32(vals)))]
    from finito_tpu.io.seqdb import decode_seq

    M = decode_seq(M).decode()
    while True:
        text = "".join(
            "".join(rng.choice(list("ACGT"), 40)) + M for _ in range(100)
        )
        kmers = {text[i : i + k] for i in range(len(text) - k + 1)}
        if len(kmers) == len(text) - k + 1:
            break
    unitigs = [text]
    index = build_index(unitigs, k)
    mi = MinimizerIndex.from_finimizer_index(index)
    assert int((mi.desc[:-1] & 63).max()) == 63, "fixture must saturate a slot"
    engine = DeviceQueryEngine(index, mode="minimizer")
    queries = [
        text[500:700].encode(),
        ("".join(rng.choice(list("ACGT"), 20)) + M + "".join(rng.choice(list("ACGT"), 20))).encode(),
        text[:200].encode(),
    ]
    for q in queries:
        f, _ = engine.search_fwd_rc(q)
        want = index.search(q)
        assert f.local_offsets == want.local_offsets, q[:20]


def test_engine_v2_matches_oracle(monkeypatch):
    """The run-deduplicated (v2) fast path behind the engine facade must
    equal the host oracle exactly (small indexes pick v1 by size, so the
    env override forces v2 here)."""
    import numpy as np

    from finito_tpu.query.engine import DeviceQueryEngine
    from tests.test_device_engine import build_index, gen_dspss

    monkeypatch.setenv("FINITO_MINIMIZER_V2", "1")
    rng = np.random.default_rng(77)
    k = 7
    unitigs = gen_dspss(rng, 15, 12, 60, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    for _ in range(12):
        if rng.random() < 0.5:
            read = unitigs[int(rng.integers(len(unitigs)))].encode()
        else:
            read = "".join(rng.choice(list("ACGT"), int(rng.integers(k, 40)))).encode()
        f, _r = engine.search_fwd_rc(read)
        assert f.local_offsets == index.search(read).local_offsets, read


def test_desc_to_rows_uint64_exact():
    """Past 2^26 occurrences the host desc packs into uint64; the device
    rows must carry the exact starts (jnp.asarray would have silently
    truncated uint64 -> uint32) and EXACT lengths (the packed length
    saturates at 63)."""
    from finito_tpu.index.minimizer import _pack_desc
    from finito_tpu.query.minimizer_engine import desc_to_rows

    counts = np.zeros(1 << 10, dtype=np.int64)
    counts[0] = 1
    counts[1] = 200            # saturates the 6-bit packed length
    counts[2] = (1 << 26) + 7  # pushes cumulative starts past 26 bits
    counts[5] = 3
    counts[-1] = (1 << 30)     # total past 2^30: uint32<<6 would overflow
    desc = _pack_desc(counts)
    assert desc.dtype == np.uint64, "fixture must force the wide desc"
    rows = desc_to_rows(desc)
    starts = np.concatenate([[0], np.cumsum(counts)])
    assert rows.dtype == np.int32
    np.testing.assert_array_equal(rows[:, 0].astype(np.int64), starts)
    np.testing.assert_array_equal(rows[:-1, 1].astype(np.int64), counts)
    assert rows[-1, 1] == 0


def test_fused_slot_rows_vs_narrow_desc():
    """The fused slot-row fast path (v1 default under the size threshold)
    and the narrow-desc + payload-gather fallback must produce identical
    answers, including multi-occurrence slots (small m forces them) and
    invalid/padded windows."""
    rng = np.random.default_rng(99)
    k = 9
    unitigs = gen_dspss(rng, 10, 14, 70, k)
    permuted = _permuted_unitigs(unitigs, k)
    concat = np.concatenate([encode_seq(u.encode()) for u in permuted])
    ends = np.cumsum([len(u) for u in permuted])
    mi = MinimizerIndex.build(concat, ends, k, m=4)  # tiny m -> multi slots
    dmi = DeviceMinimizerIndex(mi)
    assert dmi.slot_rows is not None

    # reads: genuine windows, mutations, pad (255) tails, and an N
    B, L = 24, 48
    reads = np.full((B, L), 255, dtype=np.uint8)
    for b in range(B):
        u = permuted[int(rng.integers(len(permuted)))]
        a = int(rng.integers(0, max(1, len(u) - L)))
        s = encode_seq(u[a : a + L].encode())
        reads[b, : s.size] = s
    reads[3, 10] = 255  # mid-read invalid char
    reads[5] = rng.integers(0, 4, size=L)  # random (mostly absent)

    uid_f, off_f, _ = make_minimizer_locate(dmi, 4096)(reads)

    dmi_narrow = DeviceMinimizerIndex(mi)
    dmi_narrow.slot_rows = None
    uid_n, off_n, _ = make_minimizer_locate(dmi_narrow, 4096)(reads)

    np.testing.assert_array_equal(np.asarray(uid_f), np.asarray(uid_n))
    np.testing.assert_array_equal(np.asarray(off_f), np.asarray(off_n))

    # and both against the host oracle
    truth = brute_force_occurrences(permuted, k)
    uid_f, off_f = np.asarray(uid_f), np.asarray(off_f)
    for b in range(B):
        s_str = "".join("ACGT"[c] if c < 4 else "N" for c in reads[b])
        for w in range(L - k + 1):
            want = truth.get(s_str[w : w + k], (-1, -1))
            assert (int(uid_f[b, w]), int(off_f[b, w])) == want, (b, w)


@pytest.mark.parametrize("k,m", [(31, 16), (63, 16), (18, 4)])
def test_v2_run_level_verify_vs_v1(k, m):
    """The v2 run-level span verification (fast heads verified once per
    run, windows decode their bit from the redistributed bitmap) must
    equal v1 per-window verification exactly -- including k > 47 (two
    bitmap words per run), tiny m (multi-occurrence slow runs), mutated
    reads, mid-read invalid chars, and pad tails."""
    from finito_tpu.query.minimizer_engine import make_minimizer_locate_v2

    rng = np.random.default_rng(1000 + k + m)
    unitigs = gen_dspss(rng, 8, k + 6, k + 90, k)
    permuted = _permuted_unitigs(unitigs, k)
    concat = np.concatenate([encode_seq(u.encode()) for u in permuted])
    ends = np.cumsum([len(u) for u in permuted])
    mi = MinimizerIndex.build(concat, ends, k, m=m)
    dmi = DeviceMinimizerIndex(mi)

    B, L = 16, 2 * k + 34
    reads = np.full((B, L), 255, dtype=np.uint8)
    for b in range(B):
        u = permuted[int(rng.integers(len(permuted)))]
        a = int(rng.integers(0, max(1, len(u) - L)))
        s = encode_seq(u[a : a + L].encode())
        reads[b, : s.size] = s
    # mutations (absent windows), one invalid char, one all-random read
    for _ in range(20):
        b, j = int(rng.integers(B)), int(rng.integers(L))
        if reads[b, j] <= 3:
            reads[b, j] = (reads[b, j] + 1) % 4
    reads[2, L // 2] = 255
    reads[4] = rng.integers(0, 4, size=L)

    uid2, off2, n_slow, n_heads = make_minimizer_locate_v2(dmi, 4096, 4096)(reads)
    assert int(n_slow) <= 4096 and int(n_heads) <= 4096
    uid1, off1, _ = make_minimizer_locate(dmi, 4096)(reads)
    np.testing.assert_array_equal(np.asarray(uid2), np.asarray(uid1))
    np.testing.assert_array_equal(np.asarray(off2), np.asarray(off1))

    # and against the brute-force table on a few reads
    truth = brute_force_occurrences(permuted, k)
    uid2, off2 = np.asarray(uid2), np.asarray(off2)
    for b in range(0, B, 3):
        s_str = "".join("ACGT"[c] if c < 4 else "N" for c in reads[b])
        for w in range(L - k + 1):
            want = truth.get(s_str[w : w + k], (-1, -1))
            assert (int(uid2[b, w]), int(off2[b, w])) == want, (b, w)
