"""Differential tests for finito_tpu.dbg (compacted dBG unitigs).

The oracle is an independent brute-force string-space implementation of
the same graph rules (maximal out-1/in-1 paths in the (bidirected) de
Bruijn graph, mirror-pair dedup, cycles broken at the minimum oriented
node in colex node order) -- so impl and oracle agree on EXACT strings,
including circular unitig break points.
"""

from __future__ import annotations

import numpy as np
import pytest

from finito_tpu.dbg import build_unitigs
from finito_tpu.io.seqdb import decode_seq, encode_seq

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def colex_key(s: str) -> str:
    return s[::-1]


def brute_unitigs(seqs, k: int, canonical: bool = True):
    """Exact-string oracle; returns a sorted list of unitig strings."""
    kmers = set()
    for s in seqs:
        for seg in s.replace("N", " ").split():
            for i in range(len(seg) - k + 1):
                w = seg[i : i + k]
                kmers.add(min(w, rc(w), key=colex_key) if canonical else w)
    if not kmers:
        return []
    nodes = sorted(kmers, key=colex_key)
    node_id = {s: i for i, s in enumerate(nodes)}

    def ori_id(w):  # oriented id, matching dbg.py's 2*node + o layout
        c = min(w, rc(w), key=colex_key) if canonical else w
        return 2 * node_id[c] + (0 if w == c else 1)

    def present(w):
        return (min(w, rc(w), key=colex_key) if canonical else w) in kmers

    oriented = {}
    for s in nodes:
        oriented[ori_id(s)] = s
        if canonical:
            oriented[ori_id(rc(s))] = rc(s)

    def succs(w):
        return [w[1:] + c for c in "ACGT" if present(w[1:] + c)]

    def preds(w):
        return [c + w[:-1] for c in "ACGT" if present(c + w[:-1])]

    link = {}
    for oid, w in oriented.items():
        ss = succs(w)
        if len(ss) != 1:
            continue
        y = ss[0]
        same_node = (
            min(y, rc(y), key=colex_key) == min(w, rc(w), key=colex_key)
            if canonical
            else y == w
        )
        if len(preds(y)) == 1 and not same_node:
            link[oid] = ori_id(y)

    has_in = set(link.values())
    out = []
    visited = set()
    # linear chains from heads
    for oid in sorted(oriented):
        if oid in has_in or oid in visited:
            continue
        chain = [oid]
        visited.add(oid)
        while chain[-1] in link:
            nxt = link[chain[-1]]
            chain.append(nxt)
            visited.add(nxt)
        tail = chain[-1]
        if canonical:
            keep = oid <= (tail ^ 1)
        else:
            keep = oid % 2 == 0
        if keep:
            u = oriented[oid] + "".join(oriented[x][-1] for x in chain[1:])
            out.append(u)
    # cycles: break at the minimum oriented id; in canonical mode emit
    # iff that minimum beats the mirror cycle's minimum
    for oid in sorted(oriented):
        if oid in visited:
            continue
        cyc = [oid]
        visited.add(oid)
        x = link[oid]
        while x != oid:
            cyc.append(x)
            visited.add(x)
            x = link[x]
        m = min(cyc)
        if canonical and m > min(y ^ 1 for y in cyc):
            continue
        if not canonical and m % 2 != 0:
            continue
        r = cyc.index(m)
        cyc = cyc[r:] + cyc[:r]
        u = oriented[m] + "".join(oriented[x][-1] for x in cyc[1:])
        out.append(u)
    return sorted(out)


def impl_unitigs(seqs, k, canonical=True):
    codes = [encode_seq(s.encode()) for s in seqs]
    return sorted(
        decode_seq(u).decode() for u in build_unitigs(codes, k, canonical=canonical)
    )


def kmer_multiset(unitigs, k, canonical=True):
    out = []
    for u in unitigs:
        for i in range(len(u) - k + 1):
            w = u[i : i + k]
            out.append(min(w, rc(w), key=colex_key) if canonical else w)
    return sorted(out)


def test_single_read_simple_path():
    # NOTE: a single read is NOT always one unitig -- RC-induced edges
    # (e.g. TTGCA -> TGCAA when both orientations of a node are
    # adjacent) can branch the bidirected graph. The oracle is the
    # arbiter; also pin a read verified branch-free by hand.
    s = "ACGTTGCACCAGT"
    assert impl_unitigs([s], 5) == brute_unitigs([s], 5)
    t = "AACCCGGTCAGCA"
    got = impl_unitigs([t], 5)
    exp = brute_unitigs([t], 5)
    assert got == exp


def test_branching_splits():
    # two reads sharing a middle segment create branch nodes
    a = "AAAACCCCGGGG"
    b = "TTTTCCCCAAAA"
    k = 5
    got = impl_unitigs([a, b], k)
    exp = brute_unitigs([a, b], k)
    assert got == exp


def test_circular_genome_cycle():
    rng = np.random.default_rng(7)
    k = 11  # large enough that spurious RC-induced branches are unlikely
    while True:
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
        circ = s + s[: k - 1]
        exp = brute_unitigs([circ], k)
        if len(exp) == 1 and len(exp[0]) == len(s) + k - 1:
            break  # a genuine single circular unitig (exercises cycle break)
    got = impl_unitigs([circ], k)
    assert got == exp


def test_forward_mode_cycle_and_chains():
    rng = np.random.default_rng(3)
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, 50))
    k = 6  # even k fine in forward mode
    circ = s + s[: k - 1]
    kms = [circ[i : i + k] for i in range(len(circ) - k + 1)]
    if len(set(kms)) == len(kms):
        got = impl_unitigs([circ], k, canonical=False)
        exp = brute_unitigs([circ], k, canonical=False)
        assert got == exp


def test_n_splits_sequences():
    s = "ACGTACGTNNGGGTTTCAC"
    k = 5
    assert impl_unitigs([s], k) == brute_unitigs([s], k)


@pytest.mark.parametrize("k", [3, 5, 9, 31])
@pytest.mark.parametrize("canonical", [True, False])
def test_fuzz_vs_brute_force(k, canonical):
    rng = np.random.default_rng(k * 2 + canonical)
    for trial in range(8):
        n_reads = int(rng.integers(1, 6))
        seqs = []
        base = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
        for _ in range(n_reads):
            if rng.random() < 0.5 and len(base) > k + 5:
                # overlapping mutated fragment of base: shared k-mers + branches
                a = int(rng.integers(0, len(base) - k - 3))
                b = int(rng.integers(a + k, len(base)))
                frag = list(base[a:b])
                for _ in range(int(rng.integers(0, 3))):
                    p = int(rng.integers(0, len(frag)))
                    frag[p] = "ACGT"[int(rng.integers(0, 4))]
                seqs.append("".join(frag))
            else:
                seqs.append(
                    "".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(k, 70))))
                )
        if rng.random() < 0.3:
            seqs.append(rc(seqs[0]))  # exact RC duplicate
        got = impl_unitigs(seqs, k, canonical=canonical)
        exp = brute_unitigs(seqs, k, canonical=canonical)
        assert got == exp, f"trial {trial}: {seqs}"
        # DSPSS property: every (canonical) k-mer exactly once
        km = kmer_multiset(got, k, canonical=canonical)
        assert len(km) == len(set(km))
        assert set(km) == set(kmer_multiset(seqs, k, canonical=canonical))


def test_pipeline_round_trip():
    """unitigs -> SBWT -> finimizer index: every unitig k-mer is found."""
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    rng = np.random.default_rng(11)
    k = 9
    reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, 120)) for _ in range(4)]
    unitigs = impl_unitigs(reads, k)
    useqs = [u.encode() for u in unitigs]
    sbwt, node_keys = build_plain_matrix_sbwt(useqs, k, return_keys=True)
    lcs = lcs_array(sbwt)
    index = FinimizerIndexBuilder(
        sbwt, lcs, SeqDB.from_sequences(useqs), node_keys=node_keys
    ).get_index()
    ends = np.asarray(index.unitigs.ends)
    concat = np.asarray(index.unitigs.concat)
    for u in unitigs[:3]:
        res = index.search(u.encode()).local_offsets
        for w, (uid, off) in enumerate(res):
            assert uid >= 0
            ustart = 0 if uid == 0 else int(ends[uid - 1])
            got = decode_seq(concat[ustart + off : ustart + off + k]).decode()
            assert got == u[w : w + k]


def test_flip_unitigs_reduces_dummies():
    """flip_unitigs: same canonical k-mer set, fewer SBWT dummy chains
    (the reference delegates this to external unitig_flipper)."""
    from finito_tpu.dbg import flip_unitigs
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt

    rng = np.random.default_rng(21)
    k = 11
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    # cut into chained unitigs (k-1 overlap), then RC half of them:
    # the k-mer set is unchanged but head-to-tail chaining is destroyed
    cuts = list(range(0, len(genome) - k, 200)) + [len(genome) - k + 1]
    unis = [genome[a : b + k - 1] for a, b in zip(cuts[:-1], cuts[1:])]
    mangled = [rc(u) if i % 2 else u for i, u in enumerate(unis)]

    def dummies(seqs):
        s = build_plain_matrix_sbwt([x.encode() for x in seqs], k)
        return s.number_of_subsets() - s.number_of_kmers()

    codes = [encode_seq(u.encode()) for u in mangled]
    flipped = [decode_seq(u).decode() for u in flip_unitigs(codes, k)]
    # canonical k-mer multiset preserved exactly
    assert kmer_multiset(flipped, k) == kmer_multiset(mangled, k)
    d_mangled, d_flipped = dummies(mangled), dummies(flipped)
    # every unitig chains again -> one dummy chain, like the original
    assert d_flipped == dummies(unis)
    assert d_flipped < d_mangled


def test_flip_unitigs_identity_when_chained():
    from finito_tpu.dbg import flip_unitigs

    rng = np.random.default_rng(4)
    k = 7
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, 300))
    unis = [s[a : a + 60 + k - 1] for a in range(0, 240, 60)]
    codes = [encode_seq(u.encode()) for u in unis]
    flipped = flip_unitigs(codes, k)
    # already chained head-to-tail: orientations must be preserved
    assert all(
        decode_seq(f).decode() == u for f, u in zip(flipped, unis)
    )


def test_merge_sorted_unique():
    from finito_tpu.sbwt import keys as kw

    rng = np.random.default_rng(9)
    for W in (1, 2, 3):
        for _ in range(6):
            a = rng.integers(0, 50, size=(int(rng.integers(0, 40)), W)).astype(np.uint64)
            b = rng.integers(0, 50, size=(int(rng.integers(0, 40)), W)).astype(np.uint64)
            A = kw.dedup_sorted(kw.sort_keys([a[:, i].copy() for i in range(W)]))
            B = kw.dedup_sorted(kw.sort_keys([b[:, i].copy() for i in range(W)]))
            got = kw.merge_sorted_unique(A, B)
            exp = kw.dedup_sorted(kw.sort_keys(kw.concat([A, B])))
            assert all(np.array_equal(g, e) for g, e in zip(got, exp))


def test_collect_nodes_batched_equals_unbatched():
    from finito_tpu.dbg import _collect_nodes

    rng = np.random.default_rng(31)
    k = 9
    seqs = [rng.integers(0, 4, size=int(rng.integers(k, 200))).astype(np.uint8)
            for _ in range(12)]
    big = _collect_nodes(seqs, k, True)
    small = _collect_nodes(seqs, k, True, batch_windows=64)  # many flushes
    assert all(np.array_equal(a, b) for a, b in zip(big, small))


def test_min_multiplicity_filters_singletons():
    """Error-containing reads: k-mers seen once are dropped, the rest
    form the same unitigs as a brute filter (counts over canonical)."""
    from collections import Counter

    rng = np.random.default_rng(13)
    k = 9
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
    reads = []
    for _ in range(6):  # 6 coverage passes, each with one error
        r = list(base)
        p = int(rng.integers(0, len(r)))
        r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))

    for mm in (2, 3):
        cnt = Counter()
        for s in reads:
            for i in range(len(s) - k + 1):
                cnt[min(s[i : i + k], rc(s[i : i + k]), key=colex_key)] += 1
        surv = {w for w, c in cnt.items() if c >= mm}
        # oracle over a synthetic input spelling exactly the survivors
        exp = brute_unitigs(sorted(surv), k) if surv else []
        codes = [encode_seq(s.encode()) for s in reads]
        got = sorted(
            decode_seq(u).decode() for u in build_unitigs(codes, k, min_mult=mm)
        )
        assert got == exp, f"min_mult={mm}"
        assert set(kmer_multiset(got, k)) == surv


def test_min_multiplicity_batching_invariance():
    from finito_tpu.dbg import _collect_nodes

    rng = np.random.default_rng(17)
    k = 7
    seqs = [rng.integers(0, 4, size=int(rng.integers(k, 120))).astype(np.uint8)
            for _ in range(10)]
    seqs += [seqs[0].copy(), seqs[1].copy()]  # guaranteed repeats
    big = _collect_nodes(seqs, k, True, min_mult=2)
    small = _collect_nodes(seqs, k, True, min_mult=2, batch_windows=32)
    assert all(np.array_equal(a, b) for a, b in zip(big, small))


def test_simplitigs_dspss_and_native_equals_python():
    from finito_tpu.dbg import build_simplitigs

    rng = np.random.default_rng(23)
    for trial in range(5):
        k = [5, 9, 31, 63, 45][trial % 5]
        base = "".join("ACGT"[c] for c in rng.integers(0, 4, 200))
        seqs = [base]
        for _ in range(int(rng.integers(1, 4))):
            v = list(base)
            for _ in range(int(rng.integers(1, 5))):
                p = int(rng.integers(0, len(v)))
                v[p] = "ACGT"[int(rng.integers(0, 4))]
            seqs.append("".join(v))
        codes = [encode_seq(s.encode()) for s in seqs]
        simp = build_simplitigs(codes, k)
        simp_s = [decode_seq(u).decode() for u in simp]
        # DSPSS: every canonical k-mer exactly once, set preserved
        km = kmer_multiset(simp_s, k)
        assert len(km) == len(set(km))
        assert set(km) == set(kmer_multiset(seqs, k))
        # fewer or equal strings and total chars vs unitigs
        unis = impl_unitigs(seqs, k)
        assert len(simp_s) <= len(unis)
        assert sum(map(len, simp_s)) <= sum(map(len, unis))
        # native kernel == python fallback, string for string
        import os

        os.environ["FINITO_NO_NATIVE"] = "1"
        try:
            simp_py = [decode_seq(u).decode() for u in build_simplitigs(codes, k)]
        finally:
            del os.environ["FINITO_NO_NATIVE"]
        assert simp_s == simp_py


def test_simplitigs_index_round_trip():
    from finito_tpu.dbg import build_simplitigs
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array

    rng = np.random.default_rng(29)
    k = 11
    reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, 150)) for _ in range(4)]
    simp = build_simplitigs([encode_seq(s.encode()) for s in reads], k)
    useqs = [decode_seq(u) for u in simp]
    sbwt, node_keys = build_plain_matrix_sbwt(useqs, k, return_keys=True)
    index = FinimizerIndexBuilder(
        sbwt, lcs_array(sbwt), SeqDB.from_sequences(useqs), node_keys=node_keys
    ).get_index()
    ends = np.asarray(index.unitigs.ends)
    concat = np.asarray(index.unitigs.concat)
    for u in useqs[:3]:
        res = index.search(u).local_offsets
        for w, (uid, off) in enumerate(res):
            assert uid >= 0
            ustart = 0 if uid == 0 else int(ends[uid - 1])
            assert decode_seq(concat[ustart + off : ustart + off + k]) == u[w : w + k]


def test_flip_unitigs_rejects_bad_input():
    from finito_tpu.dbg import flip_unitigs

    with pytest.raises(ValueError, match="non-ACGT"):
        flip_unitigs([encode_seq(b"ACGTNACGTA")], 5)
    with pytest.raises(ValueError, match="shorter than k"):
        flip_unitigs([encode_seq(b"ACG")], 5)
