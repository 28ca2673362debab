"""Device (JAX) engine vs the host oracle: identical output required.

Runs on the virtual CPU mesh (tests/conftest.py). The oracle
(FinimizerIndex.search, the exact reference algorithm) is the arbiter.
"""

import numpy as np
import pytest

from finito_tpu.index.builder import FinimizerIndexBuilder
from finito_tpu.io.fastx import reverse_complement
from finito_tpu.io.seqdb import SeqDB, encode_seq
from finito_tpu.ops.bitvec import DeviceSBWT
from finito_tpu.query.engine import DeviceQueryEngine
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array

import jax.numpy as jnp

from finito_tpu.ops import bitvec


def build_index(spss, k):
    sbwt = build_plain_matrix_sbwt([s.encode() for s in spss], k)
    return FinimizerIndexBuilder(sbwt, lcs_array(sbwt), SeqDB.from_sequences([s.encode() for s in spss])).get_index()


def gen_dspss(rng, n_unitigs, min_len, max_len, k):
    """Random unitigs whose k-mers are globally distinct (valid t=1 input)."""
    seen = set()
    unitigs = []
    tries = 0
    while len(unitigs) < n_unitigs and tries < 10000:
        tries += 1
        L = int(rng.integers(min_len, max_len + 1))
        s = "".join(rng.choice(list("ACGT"), L))
        kmers = {s[i : i + k] for i in range(L - k + 1)}
        if len(kmers) != L - k + 1 or kmers & seen:
            continue
        seen |= kmers
        unitigs.append(s)
    assert len(unitigs) == n_unitigs
    return unitigs


def oracle_pairs(index, read: bytes):
    res = index.search(read)
    return res.local_offsets, res.n_found


def engine_pairs(engine, read: bytes):
    f, _r = engine.search_fwd_rc(read)
    return f.local_offsets, f.n_found


def test_device_rank_matches_host():
    spss = ["GTAAGTCT", "AGGAAA", "ACAGG", "GTAGG", "AGGTA"]
    sbwt = build_plain_matrix_sbwt([s.encode() for s in spss], 4)
    d = DeviceSBWT.from_host(sbwt)
    n = sbwt.number_of_subsets()
    rng = np.random.default_rng(0)
    idx = rng.integers(0, n + 1, size=200).astype(np.int32)
    for c in range(4):
        host = sbwt.rank(c, idx)
        dev = bitvec.rank(d, jnp.full(idx.shape, c, jnp.int32), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_device_search_matches_host():
    spss = ["GTAAGTCT", "AGGAAA", "ACAGG", "GTAGG", "AGGTA"]
    k = 4
    sbwt = build_plain_matrix_sbwt([s.encode() for s in spss], k)
    d = DeviceSBWT.from_host(sbwt)
    rng = np.random.default_rng(1)
    kmers = rng.integers(0, 4, size=(300, k)).astype(np.uint8)
    host = sbwt.search_batch(kmers)
    dev = np.asarray(bitvec.search_batch_device(d, jnp.asarray(kmers)))
    np.testing.assert_array_equal(dev, host)


def test_position_table_exact():
    """Every colex node's entry equals its k-mer's true global end; -1 for
    dummies. Regression: absent/invalid windows carry rank -1, and a
    .at[-1] scatter WRAPS to the last node instead of dropping, so the
    last colex entry used to be corrupted nondeterministically."""
    from finito_tpu.query.engine import build_position_table

    spss = [b"ACAGGTA", b"GTAGGAAA", b"GTAAGTCT"]  # the paper example.fna
    k = 4
    sbwt = build_plain_matrix_sbwt(spss, k)
    index = FinimizerIndexBuilder(sbwt, lcs_array(sbwt), SeqDB.from_sequences(spss)).get_index()
    d = DeviceSBWT.from_host(index.sbwt)
    got = np.asarray(build_position_table(d, index.unitigs.concat, index.unitigs.ends))

    concat, ends = index.unitigs.concat, np.asarray(index.unitigs.ends, np.int64)
    expected = np.full(index.sbwt.number_of_subsets(), -1, dtype=np.int32)
    start = 0
    for e in ends:
        for s in range(start, e - k + 1):
            r = index.sbwt.search_batch(concat[s : s + k][None, :])[0]
            assert r >= 0
            expected[r] = s + k - 1
        start = e
    np.testing.assert_array_equal(got, expected)


@pytest.fixture(scope="module", params=["dense", "stream", "minimizer", "replica"])
def fixture_engine(request):
    spss = ["GTAAGTCT", "AGGAAA", "ACAGG", "GTAGG", "AGGTA"]
    index = build_index(spss, 4)
    return index, DeviceQueryEngine(index, mode=request.param)


def test_dense_engine_fixture_queries(fixture_engine):
    index, engine = fixture_engine
    for q in [b"AAGTAA", b"GTAAGTCT", b"ACAGGTA", b"TTTTTT", b"AGGTAAGT", b"ACG", b"ACGNACGT"]:
        assert engine_pairs(engine, q) == oracle_pairs(index, q), q


def test_dense_engine_padded_batch(fixture_engine):
    index, engine = fixture_engine
    reads = [b"AAGTAA", b"GTAAGTCTAGG", b"ACAG"]
    out = engine.process_reads(reads)
    for read, (f, _r) in zip(reads, out):
        assert f.local_offsets == index.search(read).local_offsets


@pytest.mark.parametrize("mode", ["dense", "stream", "minimizer", "replica"])
def test_dense_engine_random_dspss(mode):
    rng = np.random.default_rng(42)
    k = 6
    unitigs = gen_dspss(rng, 12, 8, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode=mode)

    queries = []
    # substrings of unitigs (present), possibly RC'd
    for _ in range(30):
        u = unitigs[int(rng.integers(len(unitigs)))]
        if len(u) <= k:
            continue
        a = int(rng.integers(0, len(u) - k + 1))
        b = int(rng.integers(a + k, len(u) + 1))
        q = u[a:b].encode()
        if rng.random() < 0.5:
            q = reverse_complement(q)
        queries.append(q)
    # random reads (mostly absent) and chimeras
    for _ in range(20):
        L = int(rng.integers(k, 30))
        queries.append("".join(rng.choice(list("ACGT"), L)).encode())
    for _ in range(10):
        u1 = unitigs[int(rng.integers(len(unitigs)))]
        u2 = unitigs[int(rng.integers(len(unitigs)))]
        queries.append((u1[-k:] + u2[:k]).encode())

    for q in queries:
        assert engine_pairs(engine, q) == oracle_pairs(index, q), q
        # merged fwd/rc parity too
        f, r = engine.search_fwd_rc(q)
        of = index.search(q)
        orr = index.search(reverse_complement(q))
        assert r.local_offsets == orr.local_offsets
        assert (f.n_found, r.n_found) == (of.n_found, orr.n_found)


# ---------------- device merge + run-length readback ----------------


def _expected_merged_lines(index, reads):
    """Reference merge rule (search_fmin.hh:62-71) via the host oracle."""
    k = index.sbwt.get_k()
    lines = []
    kf = kr = 0
    for read in reads:
        res = index.search(read)
        rres = index.search(reverse_complement(read))
        kf += res.n_found
        kr += rres.n_found
        pairs = []
        for i, (u, p) in enumerate(res.local_offsets):
            if u == -1:
                u, p = rres.local_offsets[len(read) - k - i]
            pairs.append((u, p))
        lines.append(pairs)
    return lines, kf, kr


@pytest.mark.parametrize("mode", ["minimizer", "dense"])
def test_merged_pairs_flat_rle_vs_oracle(mode):
    """merged_pairs_flat's device RLE path vs the host oracle merge AND
    vs the full-window host fallback, on run-adversarial reads: exact
    substrings (long +1 runs), RC substrings (descending -1 runs via the
    mirror), mutated reads (run breaks), random reads (absent/present
    alternation), short and non-ACGT reads (empty lines)."""
    rng = np.random.default_rng(17)
    k = 6
    unitigs = gen_dspss(rng, 20, 10, 60, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode=mode)
    genome = "".join(unitigs)
    reads = []
    for _ in range(8):
        s = int(rng.integers(0, len(genome) - 30))
        reads.append(genome[s : s + 30].encode())
    reads += [reverse_complement(r) for r in reads[:4]]
    for r in reads[:4]:
        b = bytearray(r)
        j = len(b) // 2
        b[j] = b"ACGT"[(b"ACGT".index(b[j : j + 1]) + 1) % 4]
        reads.append(bytes(b))
    for _ in range(8):
        L = int(rng.integers(k, 40))
        reads.append("".join(rng.choice(list("ACGT"), L)).encode())
    reads += [b"ACG", b"ACGNNACGTACG", b""]

    line_lens, u, p, kf, kr = engine.merged_pairs_flat(reads)
    exp_lines, ekf, ekr = _expected_merged_lines(index, reads)
    exp_lens = [
        (len(r) - k + 1 if len(r) >= k and b"N" not in r.upper() else 0)
        for r in reads
    ]
    # non-ACGT / short reads emit empty lines
    exp_pairs = []
    for r, pl in zip(reads, exp_lines):
        if len(r) >= k and all(c in b"ACGT" for c in r):
            exp_pairs.extend(pl)
    assert line_lens.tolist() == [
        len(pl) if len(r) >= k and all(c in b"ACGT" for c in r) else 0
        for r, pl in zip(reads, exp_lines)
    ]
    got_pairs = list(zip(u.tolist(), p.tolist()))
    assert got_pairs == exp_pairs
    assert (kf, kr) == (ekf, ekr)

    # the overflow fallback (full-window host merge) -> identical streams
    batch_idx, batch_codes, both = engine._encode_both_strands(reads)
    uid_d, off_d, _, _ = engine.locate_batch_async(both)
    lens = np.array([c.size - k + 1 for c in batch_codes], dtype=np.int64)
    ll2 = np.zeros(len(reads), np.int64)
    ll2[np.asarray(batch_idx, dtype=np.int64)] = lens
    line_lens2, u2, p2, kf2, kr2 = engine._merged_pairs_host(
        ll2, batch_codes, lens, np.asarray(uid_d), np.asarray(off_d)
    )
    np.testing.assert_array_equal(line_lens, line_lens2)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(p, p2)
    assert (kf, kr) == (kf2, kr2)


def test_deferred_verify_overflow_rerun(monkeypatch):
    """The serving path's deferred capacity check: force a tiny initial
    slow-path capacity so verify() must re-run, and the corrected
    output must equal the host oracle (minimizer mode)."""
    rng = np.random.default_rng(31)
    k = 6
    unitigs = gen_dspss(rng, 10, 12, 40, k)
    index = build_index(unitigs, k)
    engine = DeviceQueryEngine(index, mode="minimizer")
    # absent-heavy reads maximize slow windows
    reads = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(12)]
    monkeypatch.setenv("FINITO_MIN_K0", "1")
    h = engine.merged_pairs_flat_begin([r.encode() for r in reads])
    line_lens, u, p, kf, kr = engine.merged_pairs_flat_end(h)
    monkeypatch.delenv("FINITO_MIN_K0")
    exp_lens, eu, ep, ekf, ekr = engine.merged_pairs_flat([r.encode() for r in reads])
    assert np.array_equal(line_lens, exp_lens)
    assert np.array_equal(u, eu) and np.array_equal(p, ep)
    assert (kf, kr) == (ekf, ekr)
