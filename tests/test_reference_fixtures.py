"""Ports of all 9 hand-computed end-to-end scenarios from the reference's
test binary (/root/reference/src/tests.cpp:319-359). Every literal vector
below is copied from the reference fixtures and is the bit-exactness
oracle for our construction and query paths (SURVEY.md section 4)."""

import numpy as np
import pytest

from finito_tpu.index.builder import FinimizerIndexBuilder
from finito_tpu.index.index import FinimizerIndex
from finito_tpu.io.fastx import reverse_complement
from finito_tpu.io.seqdb import SeqDB
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array

PAPER_EXAMPLE_UNITIGS = ["GTAAGTCT", "AGGAAA", "ACAGG", "GTAGG", "AGGTA"]
PAPER_EXAMPLE_QUERIES = ["AAGTAA"]


def build_index(spss, k) -> FinimizerIndex:
    sbwt = build_plain_matrix_sbwt([s.encode() for s in spss], k)
    lcs = lcs_array(sbwt)
    db = SeqDB.from_sequences([s.encode() for s in spss])
    builder = FinimizerIndexBuilder(sbwt, lcs, db)
    return builder.get_index()


@pytest.fixture(scope="module")
def example_index():
    return build_index(PAPER_EXAMPLE_UNITIGS, 4)


def test_shortest_unique_construction(example_index):
    # ref tests.cpp:62-84
    index = example_index
    true_LCS = [0, 0, 1, 2, 2, 1, 1, 1, 0, 1, 0, 2, 2, 1, 3, 0, 1, 2]
    true_unitig_concat = [2,3,0,0,2,3,1,3, 0,2,2,0,0,0, 0,1,0,2,2, 2,3,0,2,2, 0,2,2,3,0]
    true_unitig_ends = [8, 14, 19, 24, 29]
    true_fmin = [0, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1]
    true_global_offsets = [16, 11, 28, 6, 4, 27]
    true_Ustart = [0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1]

    np.testing.assert_array_equal(index.LCS, true_LCS)
    np.testing.assert_array_equal(index.unitigs.concat, true_unitig_concat)
    np.testing.assert_array_equal(index.unitigs.ends, true_unitig_ends)
    np.testing.assert_array_equal(index.fmin, true_fmin)
    np.testing.assert_array_equal(index.global_offsets, true_global_offsets)
    np.testing.assert_array_equal(index.Ustart, true_Ustart)
    # widths as the reference's bit_compress / 64-clzll would produce
    assert index.lcs_width == 2  # k-1 = 3 -> 2 bits
    assert index.offsets_width == 5  # max 28 -> 5 bits
    assert index.unitigs.ends_width() == 5  # total length 29 -> 5 bits


def test_shortest_unique_queries(example_index):
    # ref tests.cpp:86-101
    res = example_index.search(PAPER_EXAMPLE_QUERIES[0])
    assert res.n_found == 2
    assert res.local_offsets == [(0, 2), (-1, -1), (0, 0)]


def test_finimizer_branch():
    # ref tests.cpp:103-148
    unitigs = ["ACGG", "CGGT", "GCCGT", "CGGC"]
    index = build_index(unitigs, 4)

    true_LCS = [0, 0, 0, 1, 1, 2, 0, 1, 2, 1, 0, 2]
    true_unitig_ends = [4, 9, 13, 17]
    true_fmin = [0, 1, 0, 1, 0, 0, 0, 0, 0, 1, 0, 0]
    true_global_offsets = [9, 6, 2]
    true_Ustart = [0, 0, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1]

    np.testing.assert_array_equal(index.LCS, true_LCS)
    np.testing.assert_array_equal(index.unitigs.ends, true_unitig_ends)
    np.testing.assert_array_equal(index.fmin, true_fmin)
    np.testing.assert_array_equal(index.global_offsets, true_global_offsets)
    np.testing.assert_array_equal(index.Ustart, true_Ustart)

    res = index.search("ACGGC")
    assert res.local_offsets == [(2, 0), (0, 0)]


def test_reverse_complement_branch():
    # ref tests.cpp:150-165
    unitigs = ["TCGG", "CGGT", "GCCGTC"]
    index = build_index(unitigs, 4)
    res = index.search("TCGGTGCCGTCA")
    assert res.local_offsets == [
        (1, 0), (2, 0), (-1, -1), (-1, -1), (-1, -1),
        (0, 0), (0, 1), (0, 2), (-1, -1),
    ]


def test_leftmost():
    # ref tests.cpp:167-181
    unitigs = ["CGGT", "GGTT", "TACCCGTA"]
    index = build_index(unitigs, 4)
    res = index.search("CGGTTACCC")
    assert res.local_offsets == [(1, 0), (2, 0), (-1, -1), (-1, -1), (0, 0), (0, 1)]


def test_finimizer_selection():
    # ref tests.cpp:185-213
    unitigs = ["ACGG", "CGGT", "GCCGTA"]
    index = build_index(unitigs, 4)
    index.search("GCCGTA")
    true_fmin = [0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 0, 0]
    np.testing.assert_array_equal(index.fmin, true_fmin)


def get_unitig_ranks(unitigs, k):
    # ref tests.cpp:216-237: independent comparator re-implementation
    ordered = sorted(unitigs, key=lambda s: s[:k][::-1])
    return {u: i for i, u in enumerate(ordered)}


def test_incoming_rc_branch():
    # ref tests.cpp:240-257
    k = 10
    unitigs = [
        "AACAAAAAAA",
        "ACAAAAAAAA",
        "CAAAAAAAAA",
        reverse_complement("TACAAAAAAA"),
        reverse_complement("TCAAAAAAAA"),
    ]
    index = build_index(unitigs, k)
    ranks = get_unitig_ranks(unitigs, k)
    query = "CAAAAAAAAA"
    res = index.search(query)
    assert res.local_offsets == [(ranks[query], 0)]


def test_reverse_complement_query():
    # ref tests.cpp:259-288: the fwd/RC merge formula rev[str_len-k-i]
    k = 4
    unitigs = ["CGGT", "GGTT", "TACCCGTA"]
    index = build_index(unitigs, k)
    query = "AACCGTACC"
    res = index.search(query)
    rev_res = index.search(reverse_complement(query))
    str_len = len(query)
    merged = []
    for i in range(len(res.local_offsets)):
        if res.local_offsets[i][0] == -1:
            merged.append(rev_res.local_offsets[str_len - k - i])
        else:
            merged.append(res.local_offsets[i])
    assert merged == [(2, 0), (1, 0), (0, 3), (0, 4), (-1, -1), (0, 0)]


def test_walk():
    # ref tests.cpp:290-317: the unitig-walk fast path incl. re-entry
    unitigs = ["CGGT", "GGTT", "TACCCGTAAACACCGTGGAGACGGCTCTTTAGGAAGCTGTCAA"]
    index = build_index(unitigs, 4)
    query = "GGTTACCCGTAAACACCGTGGAGACGGCTCTTTAGGAAGCTGTCGAAGCTGTCAAAC"
    res = index.search(query)
    expected = (
        [(2, 0), (-1, -1), (-1, -1)]
        + [(0, i) for i in range(38)]
        + [(-1, -1), (-1, -1), (-1, -1)]
        + [(0, i) for i in range(32, 40)]
        + [(-1, -1), (0, 7)]
    )
    assert len(res.local_offsets) == len(expected)
    assert res.local_offsets == expected


def test_serialize_load_roundtrip(tmp_path, example_index):
    prefix = str(tmp_path / "idx")
    example_index.serialize(prefix)
    loaded = FinimizerIndex.load(prefix)
    np.testing.assert_array_equal(loaded.LCS, example_index.LCS)
    np.testing.assert_array_equal(loaded.fmin, example_index.fmin)
    np.testing.assert_array_equal(loaded.global_offsets, example_index.global_offsets)
    np.testing.assert_array_equal(loaded.unitigs.concat, example_index.unitigs.concat)
    np.testing.assert_array_equal(loaded.unitigs.ends, example_index.unitigs.ends)
    np.testing.assert_array_equal(loaded.Ustart, example_index.Ustart)
    assert loaded.offsets_width == example_index.offsets_width
    res = loaded.search(PAPER_EXAMPLE_QUERIES[0])
    assert res.local_offsets == [(0, 2), (-1, -1), (0, 0)]
    assert loaded.size_in_bytes() > 0


def test_fast_builder_equals_oracle_builder():
    """The vectorized builder must reproduce the per-base streaming oracle
    on every component, including the cross-unitig overwrite rule."""
    import numpy as np
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(31337)
    for k in (4, 6, 9):
        unitigs = [u.encode() for u in gen_dspss(rng, 9, max(6, k + 1), 45, k)]
        sbwt = build_plain_matrix_sbwt(unitigs, k)
        lcs = lcs_array(sbwt)
        b_fast = FinimizerIndexBuilder(sbwt, lcs, SeqDB.from_sequences(unitigs))
        sbwt2 = build_plain_matrix_sbwt(unitigs, k)
        b_orc = FinimizerIndexBuilder(sbwt2, lcs_array(sbwt2), SeqDB.from_sequences(unitigs), oracle=True)
        a, b = b_fast.get_index(), b_orc.get_index()
        np.testing.assert_array_equal(a.fmin, b.fmin)
        np.testing.assert_array_equal(a.global_offsets, b.global_offsets)
        np.testing.assert_array_equal(a.Ustart, b.Ustart)
        np.testing.assert_array_equal(a.unitigs.concat, b.unitigs.concat)
        np.testing.assert_array_equal(a.unitigs.ends, b.unitigs.ends)
        assert a.offsets_width == b.offsets_width
        assert b_fast.finimizer_stats == b_orc.finimizer_stats, k


def test_packed_key_construction_equals_rowmatrix():
    """The packed-key SBWT constructor must equal the byte-matrix one."""
    import numpy as np
    from finito_tpu.sbwt.construct import _build_rowmatrix, build_plain_matrix_sbwt
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(2024)
    for k in (4, 7, 22, 31, 43, 63):
        unitigs = [u.encode() for u in gen_dspss(rng, 6, k + 2, k + 40, k)]
        a = build_plain_matrix_sbwt(unitigs, k)
        b = _build_rowmatrix(unitigs, k)
        assert a.n_nodes == b.n_nodes and a.n_kmers == b.n_kmers, k
        np.testing.assert_array_equal(a.bit_rows(), b.bit_rows())
        np.testing.assert_array_equal(a.C, b.C)


def test_builder_with_node_keys_equals_without():
    import numpy as np
    from finito_tpu.index.builder import FinimizerIndexBuilder
    from finito_tpu.io.seqdb import SeqDB
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(55)
    k = 7
    unitigs = [u.encode() for u in gen_dspss(rng, 8, k + 2, 45, k)]
    sbwt, keys = build_plain_matrix_sbwt(unitigs, k, return_keys=True)
    a = FinimizerIndexBuilder(sbwt, lcs_array(sbwt), SeqDB.from_sequences(unitigs), node_keys=keys).get_index()
    sbwt2 = build_plain_matrix_sbwt(unitigs, k)
    b = FinimizerIndexBuilder(sbwt2, lcs_array(sbwt2), SeqDB.from_sequences(unitigs)).get_index()
    np.testing.assert_array_equal(a.fmin, b.fmin)
    np.testing.assert_array_equal(a.global_offsets, b.global_offsets)
    np.testing.assert_array_equal(a.unitigs.concat, b.unitigs.concat)
