"""algbio/SBWT plain-matrix container: round-trip, rank_support_v5
layout self-validation, and CLI interop (convert-sbwt + auto-detected
build-fmin input). Ground-truth C++ bytes are unavailable in this
environment (submodule absent, no egress) -- see the module docstring of
finito_tpu/io/algbio_sbwt.py and DEVIATIONS.md item 9."""

import io

import numpy as np
import pytest

from finito_tpu.io import algbio_sbwt as ab
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array
from finito_tpu.utils.bits import pack_bits

from tests.test_device_engine import gen_dspss


def test_rank_v5_blocks_match_naive():
    rng = np.random.default_rng(0)
    for n in (1, 63, 64, 65, 2047, 2048, 2049, 10000, 70000):
        bits = (rng.random(n) < 0.4).astype(np.uint8)
        words = pack_bits(bits)
        blocks = ab.rank_v5_basic_blocks(words, n)
        cum = np.concatenate([[0], np.cumsum(bits)])
        for i in list(rng.integers(0, n + 1, size=24)) + [0, n]:
            assert ab.rank_v5_query(words, blocks, int(i)) == cum[int(i)], (n, i)


def test_roundtrip_with_and_without_header():
    rng = np.random.default_rng(1)
    unitigs = [u.encode() for u in gen_dspss(rng, 12, 10, 60, 5)]
    sbwt = build_plain_matrix_sbwt(unitigs, 5)
    lcs = lcs_array(sbwt)
    for header in (True, False):
        buf = io.BytesIO()
        ab.write_algbio_sbwt(buf, sbwt, lcs, variant_header=header)
        buf.seek(0)
        loaded, sgs = ab.read_algbio_sbwt(buf, variant_header=header)
        assert loaded.get_k() == sbwt.get_k()
        assert loaded.number_of_subsets() == sbwt.number_of_subsets()
        assert loaded.number_of_kmers() == sbwt.number_of_kmers()
        assert np.array_equal(loaded.words, sbwt.words)
        assert np.array_equal(loaded.C, sbwt.C)
        # suffix group starts == (LCS < k-1)
        assert np.array_equal(sgs, (lcs < sbwt.get_k() - 1).astype(np.uint8))


def test_precalc_intervals_match_search():
    rng = np.random.default_rng(2)
    unitigs = [u.encode() for u in gen_dspss(rng, 10, 8, 40, 4)]
    sbwt = build_plain_matrix_sbwt(unitigs, 4)
    pre = ab.build_precalc(sbwt, 2)
    for pid in range(16):
        codes = np.array([(pid >> (2 * i)) & 3 for i in range(2)])
        lo, hi = 0, sbwt.number_of_subsets() - 1
        for c in codes:
            lo, hi = sbwt.update_interval(int(c), (lo, hi))
            if lo == -1:
                break
        assert pre[pid, 0] == lo and (lo == -1 or pre[pid, 1] == hi)


def test_wrong_variant_rejected():
    buf = io.BytesIO()
    from finito_tpu.io import sdsl

    sdsl.serialize_string(buf, "rrr-matrix")
    buf.seek(0)
    with pytest.raises(IOError, match="variant"):
        ab.read_algbio_sbwt(buf)


def test_sniff_format(tmp_path):
    rng = np.random.default_rng(3)
    unitigs = [u.encode() for u in gen_dspss(rng, 8, 8, 40, 4)]
    sbwt = build_plain_matrix_sbwt(unitigs, 4)
    p1 = str(tmp_path / "a.sbwt")
    sbwt.serialize(p1)
    assert ab.sniff_format(p1) == "finito"
    p2 = str(tmp_path / "b.sbwt")
    ab.write_algbio_sbwt(p2, sbwt)
    assert ab.sniff_format(p2) == "algbio"
    p3 = str(tmp_path / "c.sbwt")
    ab.write_algbio_sbwt(p3, sbwt, variant_header=False)
    assert ab.sniff_format(p3) == "algbio-headerless"


def test_cli_convert_and_autodetect(tmp_path):
    """convert-sbwt produces an algbio-layout file that build-fmin then
    consumes directly (auto-detected), yielding identical query output
    to the FINSBWT1 pipeline."""
    from finito_tpu.cli import main

    rng = np.random.default_rng(4)
    unitigs = gen_dspss(rng, 8, 10, 40, 4)
    fna = str(tmp_path / "u.fna")
    with open(fna, "w") as f:
        for i, u in enumerate(unitigs):
            f.write(f">u{i}\n{u}\n")
    reads = str(tmp_path / "q.fna")
    with open(reads, "w") as f:
        f.write(f">q0\n{unitigs[0]}\n>q1\nACGTACGTAC\n")

    fin = str(tmp_path / "fin.sbwt")
    assert main(["sbwt-build", "-k", "4", "-i", fna, "-o", fin]) == 0
    alg = str(tmp_path / "alg.sbwt")
    assert main(["convert-sbwt", "-i", fin, "-o", alg, "--to", "algbio"]) == 0
    assert ab.sniff_format(alg) == "algbio"
    back = str(tmp_path / "back.sbwt")
    assert main(["convert-sbwt", "-i", alg, "-o", back, "--to", "finito"]) == 0
    assert ab.sniff_format(back) == "finito"

    out = {}
    for name, sbwt_file in (("fin", fin), ("alg", alg)):
        prefix = str(tmp_path / f"p_{name}")
        assert main(["build-fmin", "-o", prefix, "-i", sbwt_file, "-u", fna]) == 0
        o = str(tmp_path / f"out_{name}.txt")
        assert main(["search-fmin", "-o", o, "-i", prefix, "-q", reads]) == 0
        out[name] = open(o).read()
    assert out["fin"] == out["alg"] and out["fin"].count("\n") == 2


def test_reference_layout_prefix_roundtrips_through_search(tmp_path):
    """A prefix whose .sbwt member is the reference's in-prefix layout
    (HEADERLESS algbio container, FinimizerIndex.hh:206,238-239) loads
    and searches byte-identically to a finito-written prefix."""
    import shutil

    from finito_tpu.cli import main
    from finito_tpu.index.index import FinimizerIndex

    rng = np.random.default_rng(11)
    unitigs = gen_dspss(rng, 8, 10, 40, 4)
    fna = str(tmp_path / "u.fna")
    with open(fna, "w") as f:
        for i, u in enumerate(unitigs):
            f.write(f">u{i}\n{u}\n")
    reads = str(tmp_path / "q.fna")
    with open(reads, "w") as f:
        f.write(f">q0\n{unitigs[0]}\n>q1\nACGTACGTAC\n")

    fin = str(tmp_path / "fin.sbwt")
    assert main(["sbwt-build", "-k", "4", "-i", fna, "-o", fin]) == 0
    p_native = str(tmp_path / "native")
    assert main(["build-fmin", "-o", p_native, "-i", fin, "-u", fna]) == 0

    # rewrite the prefix with the reference's .sbwt member layout
    idx = FinimizerIndex.load(p_native)
    p_ref = str(tmp_path / "reflayout")
    idx.serialize(p_ref, sbwt_format="algbio")
    assert ab.sniff_format(p_ref + ".sbwt") == "algbio-headerless"

    o1 = str(tmp_path / "o1.txt")
    o2 = str(tmp_path / "o2.txt")
    assert main(["search-fmin", "-o", o1, "-i", p_native, "-q", reads]) == 0
    assert main(["search-fmin", "-o", o2, "-i", p_ref, "-q", reads]) == 0
    assert open(o1).read() == open(o2).read()

    # the oracle path agrees too (load built the same in-memory sbwt)
    idx2 = FinimizerIndex.load(p_ref)
    q = unitigs[0].encode()
    assert idx2.search(q).local_offsets == idx.search(q).local_offsets
