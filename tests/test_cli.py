import gzip
import os

import numpy as np
import pytest

from finito_tpu.cli import main

PAPER_UNITIGS = ["GTAAGTCT", "AGGAAA", "ACAGG", "GTAGG", "AGGTA"]


def write_fasta(path, seqs):
    with open(path, "w") as f:
        for s in seqs:
            f.write(f">\n{s}\n")


@pytest.fixture()
def built_index(tmp_path):
    unitigs = tmp_path / "unitigs.fna"
    write_fasta(unitigs, PAPER_UNITIGS)
    sbwt_path = str(tmp_path / "x.sbwt")
    assert main(["sbwt-build", "-i", str(unitigs), "-o", sbwt_path, "-k", "4"]) == 0
    prefix = str(tmp_path / "idx")
    assert main(["build-fmin", "-o", prefix, "-i", sbwt_path, "-u", str(unitigs)]) == 0
    return tmp_path, prefix


def test_build_and_search_cli(built_index, capsys):
    tmp_path, prefix = built_index
    # 7 index files exist
    for suffix in [".O.sdsl", ".FBV.sdsl", ".packed_unitigs.sdsl",
                   ".unitig_endpoints.sdsl", ".Ustart.sdsl", ".LCS.sdsl", ".sbwt"]:
        assert os.path.exists(prefix + suffix), suffix
    # build stats file: "1,\n" (rarest leaves result empty, like the reference)
    assert open(prefix + "_stats.txt").read() == "1,\n"

    query = tmp_path / "q.fna"
    write_fasta(query, ["AAGTAA"])
    out = tmp_path / "out.txt"
    assert main(["search-fmin", "-o", str(out), "-i", prefix, "-q", str(query)]) == 0
    # fixture: fwd {(0,2),(-1,-1),(0,0)}; RC of AAGTAA=TTACTT has no hits,
    # merge leaves (-1,-1) in place
    assert open(out).read() == "(0,2) (-1,-1) (0,0)\n"
    assert os.path.exists(prefix + ".stats")
    assert os.path.exists(prefix + "stats.txt")  # reference's missing-dot name


def test_search_rc_merge_cli(tmp_path):
    unitigs = tmp_path / "u.fna"
    write_fasta(unitigs, ["CGGT", "GGTT", "TACCCGTA"])
    sbwt_path = str(tmp_path / "x.sbwt")
    main(["sbwt-build", "-i", str(unitigs), "-o", sbwt_path, "-k", "4"])
    prefix = str(tmp_path / "idx")
    main(["build-fmin", "-o", prefix, "-i", sbwt_path, "-u", str(unitigs)])

    query = tmp_path / "q.fna"
    write_fasta(query, ["AACCGTACC"])
    out = tmp_path / "out.txt"
    main(["search-fmin", "-o", str(out), "-i", prefix, "-q", str(query)])
    # merged fixture from tests.cpp:267
    assert open(out).read() == "(2,0) (1,0) (0,3) (0,4) (-1,-1) (0,0)\n"


def test_gzip_and_txt_fanout(tmp_path):
    unitigs = tmp_path / "u.fna.gz"
    with gzip.open(unitigs, "wt") as f:
        for s in PAPER_UNITIGS:
            f.write(f">\n{s}\n")
    sbwt_path = str(tmp_path / "x.sbwt")
    assert main(["sbwt-build", "-i", str(unitigs), "-o", sbwt_path, "-k", "4"]) == 0
    prefix = str(tmp_path / "idx")
    assert main(["build-fmin", "-o", prefix, "-i", sbwt_path, "-u", str(unitigs)]) == 0

    q1 = tmp_path / "q1.fna"
    q2 = tmp_path / "q2.fna"
    write_fasta(q1, ["AAGTAA"])
    write_fasta(q2, ["GTAAGTCT"])
    qlist = tmp_path / "queries.txt"
    qlist.write_text(f"{q1}\n{q2}\n")
    o1, o2 = tmp_path / "o1.txt", tmp_path / "o2.txt"
    olist = tmp_path / "outs.txt"
    olist.write_text(f"{o1}\n{o2}\n")
    assert main(["search-fmin", "-o", str(olist), "-i", prefix, "-q", str(qlist)]) == 0
    assert open(o1).read() == "(0,2) (-1,-1) (0,0)\n"
    assert open(o2).read() == "(0,0) (0,1) (0,2) (0,3) (0,4)\n"


def test_stats_modes(tmp_path):
    unitigs = tmp_path / "u.fna"
    write_fasta(unitigs, PAPER_UNITIGS)
    sbwt_path = str(tmp_path / "x.sbwt")
    main(["sbwt-build", "-i", str(unitigs), "-o", sbwt_path, "-k", "4"])
    for typ in ["shortest", "verify"]:
        prefix = str(tmp_path / f"idx_{typ}")
        assert main([
            "build-fmin", "-o", prefix, "-i", sbwt_path, "-u", str(unitigs),
            "--type", typ, "-t", "1",
        ]) == 0
        line = open(prefix + "_stats.txt").read().strip()
        assert line.startswith("1,")
        # count,sum_freq,avg_freq,avg_len,n_kmers
        fields = line.split(",")
        assert len(fields) == 6
        assert int(fields[5]) == 14  # paper example has 14 k-mers

    # shortest and verify agree on (len,freq) multisets for t=1
    s1 = open(str(tmp_path / "idx_shortest") + "_stats.txt").read()
    s2 = open(str(tmp_path / "idx_verify") + "_stats.txt").read()
    assert s1.split(",")[1] == s2.split(",")[1]  # same distinct-finimizer count


def test_bad_variant_header(tmp_path):
    bad = tmp_path / "bad.sbwt"
    import struct
    bad.write_bytes(struct.pack("<Q", 3) + b"foo")
    unitigs = tmp_path / "u.fna"
    write_fasta(unitigs, PAPER_UNITIGS)
    rc = main(["build-fmin", "-o", str(tmp_path / "i"), "-i", str(bad), "-u", str(unitigs)])
    assert rc == 1


def test_unknown_command(capsys):
    assert main(["frobnicate"]) == 1


def test_search_fmin_native_and_python_output_equal(tmp_path, monkeypatch):
    """The native line formatter + flat merge must produce byte-identical
    search-fmin output to the Python fallback (incl. short/invalid reads
    emitting empty lines)."""
    import os

    import numpy as np

    from finito_tpu.cli import main
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(23)
    k = 5
    unitigs = gen_dspss(rng, 10, 8, 40, k)
    fna = str(tmp_path / "u.fna")
    with open(fna, "w") as f:
        for i, u in enumerate(unitigs):
            f.write(f">u{i}\n{u}\n")
    q = str(tmp_path / "q.fna")
    with open(q, "w") as f:
        f.write(f">q0\n{unitigs[0]}\n>q1\nAC\n>q2\nACGTNNACGT\n")
        f.write(f">q3\n{unitigs[1]}\n")
    sbwt_f, prefix = str(tmp_path / "x.sbwt"), str(tmp_path / "p")
    assert main(["sbwt-build", "-k", str(k), "-i", fna, "-o", sbwt_f]) == 0
    assert main(["build-fmin", "-o", prefix, "-i", sbwt_f, "-u", fna]) == 0
    o_nat = str(tmp_path / "nat.txt")
    assert main(["search-fmin", "-o", o_nat, "-i", prefix, "-q", q,
                 "--engine", "minimizer"]) == 0
    o_py = str(tmp_path / "py.txt")
    monkeypatch.setenv("FINITO_NO_NATIVE", "1")
    assert main(["search-fmin", "-o", o_py, "-i", prefix, "-q", q,
                 "--engine", "minimizer"]) == 0
    monkeypatch.delenv("FINITO_NO_NATIVE")
    a, b = open(o_nat).read(), open(o_py).read()
    assert a == b
    assert a.count("\n") == 4
    # short read -> empty line; oracle engine agrees too
    o_orc = str(tmp_path / "orc.txt")
    assert main(["search-fmin", "-o", o_orc, "-i", prefix, "-q", q]) == 0
    assert open(o_orc).read() == a


def test_unitigs_pipeline_end_to_end(tmp_path):
    """reads -> unitigs -> sbwt-build -> build-fmin -> search-fmin with no
    external tool (the reference needs ggcat for the unitigs step)."""
    import numpy as np

    rng = np.random.default_rng(5)
    reads = tmp_path / "reads.fna"
    with open(reads, "w") as f:
        for i in range(6):
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, 200))
            f.write(f">r{i}\n{s}\n")
    uni = str(tmp_path / "unitigs.fna")
    sbwt = str(tmp_path / "x.sbwt")
    pfx = str(tmp_path / "p.")
    out = str(tmp_path / "out.txt")
    assert main(["unitigs", "-i", str(reads), "-o", uni, "-k", "11"]) == 0
    assert main(["sbwt-build", "-k", "11", "-i", uni, "-o", sbwt]) == 0
    assert main(["build-fmin", "-o", pfx, "-i", sbwt, "-u", uni]) == 0
    assert main(["search-fmin", "-o", out, "-i", pfx, "-q", str(reads)]) == 0
    txt = open(out).read()
    # the canonical k-mer set covers every read window (fwd or RC)
    assert txt.count("(-1,-1)") == 0
    assert len(txt.splitlines()) == 6


def test_prefix_with_variant_headed_finito_sbwt(tmp_path):
    """A `finito sbwt-build` output (variant string + FINSBWT1) copied
    verbatim into an index prefix as <prefix>.sbwt must load (the
    defensive case load_sbwt_member's docstring promises)."""
    import shutil

    from finito_tpu.index.index import FinimizerIndex

    rng = np.random.default_rng(9)
    uni = tmp_path / "u.fna"
    with open(uni, "w") as f:
        f.write(">0\n" + "".join("ACGT"[c] for c in rng.integers(0, 4, 80)) + "\n")
    sbwt = str(tmp_path / "x.sbwt")
    pfx = str(tmp_path / "p")
    assert main(["sbwt-build", "-k", "7", "-i", str(uni), "-o", sbwt]) == 0
    assert main(["build-fmin", "-o", pfx, "-i", sbwt, "-u", str(uni)]) == 0
    before = FinimizerIndex.load(pfx)
    # overwrite the prefix member with the variant-headed standalone file
    shutil.copy(sbwt, pfx + ".sbwt")
    idx = FinimizerIndex.load(pfx)
    assert idx.sbwt.get_k() == 7
    assert idx.sbwt.number_of_kmers() == before.sbwt.number_of_kmers()
