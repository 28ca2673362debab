"""kmer-mapper CLI parity with the reference's Rust binary semantics
(ref_implementation/src/main.rs:42-105): colex-of-first-k-mer unitig
permutation, (u,p)/(-1,-1) output lines, -r RC merge with self-RC skip,
multi-occurrence error, extract-index-unitigs round trip."""

import os
import subprocess
import sys

import numpy as np
import pytest

from finito_tpu import kmer_mapper

EXAMPLE = "/root/reference/ref_implementation/example.fna"


def run_cmd(args, **kw):
    env = dict(os.environ, FINITO_JAX_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, "-m", "finito_tpu.kmer_mapper", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, **kw
    )


@pytest.fixture(scope="module")
def example_index(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("km") / "idx")
    r = run_cmd(["build", "-u", EXAMPLE, "-k", "4", "-o", p])
    assert r.returncode == 0, r.stderr
    return p


def test_permutation_matches_colex(example_index):
    from finito_tpu.index.minimizer import MinimizerIndex
    from finito_tpu.io.seqdb import decode_seq

    mi = MinimizerIndex.load(example_index)
    # example.fna unitigs: ACAGGTA(h=2), GTAGGAAA(h=3), GTAAGTCT(h=1);
    # colex of first 4-mers: GTAA < ACAG < GTAG
    start = 0
    seqs = []
    for e in mi.ends:
        seqs.append(decode_seq(mi.concat[start : int(e)]).decode())
        start = int(e)
    assert seqs == ["GTAAGTCT", "ACAGGTA", "GTAGGAAA"]
    assert mi.headers == [b"1", b"2", b"3"]


def _query_lines(example_index, qfile, extra=()):
    r = run_cmd(["query", "-i", example_index, "-q", qfile, *extra])
    assert r.returncode == 0, r.stderr
    return r.stdout.splitlines()


@pytest.mark.parametrize("extra", [(), ("--host-exact",)])
def test_query_output(example_index, tmp_path, extra):
    q = tmp_path / "q.fna"
    q.write_text(">q1\nACAGGTAAGT\n>q2\nTTTT\n")
    lines = _query_lines(example_index, str(q), extra)
    # ACAGGTAAGT: windows map into ACAGGTA (uid 1) then GTAAGTCT (uid 0)
    assert lines[0] == "(1,0) (1,1) (1,2) (1,3) (0,0) (0,1) (0,2)"
    assert lines[1] == "(-1,-1)"


@pytest.mark.parametrize("extra", [(), ("--host-exact",)])
def test_query_rc_merge(example_index, tmp_path, extra):
    from finito_tpu.io.fastx import reverse_complement

    q = tmp_path / "q.fna"
    # RC of GTAAGTCT; only findable with -r
    q.write_text(">r\n" + reverse_complement(b"GTAAGTCT").decode() + "\n")
    lines = _query_lines(example_index, str(q), extra)
    assert all(p == "(-1,-1)" for p in lines[0].split())
    r = run_cmd(["query", "-i", example_index, "-q", str(q), "-r", *extra])
    assert r.returncode == 0, r.stderr
    # RC window w corresponds to forward window W-1-w: offsets 4,3,2,1,0
    assert r.stdout.splitlines()[0] == "(0,4) (0,3) (0,2) (0,1) (0,0)"


@pytest.mark.parametrize("extra", [(), ("--host-exact",)])
def test_query_multioccurrence_error(tmp_path, extra):
    # the k-mer ACGT occurs in two unitigs -> reference errors out
    # (main.rs:89-92), with or without -r, on both query paths
    u = tmp_path / "u.fna"
    u.write_text(">1\nACGTA\n>2\nCACGT\n")
    p = str(tmp_path / "idx")
    r = run_cmd(["build", "-u", str(u), "-k", "4", "-o", p])
    assert r.returncode == 0, r.stderr
    q = tmp_path / "q.fna"
    q.write_text(">q\nACGT\n")
    r = run_cmd(["query", "-i", p, "-q", str(q), *extra])
    assert r.returncode == 1
    assert "occurs in 2 unitigs" in r.stderr


@pytest.mark.parametrize("extra", [(), ("--host-exact",)])
def test_query_forward_duplicate_error(tmp_path, extra):
    # forward-only duplicate WITHIN one unitig: the reference counts
    # total occurrences, so this errors too, even without -r
    u = tmp_path / "u.fna"
    u.write_text(">1\nAACGTTTAACGTC\n")
    p = str(tmp_path / "idx")
    r = run_cmd(["build", "-u", str(u), "-k", "5", "-o", p])
    assert r.returncode == 0, r.stderr
    q = tmp_path / "q.fna"
    q.write_text(">q\nAACGT\n")
    r = run_cmd(["query", "-i", p, "-q", str(q), *extra])
    assert r.returncode == 1
    assert "occurs in 2 unitigs" in r.stderr
    # a unique k-mer from the same index still answers fine
    q.write_text(">q\nCGTTT\n")
    r = run_cmd(["query", "-i", p, "-q", str(q), *extra])
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines()[0] == "(0,2)"


def test_build_rejects_non_acgt(tmp_path):
    u = tmp_path / "u.fna"
    u.write_text(">1\nACGTNACGT\n")
    r = run_cmd(["build", "-u", str(u), "-k", "4", "-o", str(tmp_path / "idx")])
    assert r.returncode != 0
    assert "non-ACGT" in (r.stderr + r.stdout)


def test_extract_index_unitigs(example_index, tmp_path):
    out = tmp_path / "out.fna"
    r = run_cmd(["extract-index-unitigs", "-i", example_index, "-o", str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_text() == ">1\nGTAAGTCT\n>2\nACAGGTA\n>3\nGTAGGAAA\n"


def test_matches_search_fmin_on_random_dspss(tmp_path):
    """kmer-mapper and search-fmin agree on (u,p) for DSPSS inputs."""
    from tests.test_device_engine import build_index
    from finito_tpu.io.fastx import reverse_complement as _rc

    # DSPSS whose k-mer set is also RC-free: with -r the Rust semantics
    # error whenever a k-mer AND its RC both occur (2 occurrences).
    rng = np.random.default_rng(9)
    k = 6
    seen = set()
    unitigs = []
    while len(unitigs) < 10:
        L = int(rng.integers(8, 41))
        s = "".join(rng.choice(list("ACGT"), L))
        kmers = {s[i : i + k] for i in range(L - k + 1)}
        rcs = {_rc(x.encode()).decode() for x in kmers}
        if len(kmers) != L - k + 1 or (kmers | rcs) & seen or kmers & rcs:
            continue
        seen |= kmers | rcs
        unitigs.append(s)
    u = tmp_path / "u.fna"
    u.write_text("".join(f">{i}\n{s}\n" for i, s in enumerate(unitigs)))
    p = str(tmp_path / "idx")
    r = run_cmd(["build", "-u", str(u), "-k", str(k), "-o", p])
    assert r.returncode == 0, r.stderr

    index = build_index(unitigs, k)
    queries = []
    for _ in range(10):
        s = unitigs[int(rng.integers(len(unitigs)))]
        queries.append(s)
    for _ in range(10):
        queries.append("".join(rng.choice(list("ACGT"), int(rng.integers(k, 25)))))
    q = tmp_path / "q.fna"
    q.write_text("".join(f">q{i}\n{s}\n" for i, s in enumerate(queries)))

    r = run_cmd(["query", "-i", p, "-q", str(q), "-r"])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    from finito_tpu.io.fastx import reverse_complement

    for qs, line in zip(queries, lines):
        fwd = index.search(qs.encode()).local_offsets
        rev = index.search(reverse_complement(qs.encode())).local_offsets
        want = []
        for i in range(len(fwd)):
            want.append(fwd[i] if fwd[i][0] != -1 else rev[len(qs) - k - i])
        got = [
            tuple(int(x) for x in pair.strip("()").split(","))
            for pair in line.split()
        ]
        assert got == want, qs


def test_kmidx_import_roundtrip(tmp_path):
    """KMIDXv01 framing: write_kmidx emits the Rust layout (with a
    structurally-valid placeholder MPHF blob), import_kmidx rebuilds a
    finito index whose occurrence set matches the stored locations, and
    `kmer-mapper query` auto-detects the file and answers identically to
    the FTMIDX pipeline."""
    import numpy as np

    from finito_tpu.io.kmidx import import_kmidx, write_kmidx
    from finito_tpu.index.minimizer import MinimizerIndex
    from finito_tpu import kmer_mapper

    rng = np.random.default_rng(8)
    k = 9
    ends = np.cumsum(rng.integers(k, 120, size=20)).astype(np.int64)
    concat = rng.integers(0, 4, size=int(ends[-1]), dtype=np.uint8)
    index = MinimizerIndex.build(concat, ends, k)
    index.headers = [f"u{i}".encode() for i in range(ends.size)]

    p = str(tmp_path / "rust.kmidx")
    write_kmidx(p, index)
    imported = import_kmidx(p)
    assert imported.k == index.k and imported.m == index.m
    a = np.lexsort((index.occ_off, index.occ_uid))
    b = np.lexsort((imported.occ_off, imported.occ_uid))
    assert np.array_equal(index.occ_uid[a], imported.occ_uid[b])
    assert np.array_equal(index.occ_off[a], imported.occ_off[b])

    # CLI auto-detect: same answers from both containers
    from finito_tpu.io.seqdb import decode_seq

    reads = str(tmp_path / "q.fna")
    with open(reads, "w") as f:
        s = decode_seq(concat[: ends[0] if ends[0] >= k else int(ends[-1])]).decode()
        f.write(f">q0\n{s[: 3 * k]}\n>q1\n{'A' * (k + 3)}\n")
    ft = str(tmp_path / "ft.idx")
    index.serialize(ft)
    o1 = str(tmp_path / "o1.txt")
    o2 = str(tmp_path / "o2.txt")
    assert kmer_mapper.main(["query", "-i", ft, "-q", reads, "-o", o1]) == 0
    assert kmer_mapper.main(["query", "-i", p, "-q", reads, "-o", o2]) == 0
    assert open(o1).read() == open(o2).read()

    # tampered blob framing fails loudly
    raw = bytearray(open(p, "rb").read())
    raw[8:16] = (99).to_bytes(8, "little")  # absurd kmer width
    bad = str(tmp_path / "bad.kmidx")
    open(bad, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(IOError, match="width"):
        import_kmidx(bad)


def test_query_v2_form_matches_v1(tmp_path, monkeypatch):
    """kmer-mapper query through the run-deduplicated engine form (forced
    via env) must produce identical output, including the exact
    multi-occurrence counting used for the 'occurs in N unitigs' error."""
    import numpy as np

    from finito_tpu import kmer_mapper
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(12)
    k = 7
    unitigs = gen_dspss(rng, 12, 10, 50, k)
    fna = str(tmp_path / "u.fna")
    with open(fna, "w") as f:
        for i, u in enumerate(unitigs):
            f.write(f">u{i}\n{u}\n")
    reads = str(tmp_path / "q.fna")
    with open(reads, "w") as f:
        for i in range(9):
            if i % 2 == 0:
                f.write(f">q{i}\n{unitigs[int(rng.integers(len(unitigs)))]}\n")
            else:
                s = "".join(rng.choice(list("ACGT"), int(rng.integers(k, 35))))
                f.write(f">q{i}\n{s}\n")
    idx = str(tmp_path / "km.idx")
    assert kmer_mapper.main(["build", "-u", fna, "-k", str(k), "-o", idx]) == 0
    outs = {}
    for form in ("0", "1"):
        monkeypatch.setenv("FINITO_MINIMIZER_V2", form)
        o = str(tmp_path / f"o{form}.txt")
        assert kmer_mapper.main(["query", "-i", idx, "-q", reads, "-r", "-o", o]) == 0
        outs[form] = open(o).read()
    assert outs["0"] == outs["1"]
    assert outs["0"].count("\n") == 9


def test_exact_alignment_candidates():
    """The Rust reference's seed API (minimizer_index.rs:264-277): every
    in-bounds shifted occurrence of every query k-mer, deduplicated."""
    import numpy as np

    from finito_tpu.index.minimizer import MinimizerIndex

    rng = np.random.default_rng(21)
    ends = np.cumsum(rng.integers(30, 200, size=12)).astype(np.int64)
    concat = rng.integers(0, 4, size=int(ends[-1]), dtype=np.uint8)
    k = 9
    index = MinimizerIndex.build(concat, ends, k)
    starts = np.concatenate([[0], ends[:-1]])
    # a query taken verbatim from unitig 3 must report (3, offset)
    u = 3
    ulen = int(ends[u] - starts[u])
    off = ulen // 3
    qlen = min(ulen - off, 3 * k)
    q = concat[int(starts[u]) + off : int(starts[u]) + off + qlen]
    cands = index.get_exact_alignment_candidates(q)
    assert (u, off) in cands
    # brute-force reference: all positions where the query matches fully
    want = set()
    for uid in range(ends.size):
        s, e = int(starts[uid]), int(ends[uid])
        for a in range(0, e - s - qlen + 1):
            if np.array_equal(concat[s + a : s + a + qlen][: q.size], q):
                want.add((uid, a))
    # candidates are a SUPERSET filter in general; here every candidate
    # k-mer occurs once (DSPSS-ish random text), so equality holds for
    # full-match starts and every full match is found
    assert want <= set(cands)
