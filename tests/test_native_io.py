"""Native C++ parser/encoder vs the pure-Python reader: identical output
on FASTA, FASTQ, gzip, multi-line FASTA, CRLF, and malformed inputs."""

import gzip
import os

import numpy as np
import pytest

from finito_tpu.native import get_lib, parse_fastx_bytes
from finito_tpu.io.seqdb import SeqDB, encode_seq

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no g++?)"
)

FASTA = b">r1 desc\nACGTacgt\nNNGG\n>r2\nTTTT\n"
FASTQ = b"@q1\nACGTN\n+\nIIIII\n@q2 x\nGG\n+anything\nII\n"


def python_parse(data, tmp_path, name):
    p = tmp_path / name
    p.write_bytes(data)
    from finito_tpu.io.fastx import read_all_records

    recs = read_all_records(str(p))
    headers = [h for h, _ in recs]
    codes = [encode_seq(bytes(s)) for _, s in recs]
    concat = np.concatenate(codes) if codes else np.zeros(0, np.uint8)
    ends = np.cumsum([c.size for c in codes]).astype(np.int64)
    return concat, ends, headers


@pytest.mark.parametrize("data,name", [(FASTA, "a.fna"), (FASTQ, "a.fq")])
def test_native_matches_python(data, name, tmp_path):
    want = python_parse(data, tmp_path, name)
    got = parse_fastx_bytes(data)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2] == want[2]


def test_crlf_and_trailing_noeol(tmp_path):
    data = b">h\r\nACGT\r\nGG"
    want = python_parse(data, tmp_path, "b.fna")
    got = parse_fastx_bytes(data)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2] == want[2]


def test_seqdb_from_file_gzip(tmp_path):
    p = tmp_path / "c.fna.gz"
    with gzip.open(p, "wb") as f:
        f.write(FASTA)
    db = SeqDB.from_file(str(p))
    assert db.headers == [b"r1 desc", b"r2"]
    assert db.get_bytes(1) == b"TTTT"
    # native and python paths agree
    os.environ["FINITO_NO_NATIVE"] = "1"
    try:
        db2 = SeqDB.from_file(str(p))
    finally:
        del os.environ["FINITO_NO_NATIVE"]
    np.testing.assert_array_equal(db.concat, db2.concat)
    np.testing.assert_array_equal(db.ends, db2.ends)
    assert db.headers == db2.headers


def test_malformed_fastq():
    with pytest.raises(ValueError):
        parse_fastx_bytes(b"@q\nACGT\nIIII\n")  # missing '+' line
    with pytest.raises(ValueError):
        parse_fastx_bytes(b"@q\nACGT\n+\nII\n")  # qual length mismatch


def test_encode_and_revcomp():
    import ctypes

    lib = get_lib()
    raw = np.frombuffer(b"ACGTNacgt", dtype=np.uint8).copy()
    out = np.empty(raw.size, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ftx_encode(raw.ctypes.data_as(u8p), raw.size, out.ctypes.data_as(u8p))
    np.testing.assert_array_equal(out, encode_seq(b"ACGTNacgt"))
    rc = np.empty(out.size, dtype=np.uint8)
    lib.ftx_revcomp_codes(out.ctypes.data_as(u8p), out.size, rc.ctypes.data_as(u8p))
    want = np.array([3 - c if c <= 3 else c for c in out[::-1]], dtype=np.uint8)
    np.testing.assert_array_equal(rc, want)
