import gzip

import numpy as np
import pytest

from finito_tpu.io.fastx import (
    SequenceReader,
    SequenceWriter,
    figure_out_file_format,
    read_all_records,
    reverse_complement,
)
from finito_tpu.io.seqdb import SeqDB, decode_seq, encode_seq


def test_reverse_complement():
    assert reverse_complement(b"ACGT") == b"ACGT"
    assert reverse_complement(b"AACCGTACC") == b"GGTACGGTT"  # ref tests.cpp:265
    assert reverse_complement("TACAAAAAAA") == "TTTTTTTGTA"
    assert reverse_complement(b"acgt") == b"acgt"


def test_fasta_multiline(tmp_path):
    p = tmp_path / "x.fna"
    p.write_bytes(b">seq one\nACGT\nACG\n\n>two\nTTTT\n")
    recs = read_all_records(str(p))
    assert recs == [(b"seq one", b"ACGTACG"), (b"two", b"TTTT")]
    fmt = figure_out_file_format(str(p))
    assert fmt.fasta and not fmt.gzipped


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2\nGGTA\n+anything\nJJJJ\n")
    recs = read_all_records(str(p))
    assert recs == [(b"r1", b"ACGT"), (b"r2", b"GGTA")]
    fmt = figure_out_file_format(str(p))
    assert not fmt.fasta


def test_fastq_multiline_rejected(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGT\nACGT\n+\nIIIIIIII\n")
    with pytest.raises(ValueError):
        read_all_records(str(p))


def test_gzip_autodetect(tmp_path):
    p = tmp_path / "x.fna.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACACGT\n")
    fmt = figure_out_file_format(str(p))
    assert fmt.gzipped and fmt.fasta
    assert read_all_records(str(p)) == [(b"a", b"ACACGT")]
    # gzipped content without .gz extension (magic-byte detection)
    p2 = tmp_path / "y.fna"
    p2.write_bytes(p.read_bytes())
    assert figure_out_file_format(str(p2)).gzipped


def test_writer_roundtrip(tmp_path):
    p = str(tmp_path / "w.fna.gz")
    with SequenceWriter(p) as w:
        w.write_record(b"h1", b"ACGTT")
        w.write_record(b"h2", b"GGG")
    assert read_all_records(p) == [(b"h1", b"ACGTT"), (b"h2", b"GGG")]


def test_seqdb(tmp_path):
    db = SeqDB.from_sequences([b"ACGT", b"ggta", b"TNT"])
    assert len(db) == 3
    assert db.get_bytes(0) == b"ACGT"
    assert db.get_bytes(1) == b"GGTA"  # case-insensitive encode
    assert db.get_codes(2)[1] == 255  # N
    np.testing.assert_array_equal(db.lengths(), [4, 4, 3])
    batch, lens = db.padded_batch(pad_to_multiple=8)
    assert batch.shape == (3, 8)
    assert batch[0, 4] == 255
    np.testing.assert_array_equal(lens, [4, 4, 3])


def test_encode_decode():
    codes = encode_seq(b"ACGTacgt")
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 0, 1, 2, 3])
    assert decode_seq(codes[:4]) == b"ACGT"
