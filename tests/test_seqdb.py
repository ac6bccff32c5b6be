import numpy as np

from peregrine_tpu.io.seqdb import (
    SeqDB, ORIGINAL, REVERSED, decode_biseq, encode_biseq,
    packed_to_codes, read_fastx, revcomp, seq_to_codes,
)
from tests.conftest import random_seq


def test_encode_decode_roundtrip(rng):
    seq = random_seq(rng, 1000)
    packed = encode_biseq(seq)
    assert decode_biseq(packed, ORIGINAL) == seq
    assert decode_biseq(packed, REVERSED) == revcomp(seq)


def test_codes(rng):
    seq = random_seq(rng, 500)
    packed = encode_biseq(seq)
    np.testing.assert_array_equal(packed_to_codes(packed, ORIGINAL),
                                  seq_to_codes(seq))
    np.testing.assert_array_equal(packed_to_codes(packed, REVERSED),
                                  seq_to_codes(revcomp(seq)))


def test_n_bases_roundtrip():
    seq = b"ACGTNNACGT"
    packed = encode_biseq(seq)
    assert decode_biseq(packed, ORIGINAL) == seq
    # N complements to N
    assert decode_biseq(packed, REVERSED) == b"ACGTNNACGT"[::-1].translate(
        bytes.maketrans(b"ACGT", b"TGCA"))


def test_seqdb_files(tmp_path, rng):
    reads = [(f"read/{i}", random_seq(rng, rng.integers(100, 400))) for i in range(20)]
    db = SeqDB.from_reads(reads)
    prefix = str(tmp_path / "seqdb" / "test")
    db.save(prefix)

    # idx format: "%09d name len offset"
    lines = open(prefix + ".idx").read().splitlines()
    assert len(lines) == 20
    rid, name, ln, off = lines[0].split()
    assert rid == "000000000" and name == "read/0" and off == "0"
    assert int(ln) == len(reads[0][1])

    db2 = SeqDB.open(prefix)
    assert len(db2) == 20
    for i, (name, seq) in enumerate(reads):
        assert db2.seq(i) == seq
        assert db2.seq(i, REVERSED) == revcomp(seq)
        assert db2.names[i] == name


def test_build_to_disk_matches_in_memory(tmp_path, rng):
    """The streamed builder must write byte-identical .seqdb/.idx files to
    the in-memory from_reads + save path (same codec, same idx rows)."""
    reads = [(f"read/{i}", random_seq(rng, rng.integers(100, 400)))
             for i in range(25)]
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq.decode()}\n")
    lst = tmp_path / "reads.lst"
    lst.write_text(str(fa) + "\n")

    mem_prefix = str(tmp_path / "mem")
    SeqDB.from_reads(reads).save(mem_prefix)
    disk_prefix = str(tmp_path / "disk")
    db = SeqDB.build_to_disk(str(lst), disk_prefix)

    assert open(mem_prefix + ".seqdb", "rb").read() == \
        open(disk_prefix + ".seqdb", "rb").read()
    assert open(mem_prefix + ".idx").read() == \
        open(disk_prefix + ".idx").read()
    assert db.seq(3) == reads[3][1]


def test_native_fastx_encode_matches_python_oracle(tmp_path, rng):
    """The C++ fastx parser+encoder (fastx.cpp) must produce a
    byte-identical .seqdb/.idx to the Python read_fastx loop across
    wrapped FASTA, 4-line and wrapped FASTQ, gzip, leading junk, blank
    lines, quality lines starting with '@'/'>', and empty sequences."""
    import gzip as _gz

    fa = tmp_path / "a.fa"
    with open(fa, "w") as f:
        f.write("; leading junk\njunk2\n")
        f.write(">r0 extra header words\nACGTAC\nGTNNAC\n\n>empty\n")
        f.write(">r2\nacgtn\n")
    fq = tmp_path / "b.fq"
    with open(fq, "w") as f:
        f.write("@q0 desc\nACGTACGTAC\n+\n@I>IIIIIII\n")
        f.write("@q1\nACGT\nACG\n+q1\n@II\nIII>\n")  # wrapped seq + qual
    fqgz = tmp_path / "c.fq.gz"
    with _gz.open(fqgz, "wt") as f:
        for i in range(30):
            f.write(f"@z{i}\nACGTACGTACGTAC\n+\nIIIIIIIIIIIIII\n")
    lst = tmp_path / "r.lst"
    lst.write_text(f"{fa}\n{fq}\n{fqgz}\n")

    d_py = SeqDB.build_to_disk(str(lst), str(tmp_path / "py"),
                               use_native=False)
    d_cc = SeqDB.build_to_disk(str(lst), str(tmp_path / "cc"),
                               use_native=True)
    assert open(str(tmp_path / "py") + ".idx").read() == \
        open(str(tmp_path / "cc") + ".idx").read()
    assert open(str(tmp_path / "py") + ".seqdb", "rb").read() == \
        open(str(tmp_path / "cc") + ".seqdb", "rb").read()
    assert len(d_py) == len(d_cc) == 35


def test_native_fastx_buffer_spanning_line(tmp_path, rng):
    """A single sequence line larger than the parser's 4 MB read buffer
    exercises the carry path; output must stay byte-identical."""
    big = random_seq(rng, 5_000_000)
    fa = tmp_path / "big.fa"
    with open(fa, "wb") as f:
        f.write(b">huge\n" + big + b"\n>tiny\nACGT\n")
    lst = tmp_path / "r.lst"
    lst.write_text(str(fa) + "\n")
    SeqDB.build_to_disk(str(lst), str(tmp_path / "py"), use_native=False)
    SeqDB.build_to_disk(str(lst), str(tmp_path / "cc"), use_native=True)
    assert open(str(tmp_path / "py") + ".seqdb", "rb").read() == \
        open(str(tmp_path / "cc") + ".seqdb", "rb").read()
    assert open(str(tmp_path / "py") + ".idx").read() == \
        open(str(tmp_path / "cc") + ".idx").read()


def test_fastx_reader(tmp_path, rng):
    fa = tmp_path / "t.fa"
    seqs = {f"s{i}": random_seq(rng, 120) for i in range(3)}
    with open(fa, "w") as f:
        for n, s in seqs.items():
            f.write(f">{n} extra desc\n")
            # multi-line fasta
            f.write(s[:50].decode() + "\n" + s[50:].decode() + "\n")
    got = dict(read_fastx(str(fa)))
    assert {k: v for k, v in got.items()} == seqs


def test_fastq_reader_fourline(tmp_path, rng):
    fq = tmp_path / "t.fq"
    seqs = {f"q{i}": random_seq(rng, 80) for i in range(3)}
    with open(fq, "w") as f:
        for n, s in seqs.items():
            f.write(f"@{n} desc\n{s.decode()}\n+\n{'I' * len(s)}\n")
    assert dict(read_fastx(str(fq))) == seqs


def test_fastq_reader_wrapped(tmp_path, rng):
    """Wrapped (multi-line) FASTQ per kseq semantics (src/kseq.h:100-223):
    sequence until '+', quality consumed BY LENGTH — including quality lines
    that start with '@' or '>'."""
    fq = tmp_path / "w.fq"
    s1, s2 = random_seq(rng, 100), random_seq(rng, 73)
    q1 = b"@" + b"I" * 49 + b"\n" + b">" + b"J" * 49  # trap lines
    with open(fq, "w") as f:
        f.write(f"@r1\n{s1[:40].decode()}\n{s1[40:80].decode()}\n"
                f"{s1[80:].decode()}\n+r1 comment\n{q1.decode()}\n")
        f.write(f"@r2\n{s2[:50].decode()}\n{s2[50:].decode()}\n"
                f"+\n{'K' * 30}\n{'K' * 43}\n")
    got = dict(read_fastx(str(fq)))
    assert got == {"r1": s1, "r2": s2}


def test_fastx_reader_gz_and_junk(tmp_path, rng):
    import gzip
    fa = tmp_path / "t.fa.gz"
    s = random_seq(rng, 90)
    with gzip.open(fa, "wt") as f:
        f.write("; leading junk kseq skips\n\n")
        f.write(f">only read\n{s[:30].decode()}\n\n{s[30:].decode()}\n")
    assert dict(read_fastx(str(fa))) == {"only": s}


def test_fastx_mixed_fasta_fastq(tmp_path, rng):
    """kseq treats '>' and '@' records uniformly within one file."""
    fx = tmp_path / "m.fx"
    s1, s2 = random_seq(rng, 60), random_seq(rng, 40)
    with open(fx, "w") as f:
        f.write(f">a\n{s1.decode()}\n@b\n{s2.decode()}\n+\n{'I' * 40}\n")
    assert dict(read_fastx(str(fx))) == {"a": s1, "b": s2}


def test_padded_batch(rng):
    reads = [(f"r{i}", random_seq(rng, 50 + i)) for i in range(4)]
    db = SeqDB.from_reads(reads)
    batch, lens = db.padded_code_batch([0, 1, 2, 3], 64)
    assert batch.shape == (4, 64)
    np.testing.assert_array_equal(lens, [50, 51, 52, 53])
    assert (batch[0, 50:] == 4).all()
    np.testing.assert_array_equal(batch[2, :52], seq_to_codes(reads[2][1]))
