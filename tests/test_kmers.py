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
