"""FASTA ingestion: gzipped (or plain) FASTA -> 2-bit base-code streams.

Replaces the reference's SeqAn SeqFileIn + per-base switch
(src/build_sketch.cpp:43-92) with a host-side byte translation producing the
code encoding consumed by ops.kmers:

  0..3 = A,C,G,T (case-insensitive), 4 = reset sentinel.

A reset sentinel is emitted for every non-ACGT sequence character (N, IUPAC
ambiguity codes, ...) and one per record boundary - both reset the reference
scanner's rolling window (src/build_sketch.cpp:80, record loop at :53).
Newlines/CR inside a record are dropped (SeqAn concatenates sequence lines).

The native C++ reader (native/fastx.cpp) provides the same output faster;
this module falls back to it automatically when the shared library is built.
"""

import gzip
import io

import numpy as np

SENTINEL = np.uint8(4)

_LUT = np.full(256, SENTINEL, np.uint8)
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    _LUT[ord(_ch)] = _code
    _LUT[ord(_ch.lower())] = _code

_SENT_ARR = np.array([SENTINEL], np.uint8)


def _open_maybe_gzip(path):
    fh = open(path, "rb")
    magic = fh.read(2)
    fh.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(fh, "rb")
    return fh


def fasta_codes_py(path):
    """Pure-Python reader: FASTA file -> uint8 code array."""
    chunks = [_SENT_ARR]
    with _open_maybe_gzip(path) as fh:
        buf = io.BufferedReader(fh, buffer_size=1 << 20)
        for line in buf:
            line = line.rstrip(b"\r\n")
            if not line:
                continue
            if line.startswith(b">"):
                chunks.append(_SENT_ARR)
                continue
            chunks.append(_LUT[np.frombuffer(line, np.uint8)])
    if len(chunks) == 1:
        return np.zeros(0, np.uint8)
    return np.concatenate(chunks)


def fasta_codes(path):
    """FASTA -> uint8 code array; uses the native reader when available."""
    try:
        from ..native import fastx  # noqa: PLC0415

        if fastx.available():
            return fastx.fasta_codes(path)
    except ImportError:
        pass
    return fasta_codes_py(path)
