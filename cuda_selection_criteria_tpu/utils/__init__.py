"""Host-side utilities: file formats, FASTA ingest, timing, config."""

from . import formats, fasta, filelist, timer, profiling

__all__ = ["formats", "fasta", "filelist", "timer"]
