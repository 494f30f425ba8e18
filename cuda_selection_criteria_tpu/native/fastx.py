"""ctypes bindings for the native fastx library (libfastx.so).

Builds on demand via the sibling Makefile; every entry point degrades
gracefully to the pure-Python path when the toolchain is unavailable.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastx.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        # Rebuild when missing OR stale: libfastx.so is a gitignored
        # per-machine artifact, so after a pull it can predate fastx.cpp
        # and lack newly added symbols (the Makefile's fastx.cpp
        # dependency makes `make` a no-op when fresh).
        src = os.path.join(_DIR, "fastx.cpp")
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(src)
                     and os.path.getmtime(_SO) < os.path.getmtime(src)))
        if stale:
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                if not os.path.exists(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        try:
            _bind(lib)
        except AttributeError:
            # Stale .so without the full symbol set and no working
            # toolchain to rebuild it: degrade to the numpy paths
            # rather than crash callers' ImportError/OSError fallbacks.
            return None
        _LIB = lib
        return _LIB


def _bind(lib):
    lib.fastx_read_codes.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fastx_read_codes.restype = ctypes.c_int
    lib.fastx_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.fastx_free.restype = None
    lib.fastx_build_sketches.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint,
        ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.fastx_build_sketches.restype = ctypes.c_int64
    lib.fastx_read_hll_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fastx_read_hll_batch.restype = ctypes.c_int
    lib.fastx_read_smh_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.fastx_read_smh_batch.restype = ctypes.c_int
    lib.fastx_pair_union_hist.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fastx_pair_union_hist.restype = ctypes.c_int
    lib.fastx_pack_bitplanes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fastx_pack_bitplanes.restype = ctypes.c_int
    lib.fastx_value_presence.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fastx_value_presence.restype = ctypes.c_int
    lib.fastx_gather_pack_bitplanes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fastx_gather_pack_bitplanes.restype = ctypes.c_int


def available():
    return _load() is not None


def fasta_codes(path):
    """Native FASTA -> uint8 code array (0..3 bases, 4 = reset)."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int64()
    rc = lib.fastx_read_codes(path.encode(), ctypes.byref(out),
                              ctypes.byref(out_len))
    if rc != 0:
        raise IOError(f"fastx_read_codes({path}) failed: rc={rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.fastx_free(out)
    return arr


def build_sketches(path, k=31, p=14, p_aux=0, m=0):
    """Single-pass host build: (regs, regs_aux | None, smh | None, n_kmers)."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    regs = np.zeros(1 << p, np.uint8)
    regs_aux = np.zeros(1 << p_aux, np.uint8) if p_aux else None
    smh = np.zeros(m, np.uint64) if m else None
    n = lib.fastx_build_sketches(
        path.encode(),
        k,
        p,
        regs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        p_aux,
        regs_aux.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if regs_aux is not None
        else None,
        m,
        smh.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        if smh is not None
        else None,
    )
    if n < 0:
        raise IOError(f"fastx_build_sketches({path}) failed")
    return regs, regs_aux, smh, int(n)


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def read_hll_batch(paths, p, threads=16):
    """Threaded batch load of .hll files into a packed (N, 2^p) bank."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    out = np.empty((len(paths), 1 << p), np.uint8)
    rc = lib.fastx_read_hll_batch(
        _paths_array(paths), len(paths), threads, p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"fastx_read_hll_batch failed: rc={rc}")
    return out


def pair_union_hist(regs, ii, kk, threads=None):
    """Fused gather+max+histogram over index-paired rows of a uint8
    register bank: (B, 64) int64 exact counts of max(regs[i], regs[k]).
    Single pass per register byte (the numpy form re-streams the merged
    array through an int64 widen + bincount)."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    regs = np.ascontiguousarray(regs, np.uint8)
    ii = np.ascontiguousarray(ii, np.int64)
    kk = np.ascontiguousarray(kk, np.int64)
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    out = np.empty((len(ii), 64), np.int64)
    rc = lib.fastx_pair_union_hist(
        regs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        regs.shape[0],
        regs.shape[1],
        ii.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        kk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ii),
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError(f"fastx_pair_union_hist failed: rc={rc}")
    return out


def read_smh_batch(paths, m, threads=16):
    """Threaded batch load of .smh{m} files into a packed (N, m) array."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    out = np.empty((len(paths), m), np.uint64)
    rc = lib.fastx_read_smh_batch(
        _paths_array(paths), len(paths), threads, m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise IOError(f"fastx_read_smh_batch failed: rc={rc}")
    return out


def pack_bitplanes(rows, lut256, k, out, threads=None):
    """Bit-plane pack of uint8 register rows (ops/regpack layout) in one
    native pass: out (S, k, R//8) uint8, little bit order. rows/out must
    be C-contiguous; raises ImportError when the library is unbuilt."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    assert rows.flags.c_contiguous and out.flags.c_contiguous
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    rc = lib.fastx_pack_bitplanes(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.shape[0],
        rows.shape[1],
        np.ascontiguousarray(lut256, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        int(k),
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"fastx_pack_bitplanes failed: rc={rc}")
    return out


def value_presence(data, threads=None):
    """(256,) bool: which byte values occur in the (contiguous uint8)
    array - one native linear pass (ops/screen.bank_values backend)."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    flat = data.reshape(-1)
    assert flat.flags.c_contiguous and flat.dtype == np.uint8
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    out = np.zeros(256, np.uint8)
    rc = lib.fastx_value_presence(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"fastx_value_presence failed: rc={rc}")
    return out.astype(bool)


def gather_pack_bitplanes(bank, idx, lut256, k, out, threads=None):
    """Fused gather+pack: out[b] = bit-planes of lut256[bank[idx[b]]] in
    one native pass (no intermediate gathered slab)."""
    lib = _load()
    if lib is None:
        raise ImportError("libfastx.so unavailable")
    assert bank.flags.c_contiguous and out.flags.c_contiguous
    idx = np.ascontiguousarray(idx, np.int64)
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    rc = lib.fastx_gather_pack_bitplanes(
        bank.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bank.shape[0],
        bank.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        np.ascontiguousarray(lut256, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        int(k),
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"fastx_gather_pack_bitplanes failed: rc={rc}")
    return out
