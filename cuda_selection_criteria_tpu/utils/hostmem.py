"""Host allocator tuning for lazily-faulted VM memory.

The selection cascade's host stages (bank sort/pad, the exact-confirm
register scans, npz checkpoint loads) churn through multi-hundred-MB
numpy temporaries. glibc malloc serves those via mmap and munmaps them
on free, so every batch faults fresh pages - and on micro-VM hosts that
restore guest memory lazily (userfaultfd-backed snapshots), first-touch
faults cost tens of microseconds each: measured on this box, a gathered
134 MB numpy temporary faults in at ~13 MB/s while the same buffer
reused is ~60x faster (the compute itself is ~1 s).

Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps large blocks in the
main arena where freed pages are REUSED, so the fault cost is paid once
per high-water mark instead of once per allocation. This mirrors the
reference engine's reliance on resident std::vector buffers that live
for the whole run (src/selection.cpp:118-150) rather than per-batch
allocation.

No-op (returns False) on non-glibc platforms or if mallopt fails.
"""

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_enabled = None


def enable_arena_reuse(threshold_bytes=1 << 30):
    """Keep allocations below threshold_bytes in the reusable main arena.

    Idempotent; safe to call from every CLI / experiment entry point.
    Returns True when the mallopt calls took effect.
    """
    global _enabled
    if _enabled is not None:
        return _enabled
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes))
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)) and ok
        _enabled = ok
    except (OSError, AttributeError):
        _enabled = False
    return _enabled
