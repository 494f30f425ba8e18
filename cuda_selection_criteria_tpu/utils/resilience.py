"""Transient-fault handling for the accelerator path.

The reference has no failure handling at all: CUDA return codes are
unchecked and the kernel-launch error peek is compiled out by -DNDEBUG
(reference: src/selection_cuda.cpp:160-180, src/selection_kernels.cu:142-147,
Makefile:33). On a networked accelerator (tunnel / pod), transient backend
faults (FAILED_PRECONDITION on a relay hiccup, UNAVAILABLE, connection
resets) are routine and recoverable: the observed failure mode is a single
request dying while an immediate retry succeeds (round-1 driver capture).

Policy: classify, back off, clear JAX's caches, retry the whole operation
once in-process. Long sweeps additionally persist per-chunk progress
(ScreenPlan.screen_tiles(checkpoint=...)), so even a process death resumes
without recomputing completed work.
"""

import sys
import time


def is_transient(exc):
    """Heuristic classification of recoverable backend faults."""
    name = type(exc).__name__
    msg = str(exc)
    return (
        "XlaRuntimeError" in name
        or "JaxRuntimeError" in name
        or any(tag in msg for tag in (
            "FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
            "RESOURCE_EXHAUSTED", "connection", "Connection",
        ))
    )


def run_with_transient_retry(fn, max_attempts=2, backoff=15.0):
    """Run fn(); on a transient backend fault, back off, drop JAX's cached
    computations/arrays, and retry (max_attempts total)."""
    for attempt in range(1, max_attempts + 1):
        try:
            return fn()
        except SystemExit:
            raise
        except Exception as exc:  # noqa: BLE001 - classified below
            if attempt >= max_attempts or not is_transient(exc):
                raise
            print(
                f"transient backend fault (attempt {attempt}/"
                f"{max_attempts}): {type(exc).__name__}: "
                f"{str(exc)[:200]}; retrying in {backoff:.0f}s",
                file=sys.stderr, flush=True,
            )
            time.sleep(backoff)
            try:
                import jax

                jax.clear_caches()
            except Exception:  # noqa: BLE001 - best effort
                pass
