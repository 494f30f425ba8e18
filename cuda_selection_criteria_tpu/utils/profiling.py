"""Profiling/tracing helpers (SURVEY.md section 5).

The reference's only instrumentation is a chrono macro pair printed as CSV
(include/metrictime2.hpp:9-17), and its GPU timings famously wrap the
asynchronous kernel LAUNCH only (experiments/src/time_smh_cuda.cpp:279-283).
Here:

  * `timed()` wraps a region with a completion barrier (block_until_ready
    on whatever the body returns) so device work is actually inside the
    measurement;
  * `device_trace()` wraps a region in a jax.profiler trace whose artifact
    loads in TensorBoard/XProf/Perfetto for per-kernel timelines.
"""

import time
from contextlib import contextmanager

import jax


@contextmanager
def timed(label, sink=None):
    """Wall-clock a region; `sink(label, seconds)` or print a CSV row
    (`label;seconds`, the reference's TIMERSTART/TIMERSTOP shape)."""
    t0 = time.perf_counter()
    result = {}
    try:
        yield result
    finally:
        if result:
            jax.block_until_ready(list(result.values()))
        dt = time.perf_counter() - t0
        if sink is not None:
            sink(label, dt)
        else:
            print(f"{label};{dt}")


@contextmanager
def device_trace(log_dir):
    """jax.profiler trace of the region -> TensorBoard-loadable artifact."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
