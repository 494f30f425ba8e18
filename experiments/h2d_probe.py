"""H2D / D2H bandwidth + round-trip latency probe through the axon tunnel.

The confirm-stage and big-bank upload designs hinge on three numbers this
probe measures directly on the real chip (serialized chain, one process):

  - round-trip latency of a tiny blocking fetch (bounds any chunked
    host<->device protocol: pairs/s <= chunk / latency);
  - H2D bandwidth vs transfer size (bounds bank upload at 131k-524k rows,
    2-8 GiB of int8 registers);
  - D2H bandwidth vs transfer size (bounds counts-first candidate fetch
    and the int16 confirm-histogram fetch).

Every rep uses FRESH buffer contents - the relay caches identical
computations (CLAUDE.md), so repeating a byte-identical transfer would
measure the cache, not the wire.

Usage: python experiments/h2d_probe.py [--max-mb 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- round-trip latency: tiny blocking fetch, fresh value each time ---
    lat = []
    for i in range(10):
        x = jnp.float32(i + 0.5)
        t0 = time.perf_counter()
        float(x)  # blocking scalar fetch
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(lat)[len(lat) // 2] * 1e3
    print(f"roundtrip_latency_ms median={lat_ms:.1f} "
          f"min={min(lat) * 1e3:.1f} max={max(lat) * 1e3:.1f}", flush=True)

    sizes_mb = [m for m in (16, 64, 256, 512, 1024) if m <= args.max_mb]

    # --- H2D: device_put of fresh host int8 arrays ---
    rng = np.random.default_rng(0x42D)
    for mb in sizes_mb:
        n = mb * 2**20
        best = 0.0
        for _ in range(args.reps):
            host = rng.integers(0, 64, size=n, dtype=np.int8)
            t0 = time.perf_counter()
            d = jax.device_put(host, dev)
            d.block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, n / dt / 2**20)
            del d
        print(f"h2d {mb:5d} MiB: {best:8.1f} MiB/s", flush=True)

    # --- D2H: fetch device-generated arrays (fresh values per rep) ---
    for mb in [1, 16] + [m for m in (64, 256) if m <= args.max_mb]:
        n = mb * 2**20
        best = 0.0
        for r in range(args.reps):
            d = (jnp.arange(n, dtype=jnp.int32) % 251 + r).astype(jnp.int8)
            d.block_until_ready()
            t0 = time.perf_counter()
            h = np.asarray(d)
            dt = time.perf_counter() - t0
            best = max(best, n / dt / 2**20)
            del d, h
        print(f"d2h {mb:5d} MiB: {best:8.1f} MiB/s", flush=True)

    # --- small-fetch regime: what the confirm stage actually does ---
    # int16 histograms, chunk pairs x 2^p bins (p=10 -> 2 KiB/pair).
    for chunk in (256, 8192, 32768):
        nbytes = chunk * 1024 * 2
        d = (jnp.arange(nbytes // 2, dtype=jnp.int32) % 97).astype(jnp.int16)
        d.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(d)
        dt = time.perf_counter() - t0
        print(f"confirm-shaped fetch chunk={chunk:6d} "
              f"({nbytes / 2**20:7.2f} MiB): {dt * 1e3:8.1f} ms "
              f"-> {chunk / dt:10.0f} pairs/s ceiling", flush=True)

    print("h2d_probe done", flush=True)


if __name__ == "__main__":
    main()
