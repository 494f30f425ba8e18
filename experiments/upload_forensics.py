"""Host->device link forensics: explain the at-scale upload & fetch walls.

Round-3 facts (artifacts/r3/chain5): both bank-upload paths (whole-bank
device-gather AND slab-pipelined _place_rows) run 5-13x slower than the
probed 46 MiB/s wire (131k: 296 s for 2 GiB; 262k: 1216 s for 4 GiB), and
the prune stage's per-chunk count fetches swung 80x between chains (5.8 s
vs 470 s for 129 tiny fetches). The h2d_probe only measured the best of
two plain device_put reps, so it cannot tell engine-path overhead from
wire erratics. This probe can: it interleaves A/B/A in one session.

Measured, per round (3 rounds), on fresh bytes every rep:
  put_probe   - plain device_put, uniform 0..63 bytes (h2d_probe's data)
  put_hll     - plain device_put, real HLL-register-distributed bytes
                (mostly zeros - distinguishes relay compression)
  put_zeros   - plain device_put, all-zero bytes (max compressible)
  put_engine  - the engine slab path: arena gather + device_put +
                donated _place_rows, per-phase wall split
  put_async   - device_put dispatch-return time vs block time (is the
                relay put synchronous?)
  fetch_small - 48 back-to-back tiny-count fetches after gate-shaped
                dispatches (the prune stage's exact access pattern),
                per-fetch latency percentiles

One JSON line per measurement. Run serialized on the TPU tunnel.

Usage: python experiments/upload_forensics.py [--mb 128] [--rounds 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def hll_bytes(rng, nbytes):
    """Bytes with the real HLL-register marginal (p=14, ~2k items/genome:
    ~87% zeros, the rest geometric) - the distribution the bank upload
    actually ships."""
    # P(reg = 0) = (1 - 1/m)^items ~ 0.88; nonzero ranks ~ geometric.
    out = np.zeros(nbytes, np.uint8)
    nz = rng.random(nbytes) > 0.88
    out[nz] = np.minimum(rng.geometric(0.5, size=int(nz.sum())), 40)
    return out


def timed_put(jax, dev, host):
    t0 = time.perf_counter()
    d = jax.device_put(host, dev)
    t_ret = time.perf_counter() - t0
    d.block_until_ready()
    t_done = time.perf_counter() - t0
    del d
    return t_ret, t_done


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.parallel.screened import (
        _place_rows, _gate_counts)

    dev = jax.devices()[0]
    emit(what="device", device=str(dev), backend=jax.default_backend())
    if jax.default_backend() == "cpu":
        raise SystemExit("forensics must run on the TPU backend")

    rng = np.random.default_rng(0xF0E)
    nbytes = args.mb << 20
    mib = args.mb

    # register-bank shaping for the engine path: rows of 16 KiB
    r = 16384
    slab_rows = nbytes // r
    buf_rows = slab_rows * 2

    for rnd in range(args.rounds):
        # --- plain puts, three entropy levels, fresh bytes each ---
        for name, data in (
            ("put_probe", rng.integers(0, 64, size=nbytes, dtype=np.uint8)),
            ("put_hll", hll_bytes(rng, nbytes)),
            ("put_zeros", np.zeros(nbytes, np.uint8)),
        ):
            t_ret, t_done = timed_put(jax, dev, data)
            emit(what=name, round=rnd, mib=mib, ret_secs=t_ret,
                 done_secs=t_done, mib_per_s=mib / t_done)

        # --- engine slab path: gather + put + donated place ---
        src = hll_bytes(rng, buf_rows * r).reshape(buf_rows, r)
        order = rng.permutation(buf_rows)
        arena = np.empty((slab_rows, r), np.uint8)
        buf = jnp.zeros((buf_rows, r), jnp.uint8)
        buf.block_until_ready()
        t_all0 = time.perf_counter()
        phases = {"gather": 0.0, "put_ret": 0.0, "place_ret": 0.0,
                  "token_wait": 0.0}
        token = None
        for k0 in (0, slab_rows):
            t0 = time.perf_counter()
            np.take(src, order[k0:k0 + slab_rows], axis=0, out=arena)
            phases["gather"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            d_slab = jax.device_put(arena, dev)
            phases["put_ret"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            buf, token = _place_rows(buf, d_slab, jnp.int32(k0))
            phases["place_ret"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            token.block_until_ready()
            phases["token_wait"] += time.perf_counter() - t0
        buf.block_until_ready()
        total = time.perf_counter() - t_all0
        emit(what="put_engine", round=rnd, mib=2 * mib, total_secs=total,
             mib_per_s=2 * mib / total,
             **{k: round(v, 3) for k, v in phases.items()})
        del buf, src

        # --- prune-shaped fetch latency: gate dispatches then fetches ---
        n_rows = 1 << 17
        d_e = jnp.asarray(
            np.sort(rng.integers(1500, 2500, n_rows)).astype(np.float32))
        d_fp = jnp.asarray(
            rng.integers(-(1 << 31), 1 << 31, size=(n_rows, 2),
                         dtype=np.int64).astype(np.int32))
        nb = n_rows // 512
        pend = []
        t0 = time.perf_counter()
        n_disp = 48
        for i in range(n_disp):
            rt = rng.integers(0, nb, 256).astype(np.int32)
            ct = np.maximum(rt, rng.integers(0, nb, 256).astype(np.int32))
            pend.append(_gate_counts(
                d_e, d_fp, jnp.asarray(rt), jnp.asarray(ct),
                jnp.int32(n_rows), jnp.float32(0.899), 2, 512, True, True))
        t_disp = time.perf_counter() - t0
        lats = []
        for g in pend:
            t0 = time.perf_counter()
            np.asarray(g)
            lats.append(time.perf_counter() - t0)
        lats_s = sorted(lats)
        emit(what="fetch_small", round=rnd, n=n_disp,
             dispatch_secs=t_disp,
             fetch_total_secs=sum(lats),
             lat_ms_p50=lats_s[len(lats) // 2] * 1e3,
             lat_ms_p90=lats_s[int(len(lats) * 0.9)] * 1e3,
             lat_ms_max=lats_s[-1] * 1e3)
        # single-fetch variant: device-side concat, one D2H
        pend = []
        for i in range(n_disp):
            rt = rng.integers(0, nb, 256).astype(np.int32)
            ct = np.maximum(rt, rng.integers(0, nb, 256).astype(np.int32))
            pend.append(_gate_counts(
                d_e, d_fp, jnp.asarray(rt), jnp.asarray(ct),
                jnp.int32(n_rows), jnp.float32(0.899), 2, 512, True, True))
        t0 = time.perf_counter()
        np.asarray(jnp.concatenate(pend))
        emit(what="fetch_concat", round=rnd, n=n_disp,
             fetch_total_secs=time.perf_counter() - t0)
        del d_e, d_fp, pend

    emit(what="done")


if __name__ == "__main__":
    main()
