"""Raw screen-kernel tuning sweep (tile size / r_sub / operand dtype).

Measures the fused Pallas screen kernel (ops/screen.screen_s_z) in
isolation - bank resident, fresh tile permutations per rep (the relay
caches identical computations) - across configurations, to pick the
production (ti, r_sub, precision) point. Prints one JSON line per config.

Run on the real TPU; serialized (never alongside another TPU process).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANK = "/tmp/csc_bench_bank_v3_16384x2048.npz"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiles", type=int, default=256,
                    help="tiles per sweep (each ti x ti pairs)")
    ap.add_argument("--configs", default="512:auto:int8,1024:auto:int8,"
                                         "512:2048:int8,256:auto:int8",
                    help="comma list of ti:r_sub:precision[:flag...] - "
                         "flags: 'fpbK' (truncate_values fp_band_log2=K; "
                         "default the library default), 'chunkK' (tiles "
                         "per dispatch; default 64 512x512-equivalents)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import screen

    if not os.path.exists(BANK):
        raise SystemExit(f"bank cache missing: run bench.py first ({BANK})")
    z = np.load(BANK)
    regs = z["regs"]
    n = regs.shape[0]
    all_values = screen.bank_values(regs)
    max_card = float(z["e"].max())
    d_regs = jnp.asarray(regs)
    rng = np.random.default_rng(3)

    for cfg in args.configs.split(","):
        parts = cfg.split(":")
        ti_s, rsub_s, prec = parts[:3]
        flags = parts[3:]
        fpb = next((int(f[3:]) for f in flags if f.startswith("fpb")), None)
        values = (screen.truncate_values(all_values, max_card, 14)
                  if fpb is None else
                  screen.truncate_values(all_values, max_card, 14,
                                         fp_band_log2=fpb))
        ti = int(ti_s)
        r_sub = None if rsub_s == "auto" else int(rsub_s)
        nb = n // ti
        chunk = next((int(f[5:]) for f in flags if f.startswith("chunk")),
                     max(1, (512 // ti) * 64))

        def raw_chunk_fn(bank_regs, r_tiles, c_tiles):
            s, zz = screen.screen_s_z(bank_regs, r_tiles, c_tiles, 14,
                                      values, ti=ti, tj=ti, r_sub=r_sub,
                                      precision=prec)
            tot = jnp.sum(s, dtype=jnp.float32)
            if zz is not None:
                tot += jnp.sum(zz, dtype=jnp.float32)
            return tot

        raw_chunk = jax.jit(raw_chunk_fn)

        def sweep():
            rows = rng.integers(0, nb, args.tiles).astype(np.int32)
            cols = rng.integers(0, nb, args.tiles).astype(np.int32)
            sums = []
            for c0 in range(0, args.tiles, chunk):
                r = rows[c0:c0 + chunk]
                c = cols[c0:c0 + chunk]
                if len(r) < chunk:
                    r = np.pad(r, (0, chunk - len(r)), constant_values=r[-1])
                    c = np.pad(c, (0, chunk - len(c)), constant_values=c[-1])
                sums.append(raw_chunk(d_regs, jnp.asarray(r), jnp.asarray(c)))
            return float(jnp.stack(sums).sum())

        try:
            sweep()  # compile
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sweep()
                best = min(best, time.perf_counter() - t0)
            n_sched = -(-args.tiles // chunk) * chunk
            pairs = n_sched * ti * ti
            rate = pairs / best
            ops = 2 * (len(values) - 1) * (1 << 14)
            print(json.dumps({
                "config": cfg, "n_values": len(values),
                "pairs_per_sec": round(rate, 1),
                "mxu_util_int8peak": round(rate * ops / 394e12, 3),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue sweep
            print(json.dumps({"config": cfg,
                              "error": f"{type(exc).__name__}: {exc}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
