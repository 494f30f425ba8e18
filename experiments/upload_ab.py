"""Packed-vs-dense bank upload A/B through the live tunnel.

Interleaves the two upload paths (screened.upload_sorted_rows with and
without the ops/regpack bit-plane packing) over the SAME synthetic bank,
several rounds, so the erratic wire (10-90 MiB/s between rounds -
artifacts/r4/forensics.out) can't masquerade as a protocol difference.
Also verifies the two uploads produce byte-identical device banks once
per run (one fetch). One JSON line per measurement.

Usage: python experiments/upload_ab.py [--gib 1.0] [--rounds 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=1.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import bench
    from cuda_selection_criteria_tpu.ops import regpack, screen
    from cuda_selection_criteria_tpu.parallel.screened import (
        upload_sorted_rows)

    if jax.default_backend() == "cpu":
        raise SystemExit("upload A/B must run on the TPU backend")

    n = int(args.gib * (1 << 30)) // (1 << 14)
    n -= n % 1024
    # realistic register distribution (the relay compresses; content
    # matters): tile the cached bench bank's rows if available, else a
    # fresh small build
    base, _, _ = bench.build_synthetic_bank(4096)
    reps = -(-n // base.shape[0])
    regs = np.tile(base, (reps, 1))[:n]
    rng = np.random.default_rng(0xAB)
    vals = screen.bank_values(regs)
    plan = regpack.plan_pack(vals)
    print(json.dumps({"what": "setup", "n_rows": n,
                      "gib": round(regs.nbytes / 2**30, 2),
                      "alphabet": len(vals),
                      "pack_bits": 0 if plan is None else plan[2]}),
          flush=True)

    checked = False
    for rnd in range(args.rounds):
        for name, pk in (("dense", None), ("packed", plan)):
            order = rng.permutation(n)  # fresh bytes/order every rep
            ph = {}
            t0 = time.perf_counter()
            buf = upload_sorted_rows(regs, order, 0, n, stats=ph, pack=pk)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "what": name, "round": rnd, "secs": round(dt, 2),
                "mib_per_s_dense_equiv": round(regs.nbytes / 2**20 / dt, 1),
                **{k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in ph.items()},
            }), flush=True)
            if not checked and name == "packed":
                import jax.numpy as jnp

                want = upload_sorted_rows(regs, order, 0, n)
                same = bool(jnp.array_equal(want, buf))
                print(json.dumps({"what": "equality", "ok": same}),
                      flush=True)
                assert same, "packed upload != dense upload"
                checked = True
                del want
            del buf

    print(json.dumps({"what": "done"}), flush=True)


if __name__ == "__main__":
    main()
