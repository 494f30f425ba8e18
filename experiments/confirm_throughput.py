"""Confirm-stage throughput measurement (VERDICT round 1, weak #5).

The exact-confirmation stage dominates at low-selectivity operating points
(the reference's differential protocol runs at tau=0.01 -
run_comparison_experiment.sh:62-70 - and the `baseline` criterion confirms
every pair). This measures, on a synthetic p=14 bank:

  host      - numpy path: vectorized gates + max-merge/bincount histograms
              + batched f64 MLE (utils/hostref).
  device    - ScreenPlan.device_hist_fn: union histograms computed on the
              accelerator from the resident bank (exact integer counts),
              f64 MLE on the host.

--reject adds the production-shaped protocol (VERDICT r3 #5): a realistic
bank (bench.build_synthetic_bank register distribution) with planted
near-duplicates, a ~90%-reject pair workload at tau=0.9, and the device
reject bound ON vs OFF - the ON path fetches one flag byte per pair and
full histograms only for maybe-pass pairs; outputs must stay identical.

Prints one JSON line with pairs/s for each mode.
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--pairs", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=8192,
                    help="device histogram chunk (pairs per dispatch)")
    ap.add_argument("--batch", type=int, default=16384,
                    help="oracle adjudication batch (pairs per fetch+MLE)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU XLA backend (no tunnel)")
    ap.add_argument("--host-only", action="store_true",
                    help="skip the device-assisted mode (the XLA-CPU "
                    "one-hot histogram is orders slower than the native "
                    "host path; only measure it on a real accelerator)")
    ap.add_argument("--reject", action="store_true",
                    help="measure the ~90%%-reject workload with the "
                    "device reject bound on vs off (realistic bank, "
                    "tau=0.9)")
    args = ap.parse_args(argv)

    if args.reject:
        return reject_mode(args)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cuda_selection_criteria_tpu.models.bank import SketchBank
    from cuda_selection_criteria_tpu.parallel.screened import ScreenPlan
    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
    from cuda_selection_criteria_tpu.utils.hostref import PairOracle

    rng = np.random.default_rng(2)
    n, p = args.n, 14
    regs = rng.integers(0, 28, size=(n, 1 << p), dtype=np.uint8)
    cards = np.sort(rng.uniform(1e5, 2e5, n))
    bank = SketchBank(names=[f"g{i}" for i in range(n)], regs=regs, p=p,
                      cards=np.trunc(cards))

    ii = rng.integers(0, n - 1, args.pairs)
    kk = ii + 1 + rng.integers(0, n - ii - 1)
    pairs = list(zip(ii.tolist(), kk.tolist()))

    # tau=-100 so every pair takes the full union-MLE path (worst case).
    oracle_host = PairOracle(p, bank.regs, bank.cards, criterion="baseline",
                             tau=-100.0, apply_cb=False)

    def timed(fn, label):
        print(f"# warmup {label}", file=sys.stderr, flush=True)
        fn()  # warmup (page faults / compile)
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            print(f"# {label} rep{r}: {len(out) / dt:.3e}/s",
                  file=sys.stderr, flush=True)
            best = min(best, dt)
        return len(out) / best, out

    # The host path re-reads 32 KiB/pair from host DRAM; time it on a
    # quarter of the pair list so slow hosts finish in bounded time.
    host_pairs = pairs[: max(1, len(pairs) // 4)]
    host_rate, _ = timed(
        lambda: oracle_host.confirm_pairs(host_pairs), "host")
    host_out = oracle_host.confirm_pairs(pairs)

    if args.host_only:
        import jax

        from cuda_selection_criteria_tpu.native import fastx

        print(json.dumps({
            "n_pairs": len(host_pairs),
            "backend": jax.default_backend(),
            "native_hist": fastx.available(),
            "host_confirm_pairs_per_sec": round(host_rate, 1),
        }))
        return

    plan = ScreenPlan(bank, SelectionParams(tau=0.9, criterion="baseline"),
                      ti=512)
    # tau=-100.0 here too: the reject bound must be driven by the
    # ORACLE's threshold, not the plan's (PairOracle asserts this now)
    oracle_dev = PairOracle(p, plan.regs_s, plan.e_s, criterion="baseline",
                            tau=-100.0, apply_cb=False,
                            hist_fn=plan.device_hist_fn(chunk=args.chunk,
                                                        tau=-100.0))
    # plan sorts by cardinality; cards here are already sorted+truncated,
    # so sorted positions == original positions and outputs are comparable.
    dev_rate, dev_out = timed(
        lambda: oracle_dev.confirm_pairs(pairs, batch=args.batch), "device")
    assert [(i, k, j) for i, k, j in host_out] == \
        [(i, k, j) for i, k, j in dev_out], "device/host confirm mismatch"

    import jax

    print(json.dumps({
        "n_pairs": len(pairs),
        "backend": jax.default_backend(),
        "host_confirm_pairs_per_sec": round(host_rate, 1),
        "device_assisted_confirm_pairs_per_sec": round(dev_rate, 1),
    }))


def reject_mode(args):
    """~90%-reject confirm workload, reject bound on vs off, exact-equal.

    Near-duplicate pairs come from planted duplicate rows (the at-scale
    cascades' construction); the other 90% of pair slots are random row
    pairs of the realistic bank - far below tau=0.9, so the device bound
    must certainly-reject almost all of them and the flag-first protocol
    fetches ~1 byte instead of ~104 for those pairs."""
    import time as _time

    import bench
    from cuda_selection_criteria_tpu.models.bank import SketchBank
    from cuda_selection_criteria_tpu.parallel.screened import ScreenPlan
    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
    from cuda_selection_criteria_tpu.utils.hostref import (
        PairOracle, ertl_mle_batch)

    tau = 0.9
    rng = np.random.default_rng(9)
    regs, aux, e = bench.build_synthetic_bank(args.n)
    picks = rng.choice(args.n - 1, size=min(1024, args.n // 4),
                       replace=False)
    for i in picks:
        regs[i + 1] = regs[i]
        regs[i + 1, rng.integers(0, regs.shape[1], 4)] += 1
    rows = np.unique(np.concatenate([picks, picks + 1]))
    sub = regs[rows].astype(np.int32)
    sub += (np.arange(len(rows), dtype=np.int32) * 64)[:, None]
    hists = np.bincount(sub.ravel(), minlength=len(rows) * 64
                        ).reshape(len(rows), 64)
    e = e.copy()
    e[rows] = np.trunc(ertl_mle_batch(hists, bench.P))

    n_dup = args.pairs // 10
    dup_slots = rng.integers(0, len(picks), n_dup)
    rand_i = rng.integers(0, args.n - 1, args.pairs - n_dup)
    rand_k = rand_i + 1 + rng.integers(0, args.n - rand_i - 1)
    ii = np.concatenate([picks[dup_slots], rand_i]).astype(np.int64)
    kk = np.concatenate([picks[dup_slots] + 1, rand_k]).astype(np.int64)

    bank = SketchBank(names=[f"g{i}" for i in range(args.n)], regs=regs,
                      p=bench.P, cards=e)
    params = SelectionParams(tau=tau, criterion="baseline")
    plan = ScreenPlan(bank, params, 512)
    # map original row ids to sorted positions (the plan sorts by e)
    pos = np.empty(args.n, np.int64)
    pos[plan.order] = np.arange(args.n)
    sp = np.stack([pos[ii], pos[kk]])
    lo = sp.min(0)
    hi = sp.max(0)
    pairs = list(zip(lo.tolist(), hi.tolist()))

    def oracle(hist_fn):
        return PairOracle(bank.p, (lambda: plan.regs_s), plan.e_s,
                          criterion="baseline", tau=tau, apply_cb=False,
                          hist_fn=hist_fn)

    def timed(fn, label):
        print(f"# warmup {label}", file=sys.stderr, flush=True)
        fn()
        best = float("inf")
        for r in range(args.reps):
            t0 = _time.perf_counter()
            out = fn()
            dt = _time.perf_counter() - t0
            print(f"# {label} rep{r}: {len(pairs) / dt:.3e}/s",
                  file=sys.stderr, flush=True)
            best = min(best, dt)
        return len(pairs) / best, out

    off_fn = plan.device_hist_fn(chunk=args.chunk, tau=-100.0)
    on_fn = plan.device_hist_fn(chunk=args.chunk, tau=tau)
    rate_off, out_off = timed(
        lambda: oracle(off_fn).confirm_pairs(pairs, batch=args.batch),
        "reject-off")
    rate_on, out_on = timed(
        lambda: oracle(on_fn).confirm_pairs(pairs, batch=args.batch),
        "reject-on")
    assert out_off == out_on, "reject bound changed confirm output"

    pend, nb = on_fn.dispatch([a for a, _ in pairs], [b for _, b in pairs])
    import jax
    import jax.numpy as jnp

    rej = np.asarray(jnp.concatenate([r for _, r in pend]))[:nb]
    print(json.dumps({
        "protocol": "reject_workload",
        "n_pairs": len(pairs),
        "tau": tau,
        "backend": jax.default_backend(),
        "reject_fraction": round(float(rej.mean()), 4),
        "pairs_emitted": len(out_on),
        "device_reject_off_pairs_per_sec": round(rate_off, 1),
        "device_reject_on_pairs_per_sec": round(rate_on, 1),
    }))


if __name__ == "__main__":
    main()
