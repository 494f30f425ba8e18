"""Headline benchmark: pairwise sketch comparisons/sec/chip.

Runs the flagship screened selection path - the fused Pallas MXU kernel
(harmonic-sum / zero-count indicator matmuls, int8 MXU) plus the fused
gate/estimator postprocess (CB mask + smh_a LSH banding + conservative
truncated-telescope Jaccard screen) - over the FULL i<j pair triangle of
a synthetic sketch bank, on whatever backend jax.devices() provides (the
driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus the
raw-kernel rate and achieved int8-MXU utilization as extra keys}.

NOTE on headline vs raw since round 5: the headline path is the FUSED
kernel (one Pallas pass, no Z pass, no S/Z materialization) while the
"raw" extra key deliberately keeps measuring the two-pass S(+Z) kernel -
a stable comparator across rounds - so headline >= raw is the expected
steady state now (r5: 1.09e9 vs 1.06e9).

vs_baseline: the reference publishes no absolute numbers (BASELINE.md), so
the baseline is the reference CUDA kernel's speed-of-light on its target
hardware (Makefile:26 -arch=sm_86, RTX 3080-class): kernel_CBsmh reads both
16 KiB register arrays per surviving pair (selection_kernels.cu:78-116), so
at 760 GB/s HBM the union stage tops out at 760e9 / 32768 = 2.32e7 pairs/s.
That DRAM-bound bound ignores the estimator math, so it flatters the
reference; beating it by >10x is the BASELINE.json north star.

Robustness (VERDICT rounds 1+4): the synthetic bank is cached to /tmp
across runs and compiled executables persist in a jax compilation cache.
The process splits into a supervising PARENT (deadline-aware tunnel
probe loop, then a watchdog over the measurement) and a WORKER subprocess
that writes its JSON to a result file headline-first - so a tunnel
outage or a mid-measurement hang costs a retry or the optional ring key,
never the capture: the parent always prints exactly one JSON line inside
the CSC_BENCH_BUDGET_SECS window (default 30 min; round 4's three fixed
probes gave up at ~11.5 min and zeroed the scoreboard).

experiments/scale_sweep.py reuses build_synthetic_bank/measure for the
throughput-vs-N table.
"""

import json
import os
import sys
import time

import numpy as np

CUDA_BASELINE_PAIRS_PER_SEC = 2.32e7  # see module docstring

P = 14
M_SMH = 32  # aux_bytes=256 default -> m=32 buckets
TAU = 0.9
# The engine's measured v5e optimum (parallel.screened.auto_tile /
# auto_chunk; r3e sweep found 1024/33 for the two-pass kernel; the r5
# fused-kernel sweep moved the chunk optimum to 64: 1.117e9 vs 1.081e9
# at 33, artifacts/r5/chain2/ktune.out).
TI = 1024
CHUNK = 64  # dispatch chunk; remainders use small bucketed dispatches
N_GENOMES = 16384
ITEMS_PER_GENOME = 2048

COMPILE_CACHE = "/tmp/csc_jax_compile_cache"
# Capture-window budget (seconds). The driver's real timeout is unknown;
# 30 min is the conservative estimate (round 4's honest-outage line at
# ~11.5 min was well inside it). The probe loop spends up to 80% of this
# waiting for a tunnel up-window, leaving the rest for the (cache-warm)
# measurement.
BUDGET_ENV = "CSC_BENCH_BUDGET_SECS"
START_ENV = "CSC_BENCH_START_EPOCH"

# v5e int8 MXU peak: 394 TOPS (2x the 197 TFLOP/s bf16 peak).
V5E_INT8_OPS_PER_SEC = 394e12


def _configure_jax():
    import jax

    # Accelerator-only persistent cache (CPU AOT caches are
    # machine-feature-specific - see package enable_compile_cache).
    if jax.default_backend() != "cpu":
        os.makedirs(COMPILE_CACHE, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", COMPILE_CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_synthetic_bank(n_genomes=N_GENOMES, items=ITEMS_PER_GENOME):
    """Synthetic bank with the EXACT register distribution of the real
    build pipeline, constructed host-side and cached to /tmp.

    The bench measures the screen SWEEP, so bank fidelity means register
    fidelity: each genome gets `items` uniform 64-bit hashes (WangHash of
    distinct k-mers is uniform) pushed through the reference index/rank
    rule (hll.h:886-899) - index = top p bits, rank =
    clz(((h<<1)|1) << (p-1)) + 1 - and a register max-reduce. This yields
    the same present-value set / harmonic-sum statistics as the device
    build (the round-1 bench built the same bank through the device
    pipeline; that cost ~3 min of tunnel dispatches per cold run and blew
    the driver's capture timeout - VERDICT round 1, weak #1). Cardinalities
    are the true batched f64 MLE. SMH buckets are uniform u64 (band
    fingerprints of unrelated genomes collide ~never either way).
    """
    cache = f"/tmp/csc_bench_bank_v3_{n_genomes}x{items}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["regs"], z["aux"], z["e"]

    from cuda_selection_criteria_tpu.utils.hostref import ertl_mle_batch

    rng = np.random.default_rng(0xBE7C)
    regs = np.zeros((n_genomes, 1 << P), np.uint8)
    gchunk = min(1024, n_genomes)
    for g0 in range(0, n_genomes, gchunk):
        h = rng.integers(0, 1 << 64, size=(gchunk, items), dtype=np.uint64)
        idx = (h >> np.uint64(64 - P)).astype(np.int64)
        v = ((h << np.uint64(1)) | np.uint64(1)) << np.uint64(P - 1)
        # integer bit-length via shift halving: 6 vector ops, no float
        # rounding concerns (validated bit-exact vs the scalar clz rule)
        bl = np.zeros(v.shape, np.uint8)
        for sh in (32, 16, 8, 4, 2, 1):
            big = v >> np.uint64(sh)
            take = big != 0
            bl[take] += np.uint8(sh)
            v = np.where(take, big, v)
        rank = np.uint8(64) - bl  # lz + 1 = 64 - (bl_high_index) since v>0
        flat = np.arange(gchunk)[:, None] * (1 << P) + idx
        sub = np.zeros(gchunk * (1 << P), np.uint8)
        np.maximum.at(sub, flat.ravel(), rank.ravel())
        regs[g0:g0 + gchunk] = sub.reshape(gchunk, 1 << P)

    aux = rng.integers(0, 1 << 63, size=(n_genomes, M_SMH), dtype=np.uint64)

    # Per-row histograms in bounded chunks (the whole-bank int64 offset
    # array would be a multi-GB temporary).
    hists = np.zeros((n_genomes, 64), np.int64)
    hchunk = 2048
    for g0 in range(0, n_genomes, hchunk):
        sub = regs[g0:g0 + hchunk].astype(np.int32)
        sub += (np.arange(sub.shape[0], dtype=np.int32) * 64)[:, None]
        hists[g0:g0 + hchunk] = np.bincount(
            sub.ravel(), minlength=sub.shape[0] * 64
        ).reshape(sub.shape[0], 64)
    e = np.trunc(ertl_mle_batch(hists, P))

    # np.savez appends .npz when missing - keep the suffix so the atomic
    # rename source actually exists.
    tmp = cache.replace(".npz", f".tmp{os.getpid()}.npz")
    np.savez(tmp, regs=regs, aux=aux, e=e)
    os.replace(tmp, cache)
    return regs, aux, e


def _spans(n_tiles, chunk):
    """Full chunks + one small bucketed remainder (minimal padding)."""
    out = [(c0, chunk) for c0 in range(0, n_tiles - chunk + 1, chunk)]
    rem = n_tiles - len(out) * chunk
    if rem:
        out.append((n_tiles - rem,
                    min(chunk, max(8, 1 << (rem - 1).bit_length()))))
    return out


def measure(n_genomes=N_GENOMES, reps=3, items=ITEMS_PER_GENOME):
    """(headline_pairs_per_sec, raw_pairs_per_sec, mxu_util) at one N."""
    import jax
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import criteria, screen
    from cuda_selection_criteria_tpu.parallel import screened

    # The Pallas screen must COMPILE on accelerator backends; interpret
    # mode (~1e4x slower) would otherwise blow the capture timeout
    # silently. ops/screen.py interprets only on the cpu backend.
    if screen._interpret_default():
        raise SystemExit(
            f"bench.py requires a compiled Pallas backend; "
            f"jax.default_backend()={jax.default_backend()!r} would "
            f"interpret. Run on the TPU."
        )

    regs, aux, e = build_synthetic_bank(n_genomes, items)
    order = np.argsort(e, kind="stable")
    regs, aux, e = regs[order], aux[order], e[order]

    n_rows_b, n_bands = criteria.smh_band_params(M_SMH, TAU)
    tau = criteria.effective_tau(TAU)
    tau_scr = np.float32(screened.screen_tau(tau))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    # Truncated telescope (one-sided overestimate; see
    # ops/screen.truncate_values): same conservative screen, ~3x fewer
    # MXU passes on this bank.
    values = screen.truncate_values(
        screen.bank_values(regs), float(e.max()), P)

    # Device-resident bank (production holds the bank on-chip across
    # queries; the upload is not part of the per-query cost).
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))

    nb = n_genomes // TI
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
    rows = np.array([t[0] for t in tiles], np.int32)
    cols = np.array([t[1] for t in tiles], np.int32)
    spans = _spans(len(tiles), min(CHUNK, len(tiles)))

    def _chunk_args(c0, width):
        take = min(width, len(rows) - c0)
        r = np.pad(rows[c0:c0 + take], (0, width - take),
                   constant_values=rows[-1])
        c = np.pad(cols[c0:c0 + take], (0, width - take),
                   constant_values=cols[-1])
        return jnp.asarray(r), jnp.asarray(c)

    # The schedule is fixed across sweeps: device-resident chunk args,
    # built once (rebuilding them enqueued ~10 small puts per sweep -
    # pure host/RPC overhead inside the timed loop).
    chunk_arg_cache = {span: _chunk_args(*span) for span in spans}

    def chunk_args(c0, width):
        return chunk_arg_cache[(c0, width)]

    def sweep_dispatch(tau_jitter):
        """Dispatch one full all-pairs screened pass (async handles).

        Matches the engine's fetch discipline (parallel/screened.py): all
        chunks dispatched back-to-back; counts/masks fetched by
        sweep_collect."""
        tau_s = jnp.float32(tau_scr + tau_jitter)
        pending = []
        for c0, width in spans:
            r_chunk, c_chunk = chunk_args(c0, width)
            hits, cnt = screened._screen_chunk(
                d_regs, r_chunk, c_chunk, d_e, d_fp, jnp.int32(n_genomes),
                tau_s, tau_cb, P, values, TI, n_bands, True, True,
            )
            pending.append((hits, cnt))
        return pending

    def sweep_collect(pending):
        """Fetch ONE per-tile count array, pull hit masks only for tiles
        that contain candidates (the engine's extraction cost)."""
        counts = np.asarray(jnp.concatenate([c for _, c in pending]))
        total = int(counts.sum())
        pos = 0
        for h, cnt in pending:
            width = cnt.shape[0]
            for t in np.nonzero(counts[pos:pos + width])[0]:
                np.nonzero(np.asarray(h[t]))  # candidate-extraction cost
            pos += width
        return total

    pairs = n_genomes * (n_genomes - 1) // 2

    sweep_collect(sweep_dispatch(0.0))  # warmup / compile
    # Sustained-load protocol: back-to-back queries keep the device queue
    # full (dispatch rep k+1 before collecting rep k - production serves
    # queries the same way), so the rate is throughput, not one sweep's
    # share of the ~26 ms tunnel round trips. Each rep's tau jitter keeps
    # its computation distinct (no transparent relay caching).
    t0 = time.perf_counter()
    inflight = sweep_dispatch(1e-7)
    for k in range(1, reps):
        nxt = sweep_dispatch((k + 1) * 1e-7)
        sweep_collect(inflight)
        inflight = nxt
    sweep_collect(inflight)
    dt = (time.perf_counter() - t0) / reps
    pairs_per_sec = pairs / dt

    # --- raw kernel sweep: the device screen kernel ONLY (bank resident,
    # schedule precomputed, no gate postprocess, no mask fetch) - the
    # reference's kernel-timing protocol (time_smh_cuda.cpp:276-307, with
    # the sync the reference forgot). Fresh tile permutations per rep
    # defeat relay-level result caching.
    def _raw_chunks(bank_regs, r_tiles, c_tiles):
        s, z = screen.screen_s_z(bank_regs, r_tiles, c_tiles, P, values,
                                 ti=TI, tj=TI)
        tot = jnp.sum(s, dtype=jnp.float32)
        if z is not None:
            tot += jnp.sum(z, dtype=jnp.float32)
        return tot

    import jax as _jax

    raw_chunk = _jax.jit(_raw_chunks)
    rng = np.random.default_rng(7)

    def raw_dispatch():
        perm = rng.permutation(len(rows))
        rp, cp = rows[perm], cols[perm]
        sums = []
        for c0, width in spans:
            take = min(width, len(rp) - c0)
            r = np.pad(rp[c0:c0 + take], (0, width - take),
                       constant_values=rp[-1])
            c = np.pad(cp[c0:c0 + take], (0, width - take),
                       constant_values=cp[-1])
            sums.append(raw_chunk(d_regs, jnp.asarray(r), jnp.asarray(c)))
        return sums

    float(jnp.stack(raw_dispatch()).sum())  # warmup / compile
    # Sustained-load raw protocol: all reps' kernel sweeps dispatched
    # back-to-back (fresh tile permutation each), then one blocking
    # checksum fetch per sweep - the stack arity matches the warmup's,
    # so nothing compiles inside the timed region (a 15-ary stack did,
    # and torpedoed the first r4e capture to 4.6e8).
    t0 = time.perf_counter()
    handles = [raw_dispatch() for _ in range(reps)]
    for h in handles:
        float(jnp.stack(h).sum())
    raw_dt = (time.perf_counter() - t0) / reps
    # The schedule covers diagonal tiles too: count scheduled tile-pairs,
    # not triangle pairs, for the raw kernel rate.
    sched_pairs = sum(w for _, w in spans) * TI * TI
    raw_pairs_per_sec = sched_pairs / raw_dt
    # int8-MXU ops per scheduled pair: one (TI x R) @ (R x TI) indicator
    # matmul per telescope bin (len(values) - 1 bins; the top value is the
    # closed-form tail, and Z rides the v=0 matmul in the same pass).
    ops_per_pair = 2 * (len(values) - 1) * (1 << P)
    mxu_util = raw_pairs_per_sec * ops_per_pair / V5E_INT8_OPS_PER_SEC
    return pairs_per_sec, raw_pairs_per_sec, mxu_util


def measure_ring(n_genomes=None):
    """End-to-end ring-engine rate on a synthetic bank AT SCALE, so the
    bank-sharded engine's number is a driver-visible artifact (VERDICT
    r4 next #4). Wall covers upload + gate + screen + confirm; the
    one-time XLA/Mosaic compile walls report separately in the engine's
    stats and are excluded (CLAUDE.md warm-executable discipline), like
    the chain captures in BASELINE.md.

    The ring engine exists for banks past replication scale, and its
    fixed per-sweep costs amortize with N (measured 11.4x at 131k,
    31.2x at 262k, 46.2x at 524k - BASELINE.md); measuring it at the
    headline's 16k was a ~0.5x embarrassment that misrepresented the
    engine. N picks the largest measured-tier size the remaining
    capture budget affords (bank .npz caches in /tmp make the 2-4 GiB
    banks cheap to load; the compile walls amortize via the persistent
    cache across driver rounds)."""
    from cuda_selection_criteria_tpu.models.bank import SketchBank
    from cuda_selection_criteria_tpu.parallel.ring import select_pairs_ring
    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams

    if n_genomes is None:
        left = 0.95 * _budget_secs() - _elapsed()
        # measured totals incl. cold compile: 262k ~ 300 s, 131k ~ 150 s;
        # the 524k flagship tier (warm: 96 s run + ~90 s bank load,
        # artifacts/r5/chain3/ring524k.out = 61.6x) only when its 8 GiB
        # bank cache already exists (a cold host-side build is ~10 min)
        n_genomes = (
            524288 if left > 900.0 and os.path.exists(
                "/tmp/csc_bench_bank_v3_524288x2048.npz") else
            262144 if left > 420.0 else
            131072 if left > 240.0 else 32768)
    regs, aux, e = build_synthetic_bank(n_genomes)
    bank = SketchBank(
        names=[f"g{i:05d}" for i in range(n_genomes)],
        regs=regs, cards=e.astype(np.float64),
        aux_kind="smh", aux=aux, aux_param=M_SMH,
    )
    params = SelectionParams(tau=TAU, criterion="smh_a",
                             aux_bytes=M_SMH * 8)
    stats = {}
    t0 = time.perf_counter()
    select_pairs_ring(bank, params, stats=stats)
    wall = time.perf_counter() - t0
    steady = wall - stats.get("gate_compile_secs", 0.0) \
        - stats.get("screen_compile_secs", 0.0)
    pairs = n_genomes * (n_genomes - 1) // 2
    return pairs / max(steady, 1e-9)


def _backend_answers(timeout=90.0):
    """True when a subprocess can init the backend and run one op.

    Backend init through the axon tunnel HANGS (not errors) when the
    relay is unhealthy - observed 2026-08-17, a multi-hour outage - and
    a hang in-process would silently eat the driver's whole capture
    window. A subprocess probe turns the hang into a bounded timeout."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jnp.ones((8, 8)); float((x @ x).sum())"],
            timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _budget_secs():
    return float(os.environ.get(BUDGET_ENV, "1800"))


def _start_epoch():
    """Process-family start time: survives the one os.execv retry so the
    budget clock never resets mid-capture."""
    v = os.environ.get(START_ENV)
    if v is None:
        v = repr(time.time())
        os.environ[START_ENV] = v
    return float(v)


def _elapsed():
    return time.time() - _start_epoch()


def _tunnel_waits():
    """Deadline-aware probe loop (VERDICT r4 next #1): the tunnel FLAPS
    with ~20-60 min up-windows between outages, and round 4's three
    fixed probes gave up after ~11.5 min - missing an up-window that
    started mid-capture and zeroing the round's scoreboard. Now: probe
    (90 s subprocess timeout each) every ~75 s until 80% of the capture
    budget is spent, so a late up-window still gets measured; only then
    emit the honest-outage line."""
    probe_deadline = 0.80 * _budget_secs()
    while True:
        if _backend_answers():
            return True
        remaining = probe_deadline - _elapsed()
        if remaining <= 0:
            return False
        time.sleep(min(75.0, max(5.0, remaining)))


def _worker(result_path):
    """Measurement child: writes the headline JSON to result_path as soon
    as it exists (the parent can emit it even if everything after hangs),
    then upgrades the file with the ring key."""
    _configure_jax()
    pairs_per_sec, raw_pairs_per_sec, mxu_util = measure()
    out = {
        "metric": "pair_comparisons_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(
            pairs_per_sec / CUDA_BASELINE_PAIRS_PER_SEC, 3
        ),
        "raw_kernel_pairs_per_sec": round(raw_pairs_per_sec, 1),
        "raw_vs_baseline": round(
            raw_pairs_per_sec / CUDA_BASELINE_PAIRS_PER_SEC, 3
        ),
        "mxu_util": round(mxu_util, 3),
    }
    _write_result(result_path, out)
    # Ring-engine end-to-end rate (VERDICT r4 next #4): measured only
    # when the headline is already on disk AND enough budget remains -
    # the scoreboard value must never be risked on the extra key.
    if _elapsed() < 0.62 * _budget_secs():
        try:
            ring_rate = measure_ring()
            out["ring_pairs_per_sec"] = round(ring_rate, 1)
            out["ring_vs_baseline"] = round(
                ring_rate / CUDA_BASELINE_PAIRS_PER_SEC, 3)
        except Exception as exc:  # noqa: BLE001 - extra key, never fatal
            out["ring_error"] = f"{type(exc).__name__}: {exc}"[:200]
        _write_result(result_path, out)


def _write_result(path, obj):
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(json.dumps(obj))
    os.replace(tmp, path)


def _read_result(path):
    try:
        with open(path) as f:
            return json.loads(f.read())
    except (OSError, ValueError):
        return None


def main():
    # Probe-first (serialized: the probe exits before any backend init in
    # this process family); on persistent failure emit one honest JSON
    # line so the driver's capture records the outage instead of timing
    # out. After the probe succeeds, the measurement runs in a supervised
    # WORKER subprocess: a tunnel drop mid-measurement then costs the
    # ring extra or one retry, never the whole capture - the parent
    # always prints exactly one JSON line before the budget runs out.
    _start_epoch()
    if not _tunnel_waits():
        print(json.dumps({
            "metric": "pair_comparisons_per_sec_per_chip",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": "tpu backend unreachable (deadline-aware probes "
                     f"for {0.8 * _budget_secs():.0f}s all hung); "
                     "no measurement taken",
        }))
        raise SystemExit(3)

    import subprocess

    result_path = f"/tmp/csc_bench_result_{os.getpid()}.json"
    budget = _budget_secs()
    last_err = "worker produced no result"
    for attempt in (1, 2):
        # Leave 30 s of parent slack; a retry needs a real window left.
        remaining = budget - _elapsed() - 30.0
        if remaining < 120.0 and attempt > 1:
            break
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             result_path],
            stdout=sys.stderr, stderr=sys.stderr,
        )
        try:
            rc = proc.wait(timeout=max(60.0, remaining))
        except subprocess.TimeoutExpired:
            proc.kill()  # exact PID we started, never a pattern
            proc.wait()
            rc = "timeout"
        out = _read_result(result_path)
        if out is not None:
            if rc == "timeout" and "ring_pairs_per_sec" not in out:
                out.setdefault(
                    "ring_error", "worker killed at budget deadline")
            print(json.dumps(out))
            return
        last_err = f"worker attempt {attempt} rc={rc}, no result file"
        print(f"bench.py: {last_err}; retrying", file=sys.stderr)
        time.sleep(15.0)
    print(json.dumps({
        "metric": "pair_comparisons_per_sec_per_chip",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
        "error": f"measurement failed within budget: {last_err}",
    }))
    raise SystemExit(3)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker(sys.argv[sys.argv.index("--worker") + 1])
    else:
        main()
