#!/bin/bash
# Round-4 serialized TPU chain. One TPU process at a time, every step
# rc-gated (ADVICE r3: the probe asserts the BACKEND, not just a matmul;
# dependent steps skip when their prerequisite failed).
#
#   0. probe: backend must not be cpu (a silent CPU fallback would record
#      host timings as chip numbers).
#   1. bench.py - new ti=1024/chunk=33 default; also rebuilds the /tmp
#      bank + compile caches the driver's BENCH_r04 capture needs.
#   2. goldens at the new auto default (smh_a/cb/hll_a/hll_an + -b 128)
#      + planted-cluster exact run.
#   3. 131k cascade run A (single-fetch prune + instrumented slab upload
#      + same-session wire reference).
#   4. 131k cascade run B - the reproducibility rep (the r3 prune wall
#      swung 5.8 s -> 473 s between chains).
#   5. 524k cascade - end-to-end target.
#   6. ring engine at 131k on chip (first at-scale ring run).
#   7. confirm-throughput: worst-case protocol + the 90%-reject bound.
#   8. Mosaic HTTP-500 repro matrix (deferred / r_sub / int8c16).
#   9. comparative CSV, host + tpu arms, influenza list.
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain1
mkdir -p "$R"

echo "=== 0. backend probe ==="
timeout 300 python -u -c "
import jax
assert jax.default_backend() != 'cpu', f'cpu fallback: {jax.default_backend()}'
import jax.numpy as jnp
x = jnp.ones((128,128))
print('probe ok', jax.default_backend(), float((x@x).sum()), flush=True)
" > "$R/probe.out" 2> "$R/probe.err"
rc=$?
echo "probe rc=$rc"
if [ $rc -ne 0 ]; then echo "TUNNEL DOWN / CPU FALLBACK - aborting r4a"; exit 1; fi

echo "=== 1. bench (ti=1024 default; rebuilds caches) ==="
timeout 2400 python bench.py > "$R/bench.out" 2> "$R/bench.err"
bench_rc=$?
echo "bench rc=$bench_rc"; cat "$R/bench.out"

echo "=== 2. goldens at the new default ==="
sed "s|^|/root/reference/|" /root/reference/test_influeza_filelist.txt > /tmp/influenza_abs.txt
for spec in "smh_a:-a 32 -c smh_a" "cb:-a 32 -c cb" "hll_a:-a 256 -c hll_a" "hll_an:-a 256 -c hll_an" "smh_a_b128:-a 32 -c smh_a -b 128"; do
  name="${spec%%:*}"; flags="${spec#*:}"
  timeout 900 python -u -c "
from cuda_selection_criteria_tpu.cli import selection
selection.main(['-l','/tmp/influenza_abs.txt','-h','0.9'] + '$flags'.split())
" > "$R/golden_$name.out" 2> "$R/golden_$name.err"
  rc=$?
  if [ $rc -ne 0 ]; then echo "golden_$name rc=$rc FAILED"; continue; fi
  sed "s|/root/reference/||g" "$R/golden_$name.out" | diff - /root/reference/results.txt > /dev/null \
    && echo "golden_$name EXACT" || echo "golden_$name DIFFERS (expected for cb: superset criterion)"
done
# -n 4096 puts the auto-rule at ti=1024: the planted-cluster certification
# runs at the tile the engine now defaults to
timeout 1800 python -u experiments/validate_screened_tpu.py -n 4096 > "$R/planted.out" 2> "$R/planted.err"
echo "planted rc=$?"; tail -2 "$R/planted.out"

if [ $bench_rc -ne 0 ]; then
  echo "bench failed - skipping cache-dependent at-scale steps 3-6"
else
  echo "=== 3. 131k cascade run A ==="
  timeout 3600 python -u experiments/validate_131k_scale.py > "$R/scale131kA.out" 2> "$R/scale131kA.err"
  echo "131kA rc=$?"; tail -1 "$R/scale131kA.out"

  echo "=== 4. 131k cascade run B (reproducibility) ==="
  timeout 3600 python -u experiments/validate_131k_scale.py > "$R/scale131kB.out" 2> "$R/scale131kB.err"
  echo "131kB rc=$?"; tail -1 "$R/scale131kB.out"

  echo "=== 5. 524k cascade ==="
  timeout 7200 python -u experiments/validate_131k_scale.py --n 524288 > "$R/scale524k.out" 2> "$R/scale524k.err"
  echo "524k rc=$?"; tail -1 "$R/scale524k.out"

  echo "=== 6. ring engine at 131k ==="
  timeout 5400 python -u experiments/validate_ring_scale.py > "$R/ring131k.out" 2> "$R/ring131k.err"
  echo "ring131k rc=$?"; tail -1 "$R/ring131k.out"
fi

# re-probe between major phases: a mid-chain tunnel outage should stop
# the chain (and let the watcher relaunch it) instead of serially timing
# out every remaining step (observed 2026-08-19: tunnel died minutes
# after a clean step-0 probe)
timeout 240 python -u -c "
import jax; assert jax.default_backend() != 'cpu'
import jax.numpy as jnp; float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())
" > /dev/null 2>&1 || { echo "TUNNEL DOWN mid-chain - stopping before step 7"; exit 2; }

echo "=== 7. confirm throughput: worst-case + 90%-reject ==="
timeout 2400 python -u experiments/confirm_throughput.py --chunk 32768 --batch 32768 \
  > "$R/confirm.out" 2> "$R/confirm.err"
echo "confirm rc=$?"; tail -1 "$R/confirm.out"
timeout 2400 python -u experiments/confirm_throughput.py --reject --chunk 32768 --batch 32768 \
  > "$R/confirm_reject.out" 2> "$R/confirm_reject.err"
echo "confirm_reject rc=$?"; tail -1 "$R/confirm_reject.out"

echo "=== 8. Mosaic HTTP-500 repro matrix ==="
timeout 2400 python -u experiments/mosaic_500_repro.py > "$R/mosaic.out" 2> "$R/mosaic.err"
echo "mosaic rc=$?"; cat "$R/mosaic.out"

timeout 240 python -u -c "
import jax; assert jax.default_backend() != 'cpu'
import jax.numpy as jnp; float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())
" > /dev/null 2>&1 || { echo "TUNNEL DOWN mid-chain - stopping before step 9"; exit 2; }

echo "=== 9. comparative CSV (host + tpu arms) ==="
timeout 2400 python -u experiments/run_time_experiment.py -l /tmp/influenza_abs.txt \
  -o "$R/experimento_smh_comparativo.csv" > "$R/csv.out" 2> "$R/csv.err"
echo "csv rc=$?"; cat "$R/experimento_smh_comparativo.csv" 2>/dev/null | head -12

echo "=== R4A DONE ==="
