#!/bin/bash
# Round-4 second serialized TPU chain: measurements that depend on the
# round's new machinery and on r4a's caches. Run strictly AFTER r4a
# (launch via tunnel_watch_r4b.sh or manually once r4a is done).
#   1. packed-vs-dense upload A/B (regpack through the live wire).
#   2. ktune chunk variance at ti=1024 (33 vs 66 vs 16), 2 bench-style
#      reps for session variance.
#   3. bench rerun (best-of-reps reporting, warm caches).
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain2
mkdir -p "$R"

echo "=== 0. backend probe ==="
timeout 300 python -u -c "
import jax
assert jax.default_backend() != 'cpu', f'cpu fallback: {jax.default_backend()}'
import jax.numpy as jnp
print('probe ok', float((jnp.ones((64,64)) @ jnp.ones((64,64))).sum()), flush=True)
" > "$R/probe.out" 2> "$R/probe.err"
rc=$?
if [ $rc -ne 0 ]; then echo "TUNNEL DOWN - aborting r4b"; exit 1; fi

echo "=== 1. packed-vs-dense upload A/B ==="
timeout 3600 python -u experiments/upload_ab.py --gib 1.0 --rounds 3 \
  > "$R/upload_ab.out" 2> "$R/upload_ab.err"
echo "upload_ab rc=$?"; tail -3 "$R/upload_ab.out"

echo "=== 2. ktune chunk variance at ti=1024 ==="
timeout 3000 python -u experiments/kernel_tuning.py --tiles 264 \
  --configs "1024:auto:int8:chunk33,1024:auto:int8:chunk66,1024:auto:int8:chunk16,512:auto:int8:chunk132" \
  > "$R/ktune.out" 2> "$R/ktune.err"
echo "ktune rc=$?"; cat "$R/ktune.out"

echo "=== 3. bench rerun (best-of-reps) ==="
timeout 1800 python bench.py > "$R/bench.out" 2> "$R/bench.err"
echo "bench rc=$?"; cat "$R/bench.out"

echo "=== 4. confirm worst-case (fixed tau coupling) ==="
timeout 2400 python -u experiments/confirm_throughput.py --chunk 32768 --batch 32768 \
  > "$R/confirm.out" 2> "$R/confirm.err"
echo "confirm rc=$?"; tail -1 "$R/confirm.out"

echo "=== 5. 131k steady-state rerun (native pack + coord compaction + warm compiles) ==="
timeout 3600 python -u experiments/validate_131k_scale.py > "$R/scale131kC.out" 2> "$R/scale131kC.err"
echo "131kC rc=$?"; tail -1 "$R/scale131kC.out"

echo "=== 6. 524k steady-state rerun ==="
timeout 7200 python -u experiments/validate_131k_scale.py --n 524288 > "$R/scale524kB.out" 2> "$R/scale524kB.err"
echo "524kB rc=$?"; tail -1 "$R/scale524kB.out"

echo "=== R4B DONE ==="
