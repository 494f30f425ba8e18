#!/bin/bash
# Round-4 third serialized TPU chain: reruns of the two steps invalidated
# by mid-round code changes, on the final round-4 code.
#   1. ktune chunk variance at ti=1024 (the r4b step raced a signature
#      change and died on import).
#   2. bench under the sustained-load protocol (pipelined reps).
#   3. mosaic repro matrix on the post-retirement kernel (r_sub axis +
#      ti=1024 control).
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain3
mkdir -p "$R"

echo "=== 0. backend probe ==="
timeout 300 python -u -c "
import jax
assert jax.default_backend() != 'cpu', f'cpu fallback: {jax.default_backend()}'
import jax.numpy as jnp
print('probe ok', float((jnp.ones((64,64)) @ jnp.ones((64,64))).sum()), flush=True)
" > "$R/probe.out" 2> "$R/probe.err"
if [ $? -ne 0 ]; then echo "TUNNEL DOWN - aborting r4c"; exit 1; fi

echo "=== 1. ktune chunk variance at ti=1024 ==="
timeout 3000 python -u experiments/kernel_tuning.py --tiles 264 \
  --configs "1024:auto:int8:chunk33,1024:auto:int8:chunk66,1024:auto:int8:chunk16,512:auto:int8:chunk132" \
  > "$R/ktune.out" 2> "$R/ktune.err"
echo "ktune rc=$?"; cat "$R/ktune.out"

echo "=== 2. bench (sustained-load protocol) ==="
timeout 1800 python bench.py > "$R/bench.out" 2> "$R/bench.err"
echo "bench rc=$?"; cat "$R/bench.out"

echo "=== 3. mosaic repro (post-retirement) ==="
timeout 2400 python -u experiments/mosaic_500_repro.py > "$R/mosaic.out" 2> "$R/mosaic.err"
echo "mosaic rc=$?"; cat "$R/mosaic.out"

echo "=== R4C DONE ==="
