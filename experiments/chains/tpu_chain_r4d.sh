#!/bin/bash
# Round-4 fourth serialized TPU chain: the two steps the tunnel outage ate
# in r4c, plus the ring rerun with the new stage-1 gate prune.
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain4
mkdir -p "$R"

echo "=== 0. backend probe ==="
timeout 300 python -u -c "
import jax
assert jax.default_backend() != 'cpu', f'cpu fallback: {jax.default_backend()}'
import jax.numpy as jnp
print('probe ok', float((jnp.ones((64,64)) @ jnp.ones((64,64))).sum()), flush=True)
" > "$R/probe.out" 2> "$R/probe.err"
if [ $? -ne 0 ]; then echo "TUNNEL DOWN - aborting r4d"; exit 1; fi

echo "=== 1. bench (sustained-load protocol) ==="
timeout 1800 python bench.py > "$R/bench.out" 2> "$R/bench.err"
echo "bench rc=$?"; cat "$R/bench.out"

echo "=== 2. mosaic repro (post-retirement) ==="
timeout 2400 python -u experiments/mosaic_500_repro.py > "$R/mosaic.out" 2> "$R/mosaic.err"
echo "mosaic rc=$?"; cat "$R/mosaic.out"

echo "=== 3. ring 131k rerun (stage-1 gate prune) ==="
timeout 5400 python -u experiments/validate_ring_scale.py > "$R/ring131k.out" 2> "$R/ring131k.err"
echo "ring131k rc=$?"; tail -1 "$R/ring131k.out"

echo "=== 4. hll-aux planted certification at the ti=1024 default ==="
timeout 2400 python -u experiments/validate_hllaux_tpu.py > "$R/hllaux.out" 2> "$R/hllaux.err"
echo "hllaux rc=$?"; tail -2 "$R/hllaux.out"

echo "=== 5. 262k steady-state rerun ==="
timeout 3600 python -u experiments/validate_131k_scale.py --n 262144 > "$R/scale262k.out" 2> "$R/scale262k.err"
echo "262k rc=$?"; tail -1 "$R/scale262k.out"

echo "=== R4D DONE ==="
