#!/bin/bash
# Round-3 third TPU pass: the ~500k-genome claim, run for real.
# MUST only run after /tmp/tpu_chain_r3b.sh is completely done.
set -u
cd /root/repo
R=/tmp/r3chain3
mkdir -p $R

echo "=== 0. tiny probe ==="
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok', float((x@x).sum()), flush=True)
" > $R/probe.out 2> $R/probe.err
rc=$?
echo "probe rc=$rc"
if [ $rc -ne 0 ]; then echo "TUNNEL DOWN - aborting r3c"; exit 1; fi

echo "=== 1. N=524288 full cascade (bank pre-cached) ==="
timeout 7200 python experiments/validate_131k_scale.py --n 524288 \
  > $R/scale524k.out 2> $R/scale524k.err
echo "524k rc=$?"; tail -2 $R/scale524k.out

echo "=== 2. bench rep 2 (variance capture) ==="
timeout 1200 python bench.py > $R/bench2.out 2> $R/bench2.err
echo "bench2 rc=$?"; cat $R/bench2.out

echo "=== R3C DONE ==="
