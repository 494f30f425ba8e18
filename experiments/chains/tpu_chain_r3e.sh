#!/bin/bash
# Round-3 fifth TPU pass: the VM restarted on 2026-08-18 and wiped /tmp
# (bank caches, compile cache, the r3d chain that was mid-queue). This
# chain re-runs everything still outstanding, re-ordered by
# value-per-minute:
#   1. bench.py first - it rebuilds the /tmp bank + XLA compile caches
#      that the DRIVER's end-of-round capture (BENCH_r03.json) needs to
#      finish inside its timeout, and gives this session's variance rep.
#   2. 131k cascade rerun - validates the slab-pipelined upload (44d8d5d
#      + 155c33c) and the prune wall split at scale.
#   3. int8 utilization sweep (ktune) - short, targets mxu_util >= 0.70.
#   4. 262k cascade rerun - arena-gather upload at 4 GiB.
#   5. viral manifest n=2048 on TPU (r3b run aborted on a mid-edit
#      import; r3d never got to run before the VM restart).
#   6. 524k cascade - the "~500k genomes on one chip" operating point.
set -u
cd /root/repo
R=/tmp/r3chain5
mkdir -p $R

echo "=== 0. tiny probe ==="
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok', float((x@x).sum()), flush=True)
" > $R/probe.out 2> $R/probe.err
rc=$?
echo "probe rc=$rc"
if [ $rc -ne 0 ]; then echo "TUNNEL DOWN - aborting r3e"; exit 1; fi

echo "=== 1. bench (rebuild caches + variance rep) ==="
timeout 1200 python bench.py > $R/bench.out 2> $R/bench.err
echo "bench rc=$?"; cat $R/bench.out

echo "=== 2. 131k cascade: slab-pipelined upload + prune wall split ==="
timeout 3600 python experiments/validate_131k_scale.py > $R/scale131k.out 2> $R/scale131k.err
echo "131k rc=$?"; tail -1 $R/scale131k.out

echo "=== 3. ktune: int8 variants toward mxu_util 0.70 ==="
timeout 3000 python experiments/kernel_tuning.py --tiles 264 \
  --configs "512:auto:int8:chunk132,512:2048:int8:chunk132,512:4096:int8:chunk132,1024:auto:int8:chunk33,256:auto:int8:chunk528,512:auto:int8:chunk132:deferred,512:auto:int8:chunk132:fpb9" \
  > $R/ktune2.out 2> $R/ktune2.err
echo "ktune2 rc=$?"; cat $R/ktune2.out

echo "=== 4. 262k cascade: arena-gather slab upload at 4 GiB ==="
timeout 3600 python experiments/validate_131k_scale.py --n 262144 > $R/scale262k.out 2> $R/scale262k.err
echo "262k rc=$?"; tail -1 $R/scale262k.out

echo "=== 5. viral manifest n=2048 on TPU ==="
timeout 3000 python experiments/validate_viral_manifest.py --n 2048 --workdir /tmp/csc_viralrs_2k > $R/manifest2k.out 2> $R/manifest2k.err
echo "manifest rc=$?"; tail -3 $R/manifest2k.out

echo "=== 6. N=524288 full cascade ==="
timeout 7200 python experiments/validate_131k_scale.py --n 524288 \
  > $R/scale524k.out 2> $R/scale524k.err
echo "524k rc=$?"; tail -2 $R/scale524k.out

echo "=== R3E DONE ==="
