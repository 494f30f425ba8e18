#!/bin/bash
# Round-3 fourth TPU pass: reruns + upload validation after the
# slab-pipelined bank upload landed (44d8d5d). Runs strictly after r3b.
set -u
cd /root/repo
R=/tmp/r3chain4
mkdir -p $R

echo "=== 0. tiny probe ==="
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok', float((x@x).sum()), flush=True)
" > $R/probe.out 2> $R/probe.err
rc=$?
echo "probe rc=$rc"
if [ $rc -ne 0 ]; then echo "TUNNEL DOWN - aborting r3d"; exit 1; fi

echo "=== 1. viral manifest n=2048 on TPU (r3b run hit a mid-edit import) ==="
timeout 3000 python experiments/validate_viral_manifest.py --n 2048 --workdir /tmp/csc_viralrs_2k > $R/manifest2k.out 2> $R/manifest2k.err
echo "manifest rc=$?"; tail -3 $R/manifest2k.out

echo "=== 2. 131k rerun: slab-pipelined upload + prune wall split (bank cached) ==="
timeout 3600 python experiments/validate_131k_scale.py > $R/scale131k.out 2> $R/scale131k.err
echo "131k rc=$?"; tail -1 $R/scale131k.out

echo "=== 2b. 262k rerun: arena-gather upload + prune wall split (bank cached) ==="
timeout 3600 python experiments/validate_131k_scale.py --n 262144 > $R/scale262k.out 2> $R/scale262k.err
echo "262k rc=$?"; tail -1 $R/scale262k.out

echo "=== 3. ktune: int8 variants toward mxu_util 0.70 (int8c16 fails Mosaic) ==="
timeout 3000 python experiments/kernel_tuning.py --tiles 264 \
  --configs "512:auto:int8:chunk132,512:2048:int8:chunk132,512:4096:int8:chunk132,1024:auto:int8:chunk33,256:auto:int8:chunk528,512:auto:int8:chunk132:deferred,512:auto:int8:chunk132:fpb9" \
  > $R/ktune2.out 2> $R/ktune2.err
echo "ktune2 rc=$?"; cat $R/ktune2.out

echo "=== R3D DONE ==="
