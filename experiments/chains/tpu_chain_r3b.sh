#!/bin/bash
# Serialized TPU chain, round 3 second pass (ONE tpu process at a time).
# Ordered by value-per-minute in case the tunnel dies again.
set -u
cd /root/repo
R=/tmp/r3chain2
mkdir -p $R

echo "=== 0. tiny probe ==="
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe ok', float((x@x).sum()), flush=True)
" > $R/probe.out 2> $R/probe.err
rc=$?
echo "probe rc=$rc"
if [ $rc -ne 0 ]; then echo "TUNNEL STILL DOWN - aborting chain"; exit 1; fi

echo "=== 1. bench.py (warm caches) ==="
timeout 1200 python bench.py > $R/bench.out 2> $R/bench.err
echo "bench rc=$?"; cat $R/bench.out

echo "=== 2. golden hll criteria (-a 256) TPU vs CPU engine ==="
for c in hll_a hll_an; do
  timeout 1200 python -c "
from cuda_selection_criteria_tpu.cli import selection
selection.main(['-l','/tmp/influenza_abs.txt','-a','256','-h','0.9','-c','$c'])
" > $R/golden_${c}_tpu.out 2> $R/golden_${c}_tpu.err
  echo "golden $c tpu rc=$?"
  timeout 1200 python -c "
import jax; jax.config.update('jax_platforms','cpu')
from cuda_selection_criteria_tpu.cli import selection
selection.main(['-l','/tmp/influenza_abs.txt','-a','256','-h','0.9','-c','$c'])
" > $R/golden_${c}_cpu.out 2> $R/golden_${c}_cpu.err
  echo "golden $c cpu rc=$?"
  if diff -q $R/golden_${c}_tpu.out $R/golden_${c}_cpu.out >/dev/null; then
    echo "GOLDEN $c: TPU == CPU ($(wc -l < $R/golden_${c}_tpu.out) lines)"
  else
    echo "GOLDEN $c: MISMATCH"; diff $R/golden_${c}_tpu.out $R/golden_${c}_cpu.out | head
  fi
done

echo "=== 2b. golden smh_a at -b 128 (Pallas ti=128 path) ==="
timeout 1200 python -c "
from cuda_selection_criteria_tpu.cli import selection
selection.main(['-l','/tmp/influenza_abs.txt','-a','32','-h','0.9','-c','smh_a','-b','128'])
" > $R/golden_b128.out 2> $R/golden_b128.err
echo "golden -b128 rc=$?"
sed 's|/root/reference/||g' $R/golden_b128.out | diff -q - /root/reference/results.txt >/dev/null \
  && echo "GOLDEN -b128: EXACT" || echo "GOLDEN -b128: MISMATCH"

echo "=== 3. validate_131k_scale (lazy upload + device sort) ==="
timeout 3600 python experiments/validate_131k_scale.py > $R/scale131k.out 2> $R/scale131k.err
echo "131k rc=$?"; tail -2 $R/scale131k.out

echo "=== 4. confirm_throughput (int16 fetch, fixed host path) ==="
timeout 2400 python experiments/confirm_throughput.py > $R/confirm.out 2> $R/confirm.err
echo "confirm rc=$?"; tail -1 $R/confirm.out
timeout 2400 python experiments/confirm_throughput.py --chunk 32768 --batch 65536 > $R/confirm32k.out 2> $R/confirm32k.err
echo "confirm32k rc=$?"; tail -1 $R/confirm32k.out

echo "=== 5. h2d/d2h bandwidth + prune-shape probe ==="
timeout 1800 python experiments/h2d_probe.py > $R/h2d.out 2> $R/h2d.err
echo "h2d rc=$?"; cat $R/h2d.out

echo "=== 5b. ktune: int16-compare probe vs base at best chunk ==="
timeout 2400 python experiments/kernel_tuning.py --tiles 264 \
  --configs "512:auto:int8:chunk132,512:auto:int8c16:chunk132,512:2048:int8c16:chunk132,1024:auto:int8c16:chunk33" \
  > $R/ktune_c16.out 2> $R/ktune_c16.err
echo "ktune_c16 rc=$?"; cat $R/ktune_c16.out

echo "=== 6. viral manifest n=2048 on TPU ==="
timeout 3000 python experiments/validate_viral_manifest.py --n 2048 --workdir /tmp/csc_viralrs_2k > $R/manifest2k.out 2> $R/manifest2k.err
echo "manifest rc=$?"; tail -3 $R/manifest2k.out

echo "=== 7. optional 262k scale run (bank pre-cached) ==="
timeout 3600 python experiments/validate_131k_scale.py --n 262144 > $R/scale262k.out 2> $R/scale262k.err
echo "262k rc=$?"; tail -2 $R/scale262k.out

echo "=== CHAIN DONE ==="
