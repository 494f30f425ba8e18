#!/bin/bash
# Round-5 chain 1: certify the fused-screen + certified-margin engine on
# chip, capture the new headline, and measure the rebuilt build pipeline.
# Probe-gated steps with outage retries (tunnel flaps; see CLAUDE.md).
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r5/chain1
mkdir -p "$R"
DEADLINE=$(( $(date +%s) + 6*3600 ))

probe() {
  timeout 180 python -u -c "
import jax
assert jax.default_backend() != 'cpu', jax.default_backend()
import jax.numpy as jnp
float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())
" >/dev/null 2>&1
}

run_step() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  [ -f "$R/$name.done" ] && return 0
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if ! probe; then
      echo "[$name] tunnel down $(date -u +%H:%M:%S); waiting"
      sleep 170
      continue
    fi
    echo "[$name] running $(date -u +%H:%M:%S)"
    timeout "$tmo" "$@" > "$R/$name.out" 2> "$R/$name.err"
    local rc=$?
    if [ $rc -eq 0 ]; then
      echo "[$name] ok"; touch "$R/$name.done"; tail -1 "$R/$name.out"
      return 0
    fi
    if probe; then
      echo "[$name] FAILED rc=$rc with a live tunnel - real failure"
      tail -3 "$R/$name.err"
      return $rc
    fi
    echo "[$name] rc=$rc but tunnel is down - retrying later"
    sleep 170
  done
  echo "[$name] deadline reached"
  return 99
}

golden() {  # name flags...
  local name=$1; shift
  [ -f "$R/golden_$name.done" ] && return 0
  sed "s|^|/root/reference/|" /root/reference/test_influeza_filelist.txt \
    > /tmp/influenza_abs.txt
  run_step "golden_$name" 900 python -u -c "
from cuda_selection_criteria_tpu.cli import selection
selection.main(['-l','/tmp/influenza_abs.txt','-h','0.9'] + '$*'.split())
" || return $?
  if [ "$name" != cb ]; then
    sed "s|/root/reference/||g" "$R/golden_$name.out" \
      | diff - /root/reference/results.txt > /dev/null \
      && echo "golden_$name EXACT" \
      || { echo "golden_$name DIFFERS - FAILURE"; return 1; }
  fi
}

run_step bench 2400 python bench.py
golden smh_a -a 32 -c smh_a
golden cb -a 32 -c cb
golden hll_a -a 256 -c hll_a
golden hll_an -a 256 -c hll_an
golden smh_a_b128 -a 32 -c smh_a -b 128
run_step planted 1800 python -u experiments/validate_screened_tpu.py -n 4096
run_step realscale 3600 python -u experiments/validate_real_scale.py
run_step ring131k 3600 python -u experiments/validate_ring_scale.py
run_step hllaux 2400 python -u experiments/validate_hllaux_tpu.py
echo "=== R5A DONE ==="
