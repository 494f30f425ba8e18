#!/bin/bash
# Round-4 final consolidation chain (resilient per-step runner):
#   1. 524k cascade repeat - reproducibility of the 20.6x end-to-end.
#   2. ring engine at 262k (4 GiB strip) - extends the ring ladder.
#   3. real-sequence end-to-end (2054 FASTA genomes incl. megabase
#      chunked builds) re-certified at the round-4 ti=1024 defaults.
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain6
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

run_step() {
  local name=$1 tmo=$2; shift 2
  [ -f "$R/$name.done" ] && return 0
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if ! probe; then
      echo "[$name] tunnel down $(date -u +%H:%M:%S); waiting"; sleep 170
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
      echo "[$name] FAILED rc=$rc with a live tunnel"; tail -3 "$R/$name.err"
      return $rc
    fi
    echo "[$name] rc=$rc but tunnel is down - retrying later"; sleep 170
  done
  echo "[$name] deadline reached"; return 99
}

run_step scale524kC 7200 python -u experiments/validate_131k_scale.py --n 524288
run_step ring262k   5400 python -u experiments/validate_ring_scale.py --n 262144
run_step realscale  5400 python -u experiments/validate_real_scale.py
echo "=== R4F DONE ==="
