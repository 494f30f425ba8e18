#!/bin/bash
# Round-5 chain 2: fused-kernel operating-point sweep + the 524k ring
# end-to-end rerun with the fused screen (target: beat r4's 46.2x).
# Waits for chain 1 to finish (one TPU process at a time - CLAUDE.md).
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r5/chain3
mkdir -p "$R"
DEADLINE=$(( $(date +%s) + 8*3600 ))

while pgrep -f tpu_chain_r5b.sh >/dev/null 2>&1; do
  echo "waiting for chain r5a to finish $(date -u +%H:%M:%S)"
  sleep 120
  [ "$(date +%s)" -ge "$DEADLINE" ] && exit 99
done

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

run_step ring524k 5400 python -u experiments/validate_ring_scale.py --n 524288
run_step ring262k 3600 python -u experiments/validate_ring_scale.py --n 262144
run_step realscale3 3600 env CSC_BUILD_PROFILE=1 python -u experiments/validate_real_scale.py
echo "=== R5C DONE ==="
