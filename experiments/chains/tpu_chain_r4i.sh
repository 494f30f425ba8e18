#!/bin/bash
# Round-4 ring 524k retry after the single-strip diagonal-program fix
# (the two-strip programs doubled the HBM budget: 16.10G/15.75G OOM in
# artifacts/r4/chain8/ring524k.err)
# Original header:: the ring engine gained the scale
# harness's warm-compile discipline (gate/screen executables warmed
# before the timed loop, compile walls reported separately, gate/screen
# walls disjoint) after the cold-cache chain7 run buried 137.8 s of
# compile inside gate_secs. Re-measure 262k and 131k, then push the ring
# to the 524k single-strip operating point, plus one bench rep.
# Resilient per-step runner (the tunnel flaps in 20-60 min windows).
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain9
mkdir -p "$R"
DEADLINE=$(( $(date +%s) + 5*3600 ))

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

run_step ring524k  7200 python -u experiments/validate_ring_scale.py --n 524288
echo "=== R4I DONE ==="
