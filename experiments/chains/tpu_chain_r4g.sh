#!/bin/bash
# Round-4 final measurement pass: the 524k cascade and the 262k ring with
# the fused native gather+pack upload (the 77 s host gather stream is
# gone), plus one bench rep. Resilient per-step runner.
set -u
cd /root/repo || exit 1
R=/root/repo/artifacts/r4/chain7
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

run_step scale524kD 7200 python -u experiments/validate_131k_scale.py --n 524288
run_step ring262kB  5400 python -u experiments/validate_ring_scale.py --n 262144
run_step bench      1800 python bench.py
echo "=== R4G DONE ==="
