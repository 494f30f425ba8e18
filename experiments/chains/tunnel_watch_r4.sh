#!/bin/bash
# Probe the axon tunnel every ~3 min; when it answers (backend-asserted),
# run the r4a chain exactly once (lock dir prevents double launches - the
# one-TPU-process rule). If the chain exits with rc=2 (mid-chain tunnel
# loss) the watcher resumes probing and relaunches; completed steps leave
# their captures in artifacts/r4/chain1 and rerun cheaply (bank caches in
# /tmp persist). Gives up after ~10 h.
set -u
cd /root/repo || exit 1
LOG=/root/repo/artifacts/r4/chain1.log
for i in $(seq 1 200); do
  if timeout 180 python -u -c "
import jax
assert jax.default_backend() != 'cpu', jax.default_backend()
import jax.numpy as jnp
float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())
" >/dev/null 2>&1; then
    if mkdir /tmp/r4chain_launch.lock 2>/dev/null; then
      echo "tunnel up; launching r4a ($(date -u +%H:%M:%S))" | tee -a "$LOG.watch"
      bash experiments/chains/tpu_chain_r4a.sh >> "$LOG" 2>&1
      rc=$?
      rmdir /tmp/r4chain_launch.lock
      echo "r4a finished rc=$rc ($(date -u +%H:%M:%S))" | tee -a "$LOG.watch"
      if [ $rc -ne 2 ] && [ $rc -ne 1 ]; then
        exit 0   # completed (or failed for a non-tunnel reason): stop
      fi
      # rc=1/2: tunnel was down at a probe - resume the probe loop
    else
      echo "chain already running elsewhere; watcher exiting"
      exit 0
    fi
  fi
  sleep 170
done
echo "watcher gave up after ~10h"
exit 1
