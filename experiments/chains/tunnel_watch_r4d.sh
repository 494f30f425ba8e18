#!/bin/bash
# Wait for r4c to finish, then probe the tunnel every ~3 min and run the
# r4d chain once it answers. Gives up after ~10 h.
set -u
cd /root/repo || exit 1
chmod +x experiments/chains/tpu_chain_r4d.sh
for i in $(seq 1 200); do
  if pgrep -f "tpu_chain_r4c.sh" >/dev/null 2>&1; then
    sleep 60; continue
  fi
  if timeout 180 python -u -c "
import jax
assert jax.default_backend() != 'cpu', jax.default_backend()
import jax.numpy as jnp
float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())
" >/dev/null 2>&1; then
    if mkdir /tmp/r4d_launch.lock 2>/dev/null; then
      echo "tunnel up; launching r4d ($(date -u +%H:%M:%S))"
      bash experiments/chains/tpu_chain_r4d.sh > artifacts/r4/chain4.log 2>&1
      rc=$?
      rmdir /tmp/r4d_launch.lock
      echo "r4d finished rc=$rc ($(date -u +%H:%M:%S))"
      if [ $rc -ne 1 ]; then exit 0; fi
    else
      echo "r4d already running elsewhere"; exit 0
    fi
  fi
  sleep 170
done
echo "watcher gave up"
exit 1
