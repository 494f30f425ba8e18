#!/bin/bash
# Probe the axon tunnel every 4 min; when it answers, run the r3b chain
# exactly once (lockfile guards double launch).
for i in $(seq 1 400); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,8)); float((x@x).sum())
" >/dev/null 2>&1; then
    if mkdir /tmp/r3chain2_launch.lock 2>/dev/null; then
      echo "tunnel up at attempt $i ($(date -u +%H:%M:%S)), launching chain"
      mkdir -p /tmp/r3chain2
      bash /tmp/tpu_chain_r3b.sh > /tmp/r3chain2/chain.log 2>&1
      echo "chain finished rc=$? ($(date -u +%H:%M:%S))"
    else
      echo "tunnel up but chain already launched elsewhere"
    fi
    exit 0
  fi
  echo "attempt $i: tunnel down ($(date -u +%H:%M:%S))"
  sleep 240
done
echo "gave up after 400 attempts"
exit 1
