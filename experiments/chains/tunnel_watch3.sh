#!/bin/bash
# Runs /tmp/tpu_chain_r3c.sh exactly once, strictly AFTER the r3b chain
# has finished (never two TPU processes at once). Two paths:
#  - normal: watcher2 launched r3b (lock dir exists) -> wait for its
#    chain.log to reach a terminal line, then run r3c.
#  - fallback: watcher2 died without ever launching r3b (no lock) ->
#    take the lock ourselves, probe the tunnel, run r3b then r3c.
set -u
for i in $(seq 1 600); do
  if [ -d /tmp/r3chain2_launch.lock ]; then
    # r3b launched (or launching). Wait until it is done.
    if grep -qE "CHAIN DONE|aborting chain" /tmp/r3chain2/chain.log 2>/dev/null \
       && ! pgrep -x -f "bash /tmp/tpu_chain_r3b.sh" >/dev/null 2>&1; then
      if grep -q "aborting chain" /tmp/r3chain2/chain.log 2>/dev/null; then
        # r3b aborted on a dead tunnel; release nothing, just retry r3b
        # ourselves next loop by removing its log marker guard via r3c's
        # own probe (r3c probes too). Run r3b again before r3c.
        if mkdir /tmp/r3b_retry.lock 2>/dev/null; then
          echo "r3b aborted earlier; retrying r3b ($(date -u +%H:%M:%S))"
          bash /tmp/tpu_chain_r3b.sh > /tmp/r3chain2/chain.log 2>&1
          echo "r3b retry finished rc=$? ($(date -u +%H:%M:%S))"
          rmdir /tmp/r3b_retry.lock
          continue
        fi
      fi
      if mkdir /tmp/r3chain3_launch.lock 2>/dev/null; then
        echo "r3b done; launching r3c ($(date -u +%H:%M:%S))"
        mkdir -p /tmp/r3chain3
        bash /tmp/tpu_chain_r3c.sh > /tmp/r3chain3/chain.log 2>&1 || true
        echo "r3c finished ($(date -u +%H:%M:%S))"
      else
        echo "r3c already launched elsewhere"
      fi
      exit 0
    fi
  elif ! pgrep -f "tunnel_watch2.sh" >/dev/null 2>&1; then
    # watcher2 is gone and never launched r3b: take over.
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,8)); float((x@x).sum())
" >/dev/null 2>&1; then
      if mkdir /tmp/r3chain2_launch.lock 2>/dev/null; then
        echo "watcher2 dead; tunnel up; running r3b ($(date -u +%H:%M:%S))"
        mkdir -p /tmp/r3chain2
        bash /tmp/tpu_chain_r3b.sh > /tmp/r3chain2/chain.log 2>&1
        echo "r3b finished rc=$? ($(date -u +%H:%M:%S))"
      fi
      continue
    fi
  fi
  sleep 120
done
echo "watcher3 gave up"
exit 1
