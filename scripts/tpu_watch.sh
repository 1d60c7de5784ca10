#!/bin/bash
# Probe the TPU tunnel every 10 min; append status lines to /tmp/tpu_watch.log.
# Run under nohup; each probe is a killable subprocess with a hard timeout.
while true; do
  ts=$(date -u +%H:%M:%S)
  out=$(timeout 120 python -c "
import jax
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('UP', d[0].platform, len(d))
" 2>&1 | tail -1)
  echo "$ts $out" >> /tmp/tpu_watch.log
  case "$out" in UP*) echo "$ts TUNNEL UP" >> /tmp/tpu_watch.log ;; esac
  sleep 600
done
