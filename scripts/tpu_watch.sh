#!/bin/bash
# Poll the axon TPU tunnel until it answers; touch /tmp/tpu_up when it does.
# Usage: bash scripts/tpu_watch.sh  (run in background; bounded to ~6h)
rm -f /tmp/tpu_up
for i in $(seq 1 180); do
  if PYTHONPATH=/root/repo:/root/.axon_site timeout 90 python -c "
import jax, jax.numpy as jnp
assert jnp.arange(8).sum() == 28
print('TPU OK', jax.devices())
" >/tmp/tpu_probe.log 2>&1; then
    touch /tmp/tpu_up
    echo "tunnel up at $(date)"
    exit 0
  fi
  sleep 90
done
echo "gave up at $(date)"
exit 1
