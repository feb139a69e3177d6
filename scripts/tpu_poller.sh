#!/bin/bash
# Detached tunnel poller: probes the axon backend every 3 min; when it
# answers, runs the full revalidation sweep once and exits.  Log at
# /tmp/tpu_poller.log, sweep output at /tmp/tpu_revalidate.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
while true; do
  # the probe must EXECUTE an op: during the 2026-08-20 outage the
  # backend registered and listed the device but every execution hung
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" >/dev/null 2>&1; then
    echo "$(date -Is) tunnel UP — starting revalidation" >> /tmp/tpu_poller.log
    bash scripts/tpu_revalidate.sh > /tmp/tpu_revalidate.log 2>&1
    echo "$(date -Is) revalidation finished rc=$?" >> /tmp/tpu_poller.log
    break
  fi
  echo "$(date -Is) tunnel down" >> /tmp/tpu_poller.log
  sleep 180
done
