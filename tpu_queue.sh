#!/bin/bash
# Serial TPU job queue that survives tunnel outages: probe with a real
# matmul readback before each job; on job failure, re-probe and retry.
# Usage: tpu_queue.sh <jobtag:script> [...]  — outputs to /tmp/<jobtag>.out/.err
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); assert float((x @ x).sum()) == 128.0 * 128 * 128
" 2>/dev/null
}
wait_healthy() {
  local i=0
  until probe; do
    i=$((i + 1))
    echo "[queue] tunnel down, wait #$i $(date -u +%H:%M:%S)"
    if [ "$i" -ge 40 ]; then return 1; fi
    sleep 180
  done
  return 0
}
for spec in "$@"; do
  tag="${spec%%:*}"; script="${spec#*:}"
  for attempt in 1 2 3; do
    wait_healthy || { echo "[queue] giving up on tunnel"; exit 1; }
    echo "[queue] run $tag attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 2700 python "$script" >"/tmp/$tag.out" 2>"/tmp/$tag.err"; then
      echo "[queue] $tag OK"
      break
    fi
    echo "[queue] $tag FAILED (attempt $attempt), tail of err:"
    tail -3 "/tmp/$tag.err"
    sleep 60
  done
done
echo "[queue] all done $(date -u +%H:%M:%S)"
