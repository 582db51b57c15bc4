#!/bin/bash
# Patient single-client TPU waiter: one probe at a time, generous per-attempt
# timeout, long sleeps between attempts (stale claims can wedge new clients;
# probe sparingly per CLAUDE.md). On success, runs the round-3 measurement
# batch sequentially and exits.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_meas}
BATCH=${2:-scripts/run_tpu_measurements.sh}
ATTEMPTS=${3:-6}
mkdir -p "$OUT"
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "[waiter] attempt $attempt: $(date +%H:%M:%S)" >> "$OUT/waiter.log"
  # -k 15: wedged TPU clients sit in futex wait and survive SIGTERM
  # (CLAUDE.md); escalate to SIGKILL so a dead probe can't linger and
  # overlap the next attempt (one-client rule).
  timeout -k 15 600 python - <<'PY' >> "$OUT/waiter.log" 2>&1 &
import time, jax
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
print("devices:", d, "after", round(time.time()-t0,1), "s")
print("fetch:", float(jnp.sum(jnp.ones((128,128)))))
PY
  PROBE_PID=$!
  wait "$PROBE_PID"
  rc=$?
  # Belt and braces: make sure the probe is really gone before anything
  # else touches the TPU (stacked clients wedge the backend).
  if kill -0 "$PROBE_PID" 2>/dev/null; then
    kill -9 "$PROBE_PID" 2>/dev/null
    sleep 5
  fi
  if [ $rc -eq 0 ]; then
    echo "[waiter] TPU LIVE at $(date +%H:%M:%S); running batch" >> "$OUT/waiter.log"
    bash "$BATCH" "$OUT" >> "$OUT/batch.log" 2>&1
    echo "[waiter] batch done rc=$? at $(date +%H:%M:%S)" >> "$OUT/waiter.log"
    exit 0
  fi
  echo "[waiter] attempt $attempt failed rc=$rc; sleeping 480s" >> "$OUT/waiter.log"
  sleep 480
done
echo "[waiter] giving up after $ATTEMPTS attempts" >> "$OUT/waiter.log"
exit 1
