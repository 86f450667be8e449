#!/bin/bash
# Poll the TPU tunnel until real compute succeeds, then launch the
# round-3 measurement campaign (scripts/tpu_requeue.sh). Run detached:
#   nohup bash scripts/tpu_wait_and_run.sh > /tmp/tpu_wait.log 2>&1 &
set -u
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
    timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
assert float(np.asarray(jnp.arange(8.0) * 2)[-1]) == 14.0
EOF
}

log "waiting for TPU compute to come back..."
n=0
until probe; do
    n=$((n + 1))
    log "probe $n failed (compute hangs or tunnel down); sleeping 5 min"
    sleep 300
done
log "TPU compute OK after $n failed probes — launching campaign"
bash scripts/tpu_requeue.sh
