#!/bin/bash
# Poll the TPU tunnel until real compute succeeds TWICE in a row (a
# flapping tunnel must not trigger a doomed multi-hour campaign), then
# launch the round-4 measurement campaign.  The campaign is skip-if-done
# per sample, so if it dies mid-way (tunnel drop) this script goes back
# to polling and relaunches it until it prints ALL DONE — capped at
# MAX_LAUNCHES so a persistent non-tunnel failure cannot loop forever.
# Run detached:
#   nohup bash scripts/tpu_wait_and_run.sh > /tmp/tpu_wait.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
    timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
assert float(np.asarray(jnp.arange(8.0) * 2)[-1]) == 14.0
EOF
}

MAX_LAUNCHES=8
launches=0
while :; do
    log "waiting for TPU compute (launch $((launches + 1))/$MAX_LAUNCHES)..."
    n=0
    ok=0
    while [ $ok -lt 2 ]; do
        if probe; then
            ok=$((ok + 1))
            log "probe OK ($ok/2 consecutive)"
            [ $ok -lt 2 ] && sleep 60
        else
            ok=0
            n=$((n + 1))
            log "probe $n failed (compute hangs or tunnel down); sleeping 5 min"
            if [ $n -ge 72 ]; then
                log "WARNING: $n failed probes (~6 h) — still waiting"
            fi
            sleep 300
        fi
    done
    log "TPU compute OK after $n failed probes — launching campaign"
    bash "${CAMPAIGN:-scripts/tpu_campaign_r5.sh}"
    rc=$?
    launches=$((launches + 1))
    if [ $rc -eq 0 ]; then
        log "campaign completed (rc=0) after $launches launch(es)"
        break
    fi
    if [ $launches -ge $MAX_LAUNCHES ]; then
        log "campaign still failing after $launches launches — giving up"
        break
    fi
    log "campaign exited rc=$rc — re-polling tunnel before relaunch"
    sleep 60
done
