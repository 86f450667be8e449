#!/bin/bash
# TPU measurement campaign (round 3). Run UNATTENDED with no timeouts
# (loop-stage compile debt can be 25-60+ min if the remote compile cache
# was lost with the server):
#
#   nohup bash scripts/tpu_requeue.sh > /tmp/tpu_requeue.log 2>&1 &
#
# Order: warmup (pays all compile debt) -> 5 median samples -> loops
# phase breakdown (device-vs-link split) -> TRUE e2e on the chip ->
# bench sanity. One TPU process at a time; nothing else may run on the
# host while samples are being timed.
set -u
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== tunnel probe ==="
if ! timeout 5 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    log "tunnel still down (port 8093 refused) — aborting"
    exit 1
fi

log "=== perf_hg19 WARMUP (compile debt; no timeout) ==="
python scripts/perf_hg19.py
rc=$?
log "warmup rc=$rc"
if [ $rc -ne 0 ]; then
    log "warmup failed — stopping before medians"
    exit 1
fi

log "=== 5 median samples ==="
for i in 1 2 3 4 5; do
    log "--- run $i ---"
    python scripts/perf_hg19.py
    log "run$i rc=$?"
    cp /root/repo/.perf_hg19.json /tmp/perf_hg19_run$i.json 2>/dev/null
done
python - <<'EOF'
import json, statistics
ts = []
for i in range(1, 6):
    try:
        ts.append(json.load(open(f"/tmp/perf_hg19_run{i}.json"))["total_s"])
    except Exception:
        pass
print("samples:", ts)
if len(ts) >= 3:
    rec = json.load(open("/root/repo/.perf_hg19.json"))
    rec["median_total_s"] = round(statistics.median(ts), 1)
    rec["sample_totals_s"] = ts
    json.dump(rec, open("/root/repo/.perf_hg19.json", "w"))
    print("median recorded:", rec["median_total_s"])
EOF

log "=== loops phase breakdown (device vs link) ==="
PERF_ONLY=loops HICHAP_LOOP_PHASE_TIMING=1 python scripts/perf_hg19.py \
    > /tmp/perf_hg19_phases.log 2>&1
log "phases rc=$? (full output in /tmp/perf_hg19_phases.log)"
grep -E "loop phases|loops " /tmp/perf_hg19_phases.log

log "=== TRUE e2e on the chip (bed regenerated; ~13 min untimed setup) ==="
python scripts/perf_e2e.py
log "e2e rc=$?"

log "=== TRUE diploid e2e on the chip ==="
python scripts/perf_e2e_hap.py
log "hap e2e rc=$?"

log "=== bench sanity ==="
python bench.py
log "ALL DONE"
