#!/bin/bash
# Round-5 final e2e campaign (tag r5c). The r5 campaign's 3-sample e2e
# median (552.4 s) carried one host-contended and one tunnel-collapsed
# run; /tmp records (and the generated beds + compile cache) did not
# survive to the supplemental r5b pass. This script reproduces the
# measurement from scratch on a healthy tunnel:
#   run 1: bed generation (untimed setup inside the script) + compile
#          debt (persistent cache at .jax_cache is empty) — recorded as
#          warmup, excluded from the median
#   runs 2-4: warm samples -> true 3-sample median + warm stage-wall
#          medians (the ICE-500kb acceptance gate: < 10 s vs 140.5 r4)
set -u
TAG=r5c
HERE="$(cd "$(dirname "$0")/.." && pwd)"
cd "$HERE"
log() { echo "[$(date +%H:%M:%S)] $*"; }

export PERF_E2E_BED=/tmp/e2e_bed_r5c/rep1
for i in 1 2 3 4; do
    [ -f /tmp/${TAG}_e2e_run$i.json ] && { log "e2e run $i recorded — skip"; continue; }
    log "--- e2e run $i ---"
    timeout 3600 python scripts/perf_e2e.py
    rc=$?
    log "e2e run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_e2e.json" /tmp/${TAG}_e2e_run$i.json 2>/dev/null
    find /tmp -maxdepth 1 -type d -name 'perf_e2e_*' -exec rm -rf {} +
    [ $rc -ne 0 ] && exit 1
done

python - "$HERE" <<'EOF'
import json, statistics, sys
here = sys.argv[1]
recs = []
for i in range(1, 5):
    try:
        recs.append((i, json.load(open(f"/tmp/r5c_e2e_run{i}.json"))))
    except Exception:
        pass
all_ts = [r["total_s"] for _, r in recs]
warm = [r for i, r in recs if i >= 2]
ts = [r["total_s"] for r in warm]
print("e2e samples (run1=warmup):", all_ts)
if len(ts) >= 3:
    rec = warm[-1]
    rec["median_total_s"] = round(statistics.median(ts), 1)
    rec["sample_totals_s"] = ts
    rec["warmup_total_s"] = all_ts[0] if len(all_ts) == 4 else None
    for k in ("matrix_s", "compartments_s", "tads_s", "loops_s"):
        vals = [r[k] for r in warm if k in r]
        if vals:
            rec[f"median_{k}"] = round(statistics.median(vals), 1)
    keys = set().union(*(r.get("stage_walls", {}) for r in warm))
    rec["median_stage_walls"] = {
        k: round(statistics.median([r["stage_walls"][k] for r in warm
                                    if k in r.get("stage_walls", {})]), 2)
        for k in sorted(keys)}
    ice = rec["median_stage_walls"].get("matrix.ice.500000.gw")
    if ice is not None:
        rec["median_ice500_gw_s"] = ice
    json.dump(rec, open(f"{here}/.perf_e2e.json", "w"))
    print("e2e warm median recorded:", rec["median_total_s"], "ice500:", ice)
EOF
log "R5C DONE"
