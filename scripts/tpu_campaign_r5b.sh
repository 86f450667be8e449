#!/bin/bash
# Supplemental round-5 campaign: diploid e2e on the ROW-POINTER vote
# kernel (d8afb23), run after the main campaign's hap samples measured
# the lex-search kernel at the snapshot commit.  Produces the official
# .perf_e2e_hap.json (3 samples, true median, pass3 device/host split)
# plus the before/after evidence for PERF.md.
set -u
TAG="${TAG:-r5b}"
export TAG
HERE="$(cd "$(dirname "$0")/.." && pwd)"
MAIN=/root/repo
cd "$HERE"
log() { echo "[$(date +%H:%M:%S)] $*"; }

# -- supplemental e2e samples 4-5 (the campaign's 3 carried one
# host-contended and one tunnel-collapsed run; two more clean samples
# firm the median, re-aggregated over all 5) --------------------------
export PERF_E2E_BED=/tmp/e2e_bed_r4/rep1
for i in 4 5; do
    [ -f /tmp/r5_e2e_run$i.json ] && { log "e2e run $i recorded — skip"; continue; }
    log "--- e2e supplemental run $i ---"
    timeout 3600 python scripts/perf_e2e.py
    rc=$?
    log "e2e run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_e2e.json" /tmp/r5_e2e_run$i.json 2>/dev/null
    find /tmp -maxdepth 1 -type d -name 'perf_e2e_*' -exec rm -rf {} +
    [ $rc -ne 0 ] && exit 1
done
python - "$HERE" <<'EOF'
import json, statistics, sys
here = sys.argv[1]
recs = []
for i in range(1, 6):
    try:
        recs.append(json.load(open(f"/tmp/r5_e2e_run{i}.json")))
    except Exception:
        pass
ts = [r["total_s"] for r in recs]
print("e2e samples (all):", ts)
if len(ts) >= 3:
    rec = recs[-1]
    rec["median_total_s"] = round(statistics.median(ts), 1)
    rec["sample_totals_s"] = ts
    for k in ("matrix_s", "compartments_s", "tads_s", "loops_s"):
        vals = [r[k] for r in recs if k in r]
        if vals:
            rec[f"median_{k}"] = round(statistics.median(vals), 1)
    keys = set().union(*(r.get("stage_walls", {}) for r in recs))
    rec["median_stage_walls"] = {
        k: round(statistics.median([r["stage_walls"][k] for r in recs
                                    if k in r.get("stage_walls", {})]), 2)
        for k in sorted(keys)}
    ice = rec["median_stage_walls"].get("matrix.ice.500000.gw")
    if ice is not None:
        rec["median_ice500_gw_s"] = ice
    json.dump(rec, open(f"{here}/.perf_e2e.json", "w"))
    print("e2e 5-sample median recorded:", rec["median_total_s"],
          "ice500 median:", ice)
EOF
for f in .perf_e2e.json; do
    [ -f "$HERE/$f" ] && [ "$HERE" != "$MAIN" ] && cp "$HERE/$f" "$MAIN/$f"
done

export PERF_HAP_BED=/tmp/hap_bed_r4/rep1
for i in 1 2 3; do
    [ -f /tmp/${TAG}_hap_run$i.json ] && { log "hap run $i recorded — skip"; continue; }
    log "--- hap e2e run $i (rowptr vote) ---"
    timeout 5400 python scripts/perf_e2e_hap.py
    rc=$?
    log "hap e2e run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_e2e_hap.json" /tmp/${TAG}_hap_run$i.json 2>/dev/null
    rm -rf /tmp/perf_hap_out_*
    [ $rc -ne 0 ] && exit 1
done
python - "$HERE" <<'EOF'
import json, os, statistics, sys
here = sys.argv[1]
tag = os.environ.get("TAG", "r5b")
recs = []
for i in range(1, 4):
    try:
        recs.append(json.load(open(f"/tmp/{tag}_hap_run{i}.json")))
    except Exception:
        pass
ts = [r["total_s"] for r in recs]
print("hap samples (rowptr):", ts)
if recs:
    rec = recs[-1]
    rec["sample_totals_s"] = ts
    rec["median_total_s"] = round(statistics.median(ts), 1)
    for k in list(recs[-1]):
        if k.startswith("matrix."):
            vals = [r[k] for r in recs if k in r]
            rec[f"median::{k}"] = round(statistics.median(vals), 1)
    json.dump(rec, open(f"{here}/.perf_e2e_hap.json", "w"))
    print("hap median recorded:", rec["median_total_s"])
EOF
for f in .perf_e2e_hap.json; do
    [ -f "$HERE/$f" ] && [ "$HERE" != "$MAIN" ] && cp "$HERE/$f" "$MAIN/$f"
done
log "R5B DONE"
