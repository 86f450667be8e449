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

export PERF_HAP_BED=/tmp/hap_bed_r4/rep1
for i in 1 2 3; do
    [ -f /tmp/${TAG}_hap_run$i.json ] && { log "hap run $i recorded — skip"; continue; }
    log "--- hap e2e run $i (rowptr vote) ---"
    timeout 3600 python scripts/perf_e2e_hap.py
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
