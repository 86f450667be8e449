#!/bin/bash
# TPU measurement campaign (round 5). VERDICT r4 called this round "a
# measurement round": the compile-shape-ladder + uint16-wire fixes that
# address the diagnosed ~140 s ICE-500kb anomaly landed AFTER the round-4
# samples were taken, so every published e2e number carries known-fixed
# overhead. This campaign re-measures everything on the post-fix code:
#   0. probe_ice500 — direct before/after evidence for the 140 s anomaly
#   1. TRUE e2e (beds -> coolers -> calls) x3 on the chip (run 1 pays any
#      residual compile debt; median lands on warm runs)
#   2. full-suite: warmup + 5 phase-instrumented + 3 plain samples
#      (the BASELINE <60 s north-star, finally as a median)
#   3. TRUE diploid e2e: quick-mode warmup (compile debt at DIV=4, same
#      program shapes) + 3 FULL samples -> a true median
#   4. host stages x3 each (filtering 20M rec, allelic 10M pairs) ->
#      medians with dispersion (VERDICT item 5)
#   5. bench sanity (median-of-3 primary + recorded extras)
#
# Resumable: every sample is skip-if-done via /tmp/${TAG}_* records; the
# waiter (tpu_wait_and_run.sh) relaunches on nonzero exit. One TPU
# process and one timed process at a time (1-core host).
set -u
TAG="${TAG:-r5}"
export TAG
HERE="$(cd "$(dirname "$0")/.." && pwd)"
MAIN=/root/repo
cd "$HERE"

log() { echo "[$(date +%H:%M:%S)] $*"; }
publish() {
    for f in .perf_hg19.json .perf_e2e.json .perf_e2e_hap.json \
             .perf_filtering.json .perf_allelic.json .perf_scan_ab.json; do
        [ -f "$HERE/$f" ] && [ "$HERE" != "$MAIN" ] && cp "$HERE/$f" "$MAIN/$f"
    done
    log "published perf records to $MAIN"
}

log "=== 0. probe_ice500 on the post-ladder code (before/after for the 140 s anomaly) ==="
if [ -f /tmp/${TAG}_probe_ice500.log ]; then
    log "probe recorded — skip"
else
    timeout 1200 python scripts/probe_ice500.py 2>&1 | tee /tmp/${TAG}_probe_ice500.tmp
    rc=${PIPESTATUS[0]}
    log "probe rc=$rc"
    [ $rc -eq 0 ] && mv /tmp/${TAG}_probe_ice500.tmp /tmp/${TAG}_probe_ice500.log \
        && cp /tmp/${TAG}_probe_ice500.log "$MAIN/.probe_ice500_r5.log"
    [ $rc -ne 0 ] && exit 1
fi

log "=== 1. TRUE e2e ON THE CHIP x3 (post-fix; VERDICT item 1) ==="
export PERF_E2E_BED=/tmp/e2e_bed_r4/rep1
for i in 1 2 3; do
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
import json, os, statistics, sys
here = sys.argv[1]
tag = os.environ.get("TAG", "r5")
recs = []
for i in range(1, 4):
    try:
        recs.append(json.load(open(f"/tmp/{tag}_e2e_run{i}.json")))
    except Exception:
        pass
ts = [r["total_s"] for r in recs]
print("e2e samples:", ts)
if len(ts) >= 2:
    rec = recs[-1]
    rec["median_total_s"] = round(statistics.median(ts), 1)
    rec["sample_totals_s"] = ts
    for k in ("matrix_s", "compartments_s", "tads_s", "loops_s"):
        vals = [r[k] for r in recs if k in r]
        if vals:
            rec[f"median_{k}"] = round(statistics.median(vals), 1)
    # per-stage medians across runs (the ICE-500kb wall is the round-5
    # acceptance criterion: < 10 s vs 140.5 s in round 4)
    keys = set().union(*(r.get("stage_walls", {}) for r in recs))
    rec["median_stage_walls"] = {
        k: round(statistics.median([r["stage_walls"][k] for r in recs
                                    if k in r.get("stage_walls", {})]), 2)
        for k in sorted(keys)}
    ice = rec["median_stage_walls"].get("matrix.ice.500000.gw")
    if ice is not None:
        rec["median_ice500_gw_s"] = ice
    json.dump(rec, open(f"{here}/.perf_e2e.json", "w"))
    print("e2e median recorded:", rec["median_total_s"],
          "ice500:", ice)
EOF
publish

if [ -f /tmp/${TAG}_hg19_warmup.done ]; then
    log "fullsuite warmup already done — skip"
else
    log "=== 2a. perf_hg19 WARMUP (compile debt; untimed) ==="
    HICHAP_LOOP_PHASE_TIMING=1 timeout 2700 python scripts/perf_hg19.py
    rc=$?
    log "warmup rc=$rc"
    [ $rc -ne 0 ] && exit 1
    touch /tmp/${TAG}_hg19_warmup.done
fi

log "=== 2b. TIMED: 5 phase-instrumented full-suite samples ==="
for i in 1 2 3 4 5; do
    [ -f /tmp/${TAG}_hg19_phased_run$i.json ] && { log "phased run $i recorded — skip"; continue; }
    log "--- phased run $i ---"
    HICHAP_LOOP_PHASE_TIMING=1 timeout 2700 python scripts/perf_hg19.py
    rc=$?
    log "phased run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_hg19.json" /tmp/${TAG}_hg19_phased_run$i.json 2>/dev/null
    [ $rc -ne 0 ] && exit 1
done

log "=== 2c. TIMED: 3 plain full-suite samples (instrumentation control) ==="
for i in 1 2 3; do
    [ -f /tmp/${TAG}_hg19_plain_run$i.json ] && { log "plain run $i recorded — skip"; continue; }
    log "--- plain run $i ---"
    timeout 1800 python scripts/perf_hg19.py
    rc=$?
    log "plain run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_hg19.json" /tmp/${TAG}_hg19_plain_run$i.json 2>/dev/null
    [ $rc -ne 0 ] && exit 1
done

python - "$HERE" <<'EOF'
import json, os, statistics, sys
here = sys.argv[1]
tag = os.environ.get("TAG", "r5")
phased, plain, phases = [], [], []
for i in range(1, 6):
    try:
        r = json.load(open(f"/tmp/{tag}_hg19_phased_run{i}.json"))
        phased.append(r["total_s"])
        phases.append(r.get("loops_phases"))
    except Exception:
        pass
for i in range(1, 4):
    try:
        plain.append(json.load(
            open(f"/tmp/{tag}_hg19_plain_run{i}.json"))["total_s"])
    except Exception:
        pass
print("phased samples:", phased)
print("plain samples:", plain)
if len(phased) >= 3:
    rec = json.load(open(f"{here}/.perf_hg19.json"))
    rec["median_total_s"] = round(statistics.median(phased), 1)
    rec["sample_totals_s"] = phased
    rec["plain_sample_totals_s"] = plain
    if plain:
        rec["plain_median_total_s"] = round(statistics.median(plain), 1)
    rec["per_run_loops_phases"] = phases
    # device-vs-link split: the loops upload phase is pure tunnel wire
    # time (~0.1 s for the same bytes on a PCIe host)
    ups = [p.get("upload") for p in phases if p]
    if ups:
        rec["median_loops_upload_s"] = round(statistics.median(ups), 2)
    json.dump(rec, open(f"{here}/.perf_hg19.json", "w"))
    print("median recorded:", rec["median_total_s"],
          "plain:", rec.get("plain_median_total_s"))
EOF
publish

export PERF_HAP_BED=/tmp/hap_bed_r4/rep1
if [ -f /tmp/${TAG}_hap_warmup.done ]; then
    log "hap warmup already done — skip"
else
    log "=== 3a. diploid e2e WARMUP at DIV=4 (same program shapes, 1/4 data; untimed) ==="
    PERF_HAP_BED= PERF_HAP_DIV=4 timeout 1800 python scripts/perf_e2e_hap.py
    rc=$?
    log "hap warmup rc=$rc"
    rm -rf /tmp/perf_hap_out_* /tmp/perf_hap_*/
    [ $rc -ne 0 ] && exit 1
    touch /tmp/${TAG}_hap_warmup.done
fi

log "=== 3b. TRUE diploid e2e ON THE CHIP x3 (true median; VERDICT item 3) ==="
for i in 1 2 3; do
    [ -f /tmp/${TAG}_hap_run$i.json ] && { log "hap run $i recorded — skip"; continue; }
    log "--- hap e2e run $i ---"
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
tag = os.environ.get("TAG", "r5")
recs = []
for i in range(1, 4):
    try:
        recs.append(json.load(open(f"/tmp/{tag}_hap_run{i}.json")))
    except Exception:
        pass
ts = [r["total_s"] for r in recs]
print("hap samples:", ts)
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
publish

log "=== 4. host stages x3 each (filtering / allelic; VERDICT item 5) ==="
export PERF_FILT_BED=/tmp/filt_bed_r5
export PERF_ALLELIC_BED=/tmp/allelic_bed_r5
for i in 1 2 3; do
    [ -f /tmp/${TAG}_filt_run$i.json ] && { log "filtering run $i recorded — skip"; continue; }
    log "--- filtering run $i ---"
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1800 \
        python scripts/perf_filtering.py
    rc=$?
    log "filtering run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_filtering.json" /tmp/${TAG}_filt_run$i.json 2>/dev/null
    rm -rf /tmp/perf_filt_out_*
    [ $rc -ne 0 ] && exit 1
done
for i in 1 2 3; do
    [ -f /tmp/${TAG}_allelic_run$i.json ] && { log "allelic run $i recorded — skip"; continue; }
    log "--- allelic run $i ---"
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1800 \
        python scripts/perf_allelic.py
    rc=$?
    log "allelic run$i rc=$rc"
    [ $rc -eq 0 ] && cp "$HERE/.perf_allelic.json" /tmp/${TAG}_allelic_run$i.json 2>/dev/null
    rm -rf /tmp/perf_allelic_out_*
    [ $rc -ne 0 ] && exit 1
done
python - "$HERE" <<'EOF'
import json, os, statistics, sys
here = sys.argv[1]
tag = os.environ.get("TAG", "r5")
f_rates, a_walls = [], []
for i in range(1, 4):
    try:
        f_rates.append(json.load(
            open(f"/tmp/{tag}_filt_run{i}.json"))["rec_per_s"])
    except Exception:
        pass
    try:
        a_walls.append(json.load(
            open(f"/tmp/{tag}_allelic_run{i}.json"))["allelic_s"])
    except Exception:
        pass
print("filtering rec/s samples:", f_rates)
print("allelic wall samples:", a_walls)
if f_rates:
    rec = json.load(open(f"{here}/.perf_filtering.json"))
    rec["sample_rec_per_s"] = f_rates
    rec["median_rec_per_s"] = round(statistics.median(f_rates))
    json.dump(rec, open(f"{here}/.perf_filtering.json", "w"))
if a_walls:
    rec = json.load(open(f"{here}/.perf_allelic.json"))
    rec["sample_allelic_s"] = a_walls
    rec["median_allelic_s"] = round(statistics.median(a_walls), 1)
    json.dump(rec, open(f"{here}/.perf_allelic.json", "w"))
EOF
publish

log "=== 4b. sharded scan-vs-onehot A/B, 8-device CPU mesh (VERDICT item 7) ==="
if [ -f /tmp/${TAG}_scan_ab.done ]; then
    log "scan A/B recorded — skip"
else
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        timeout 3600 python scripts/ab_scan_sharded.py
    rc=$?
    log "scan A/B rc=$rc"
    [ $rc -eq 0 ] && touch /tmp/${TAG}_scan_ab.done
    [ $rc -ne 0 ] && exit 1
fi
publish

log "=== 5. TIMED: bench sanity (median-of-3 primary + recorded extras) ==="
python bench.py
rc=$?
log "bench rc=$rc"
log "ALL DONE"
