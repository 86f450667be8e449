#!/bin/bash
# One-command reproduction of every BENCH extra from a clean checkout on
# the bench host (VERDICT r4 item 9).  Runs the full round-5 measurement
# campaign under a FRESH marker namespace (so nothing is skipped as
# already-done), then prints the final bench JSON line.
#
#   bash scripts/repro_bench.sh
#
# Expects: one TPU chip visible to jax (the e2e / full-suite / probe
# stages run on it; host stages and the 8-device-mesh A/B run on the CPU
# backend regardless).  Input beds are generated on first use into the
# campaign's fixed /tmp dirs (~20 min of untimed setup) and reused by
# later samples.  Total wall time is a few hours: 3x e2e (~6-10 min
# each), 9x full-suite (~1-2 min each), 1+3x diploid e2e (~10-20 min
# each), 6x host-stage runs, the sharded A/B, and the bench itself.
set -eu
cd "$(dirname "$0")/.."
export TAG="repro_$(date +%Y%m%d_%H%M%S)"
echo "repro namespace: $TAG (records in /tmp/${TAG}_*)"
bash scripts/tpu_campaign_r5.sh
