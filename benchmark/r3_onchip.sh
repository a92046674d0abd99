#!/bin/bash
# Round-3 on-chip measurement batch (run on the TPU host / axon relay).
# Each step appends to /tmp/r3_onchip.log; order = value priority so a
# flaky relay still lands the important numbers first.
set -x
LOG=${1:-/tmp/r3_onchip.log}
cd "$(dirname "$0")/.."

run() { echo "=== $* === $(date)" >> "$LOG"; timeout 1500 "$@" >> "$LOG" 2>&1; echo "exit=$?" >> "$LOG"; }

# 1. Headline bench (skip-pool + head-bwd levers landed this round)
run python bench.py
# 2. On-chip exactness incl. the new C=128 decoder chain config
run python benchmark/tpu_exactness_check.py
# 3. bf16-logit A/B on the fused arm
run python benchmark/step_compare.py --only fused
run python benchmark/step_compare.py --only fused --logit-bf16
# 4. C=128 fused decoder win on an sf=64 workload
run python benchmark/step_compare.py --sf 64 --blocks 3
# 5. f32 forced-fused vs XLA (VERDICT 3a measured proof; small patch —
#    f32 working sets at headline patch exceed calibrated VMEM bounds)
run python benchmark/step_compare.py --f32 --patch 22 44 44
# 6. Fresh per-op profile of the headline step
run python benchmark/profile_step.py
