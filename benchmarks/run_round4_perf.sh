#!/bin/bash
# Round-4 perf measurement batch (VERDICT r3 #1/#2/#6/#7), unattended.
# Waits for the quality pipeline (run_round4_quality.sh) to release the
# TPU, then runs strictly sequentially (one TPU program at a time):
#
#   1. bench.py                   — flagship numbers with the fused
#                                   upsample path (also warms the
#                                   compile cache for the driver's run)
#   2. probe_mfu.py --only-new    — round-4 train-step variants
#                                   (selective remat, accum unroll,
#                                   bf16 grad accum, micro-batch 4)
#   3. probe_mfu.py --attr        — fwd/bwd/optimizer attribution at
#                                   the fastest operating point
#   4. bench_kernels.py           — SE/CoordAttn Pallas-vs-XLA re-bench
#                                   with the fixed fetch-sync timing
#   5. bench_ldm.py               — LDM stretch with flash seq-length
#                                   gating (256px regression check)
#
# Launch:  WAIT_PID=<pid> DEADLINE=<epoch_s> setsid \
#            bash benchmarks/run_round4_perf.sh >/tmp/round4_perf.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 43200))}
WAIT_PID=${WAIT_PID:-}

remaining() { echo $((DEADLINE - $(date +%s))); }

if [ -n "$WAIT_PID" ]; then
    echo "[r4p $(date -u +%H:%M:%S)] waiting for pid $WAIT_PID (quality pipeline)"
    while kill -0 "$WAIT_PID" 2>/dev/null; do
        [ "$(remaining)" -le 600 ] && { echo "[r4p] deadline while waiting"; exit 1; }
        sleep 60
    done
    echo "[r4p $(date -u +%H:%M:%S)] pipeline done; TPU free"
fi

run_py() {
    local left; left=$(remaining)
    if [ "$left" -le 120 ]; then
        echo "[r4p $(date -u +%H:%M:%S)] deadline reached; skipping: $*"
        return 1
    fi
    echo "[r4p $(date -u +%H:%M:%S)] RUN: $*"
    timeout --signal=TERM --kill-after=60 "$left" python -u "$@"
    echo "[r4p $(date -u +%H:%M:%S)] rc=$? done: $*"
}

run_py bench.py
run_py benchmarks/probe_mfu.py --only-new
run_py benchmarks/probe_mfu.py --attr
run_py benchmarks/bench_kernels.py
run_py benchmarks/bench_ldm.py
run_py benchmarks/bench_serving.py --ancestral
echo "[r4p $(date -u +%H:%M:%S)] DONE"
