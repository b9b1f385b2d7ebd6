#!/bin/bash
# Round-5 follow-up batch: starts when run_round5_perf.sh's bash PID
# exits (strictly one TPU program at a time on this host), then runs the
# remaining round-5 items in value order, deadline-aware, with the same
# manifest discipline (VERDICT r4 #7):
#   1. wsweep   — guide-scale sweep (DDIM-50, n=100/scale) on the
#                 co-flip leg-B checkpoint: the cheapest remaining lever
#                 for fid_proxy < 7.9 (VERDICT r4 #3; w2/w4 measured
#                 8.10/8.07, the optimum may sit elsewhere on the axis).
#   2. conv_b1  — isolated conv ceiling at batch 1 (the train-forward
#                 regime; closes the RESULTS.md round-5 ceiling citation).
#   3. ema9999  — EMA-decay sweep leg (VERDICT r4 #3): fresh 75-epoch
#                 flagship run identical to leg B except
#                 --ema-decay 0.9999 (leg B: 0.9995); compile-cache hit
#                 (same program), ~8930 s. Trains until
#                 DEADLINE-GATE_BUDGET, then gates the NEWEST checkpoint
#                 (save-freq 25) so a partial leg still yields a point.
#
# Launch: DEADLINE=<epoch_s> WAIT_PID=<pid> setsid \
#             bash benchmarks/run_round5_followup.sh \
#             >/tmp/round5_followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 25200))}
WAIT_PID=${WAIT_PID:-}
GATE_BUDGET=1500
OUT_E=./output/ab_ema9999
MANIFEST=benchmarks/ROUND5_FOLLOWUP_MANIFEST.json
echo '{}' > "$MANIFEST"

remaining() { echo $((DEADLINE - $(date +%s))); }

record() {
    python3 - "$1" "$2" <<'EOF'
import json, sys
p = "benchmarks/ROUND5_FOLLOWUP_MANIFEST.json"
d = json.load(open(p))
d[sys.argv[1]] = sys.argv[2]
json.dump(d, open(p, "w"), indent=1)
EOF
}

run_stage() {  # run_stage <name> <budget_s> <cmd...>
    local name=$1 budget=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 120 ]; then
        echo "[r5f $(date -u +%H:%M:%S)] DEADLINE; skip: $name"
        record "$name" "skipped_deadline"
        return 1
    fi
    [ "$budget" -gt "$left" ] && budget=$left
    echo "[r5f $(date -u +%H:%M:%S)] RUN ($budget s budget): $name: $*"
    timeout --signal=TERM --kill-after=60 "$budget" python -u "$@"
    local rc=$?
    echo "[r5f $(date -u +%H:%M:%S)] rc=$rc done: $name"
    record "$name" "rc=$rc"
    return $rc
}

# ---- wait for the main perf batch to release the TPU ----
if [ -n "$WAIT_PID" ]; then
    echo "[r5f $(date -u +%H:%M:%S)] waiting for PID $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do
        [ "$(remaining)" -le 120 ] && { echo "[r5f] deadline while waiting"; exit 1; }
        sleep 30
    done
fi
echo "[r5f $(date -u +%H:%M:%S)] TPU free; starting"

run_stage wsweep 2700 benchmarks/bench_quality.py \
    --ckpt ./output/ab_coflip/ckpt_ep74 --label r5b75wsweep \
    --scales 3.0 5.0 6.0 --ancestral-n 0
# re-run at B=40 with the FIXED analytic FLOPs accounting (the first run
# divided cost_analysis by the chain length, but XLA counts a scan body
# once — 50x under-report); programs are compile-cached, so this is fast
run_stage conv_b40 1200 benchmarks/bench_conv_ceiling.py --batch 40 \
    --out benchmarks/CONV_CEILING.json
run_stage conv_b1 1800 benchmarks/bench_conv_ceiling.py --batch 1 \
    --out benchmarks/CONV_CEILING_B1.json
# the main batch's deadline usually lands before its last stages; pick
# them up here (VERDICT r4 #1/#6). ldm_train --resume skips training
# when the native ckpt exists and re-runs only the sample+gate leg.
if [ ! -f benchmarks/LDM_TRAIN.json ] && [ -f ./output/ldm_native_mid.pkl ]; then
    run_stage ldm_train_gate 2400 benchmarks/bench_ldm_train.py --resume
fi
if ! grep -q '"ldm_infer": "rc=0"' benchmarks/ROUND5_MANIFEST.json; then
    run_stage ldm_infer 2400 benchmarks/bench_ldm.py
fi

# ---- EMA 0.9999 leg: train until DEADLINE-GATE_BUDGET ----
train_left=$(( $(remaining) - GATE_BUDGET ))
if [ "$train_left" -gt 1200 ]; then
    echo "[r5f $(date -u +%H:%M:%S)] ema9999 train budget: ${train_left}s"
    timeout --signal=TERM --kill-after=120 "$train_left" \
        python -u benchmarks/train_flagship.py --epochs 75 \
        --ema-decay 0.9999 --save-freq 15 --best-min-epochs 1000 \
        --out-dir "$OUT_E" --resume /nonexistent --co-flip-mask
    record train_ema9999 "rc=$?"
    newest=$(ls -d "$OUT_E"/ckpt_ep* 2>/dev/null | sed 's/.*ckpt_ep//' | sort -n | tail -1)
    if [ -n "${newest:-}" ]; then
        run_stage gate_ema9999 "$GATE_BUDGET" benchmarks/bench_quality.py \
            --ckpt "$OUT_E/ckpt_ep$newest" --label "r5e${newest}ema9999" \
            --scales 4.0 --ancestral-n 0
    else
        record gate_ema9999 "no_ckpt"
    fi
else
    record train_ema9999 "skipped_deadline"
fi
echo "[r5f $(date -u +%H:%M:%S)] BATCH DONE; manifest:"
cat "$MANIFEST"
