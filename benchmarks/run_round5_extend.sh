#!/bin/bash
# Round-5 batch 3: extend the co-flip leg B from ep74 deep into the
# SGDR 70->150 anneal (cycles are absolute: 10/30/70/150), gating at
# ~ep119 — the LR regime (~5e-5) where the destroyed round-3 run hit
# its never-reproduced best (fid_proxy 6.98/6.70 @ep120, RESULTS.md
# "run of record" section). The round-3b reproduction WITHOUT co-flip
# regressed past 75 (100/125 gates: 10.7/10.8); whether co-flip
# training keeps improving past 75 is the open question this leg
# answers either way.
#
# Launch: DEADLINE=<epoch_s> WAIT_PID=<followup_pid> setsid \
#             bash benchmarks/run_round5_extend.sh \
#             >/tmp/round5_extend.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 18000))}
WAIT_PID=${WAIT_PID:-}
GATE_BUDGET=1800
OUT_B=./output/ab_coflip
MANIFEST=benchmarks/ROUND5_EXTEND_MANIFEST.json
echo '{}' > "$MANIFEST"

remaining() { echo $((DEADLINE - $(date +%s))); }

record() {
    python3 - "$1" "$2" <<'EOF'
import json, sys
p = "benchmarks/ROUND5_EXTEND_MANIFEST.json"
d = json.load(open(p))
d[sys.argv[1]] = sys.argv[2]
json.dump(d, open(p, "w"), indent=1)
EOF
}

if [ -n "$WAIT_PID" ]; then
    echo "[r5x $(date -u +%H:%M:%S)] waiting for PID $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do
        [ "$(remaining)" -le 120 ] && { echo "[r5x] deadline while waiting"; exit 1; }
        sleep 30
    done
fi
echo "[r5x $(date -u +%H:%M:%S)] TPU free; starting"

train_left=$(( $(remaining) - GATE_BUDGET ))
if [ "$train_left" -le 1200 ]; then
    record extendB "skipped_deadline"; exit 1
fi
echo "[r5x $(date -u +%H:%M:%S)] extend train budget: ${train_left}s"
timeout --signal=TERM --kill-after=120 "$train_left" \
    python -u benchmarks/train_flagship.py --epochs 120 \
    --resume "$OUT_B/ckpt_ep74" --ema-decay 0.9995 --save-freq 15 \
    --best-min-epochs 1000 --out-dir "$OUT_B" --co-flip-mask
record extendB "rc=$?"
newest=$(ls -d "$OUT_B"/ckpt_ep* 2>/dev/null | sed 's/.*ckpt_ep//' | sort -n | tail -1)
if [ "${newest:-74}" -gt 74 ]; then
    echo "[r5x $(date -u +%H:%M:%S)] gating ckpt_ep$newest"
    timeout --signal=TERM --kill-after=60 "$(remaining)" \
        python -u benchmarks/bench_quality.py \
        --ckpt "$OUT_B/ckpt_ep$newest" --label "r5b${newest}coflipext" \
        --scales 2.0 4.0 --ancestral-n 0
    record gate_extendB "rc=$?"
else
    record gate_extendB "no_new_ckpt"
fi
echo "[r5x $(date -u +%H:%M:%S)] BATCH DONE; manifest:"
cat "$MANIFEST"
