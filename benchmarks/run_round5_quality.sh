#!/bin/bash
# Round-5 quality leg (VERDICT r4 #3): the co-flip A/B's Leg B, which
# round 4 defined but never trained (deadline). The host wipe between
# rounds removed ALL checkpoints, so Leg B trains fresh with the SAME
# recipe/seed as the round-4 Leg A run of record (75 epochs, SGDR, EMA
# 0.9995, fresh init) — its gate (label r5b75coflip) compares against
# QUALITY.json gates r4a75/75* from that leg. The only intended delta is
# train.co_flip_mask=True (Q5: the reference flips the image only,
# new_scripy.py:683-688).
#
# Launch:  DEADLINE=<epoch_s> setsid bash benchmarks/run_round5_quality.sh \
#              >/tmp/round5_quality.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 43200))}
EPOCHS=${EPOCHS:-75}
FINAL=$((EPOCHS - 1))
OUT_B=./output/ab_coflip
MANIFEST=benchmarks/ROUND5_QUALITY_MANIFEST.json
echo '{}' > "$MANIFEST"

remaining() { echo $((DEADLINE - $(date +%s))); }

record() {
    python3 - "$1" "$2" <<'EOF'
import json, sys
p = "benchmarks/ROUND5_QUALITY_MANIFEST.json"
d = json.load(open(p))
d[sys.argv[1]] = sys.argv[2]
json.dump(d, open(p, "w"), indent=1)
EOF
}

run_py() {
    local left; left=$(remaining)
    if [ "$left" -le 120 ]; then
        echo "[r5q $(date -u +%H:%M:%S)] deadline reached; skipping: $*"
        return 1
    fi
    timeout --signal=TERM --kill-after=60 "$left" python -u "$@"
}

newest_ckpt() {
    ls -d "$1"/ckpt_ep* 2>/dev/null | sed 's/.*ckpt_ep//' | sort -n | tail -1
}

# ---- Leg B: co-flip, auto-resuming from the newest checkpoint ----
attempt=0
while [ ! -d "$OUT_B/ckpt_ep$FINAL" ] && [ $attempt -lt 3 ]; do
    [ "$(remaining)" -le 120 ] && break
    attempt=$((attempt + 1))
    resume_flag=(--resume /nonexistent)
    n=$(newest_ckpt "$OUT_B")
    if [ -n "${n:-}" ]; then resume_flag=(--resume "$OUT_B/ckpt_ep$n"); fi
    echo "[r5q $(date -u +%H:%M:%S)] leg B attempt $attempt ${resume_flag[*]}"
    run_py benchmarks/train_flagship.py --epochs "$EPOCHS" \
        --ema-decay 0.9995 --save-freq 25 --best-min-epochs 1000 \
        --out-dir "$OUT_B" "${resume_flag[@]}" --co-flip-mask
done
if [ -d "$OUT_B/ckpt_ep$FINAL" ]; then
    record train_legB "done"
else
    record train_legB "INCOMPLETE"
    echo "[r5q] leg B incomplete; aborting"; exit 1
fi

# ---- Gate B: same gate battery as r4a75 ----
run_py benchmarks/bench_quality.py --ckpt "$OUT_B/ckpt_ep$FINAL" \
    --label "r5b${EPOCHS}coflip" --ancestral-n 20
record gate_legB "rc=$?"
echo "[r5q $(date -u +%H:%M:%S)] DONE"
cat "$MANIFEST"
