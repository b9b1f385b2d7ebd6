#!/bin/bash
# Round-4 quality experiments (VERDICT r3 #3 + #4), unattended:
#
#   Leg A  — 75-epoch baseline replica of the round-3b recipe (fresh
#            init, SGDR, EMA 0.9995). Epoch 74 was the round-3b optimum
#            (fid_proxy 8.87 DDIM-100 / 7.91 ancestral-20), so ckpt_ep74
#            is both the reproducibility check and the Q1 A/B subject.
#   Gates A — as-written orientation (DDIM-50 w2/w4 x100 + ancestral-20),
#            then the SAME checkpoint with --cfg-fixed-orientation
#            (VERDICT r3 #4: Q1 decided on a converged checkpoint with
#            the calibrated gate, not an eyeball).
#   Leg B  — identical recipe with train.co_flip_mask=True (Q5 fix:
#            mask co-flips with the image) into its own ckpt dir.
#   Gates B — same gate; the A-vs-B delta tests the "dataset-bound
#            plateau" claim (VERDICT r3 #3).
#
# Launch:  DEADLINE=<epoch_s> setsid bash benchmarks/run_round4_quality.sh \
#              >/tmp/round4_quality.log 2>&1 &
# Strictly sequential — one TPU program at a time on this host.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 43200))}
EPOCHS=${EPOCHS:-75}
FINAL=$((EPOCHS - 1))
OUT_A=./output/bench_quality
OUT_B=./output/ab_coflip

remaining() { echo $((DEADLINE - $(date +%s))); }

run_py() {
    local left; left=$(remaining)
    if [ "$left" -le 120 ]; then
        echo "[r4q $(date -u +%H:%M:%S)] deadline reached; skipping: $*"
        return 1
    fi
    timeout --signal=TERM --kill-after=60 "$left" python -u "$@"
}

newest_ckpt() {  # newest_ckpt <dir>
    ls -d "$1"/ckpt_ep* 2>/dev/null | sed 's/.*ckpt_ep//' | sort -n | tail -1
}

run_leg() {  # run_leg <out_dir> [extra train_flagship flags...]
    local out=$1; shift
    local attempt=0
    while [ ! -d "$out/ckpt_ep$FINAL" ] && [ $attempt -lt 3 ]; do
        [ "$(remaining)" -le 120 ] && return 1
        attempt=$((attempt + 1))
        local resume_flag=(--resume /nonexistent)
        local n; n=$(newest_ckpt "$out")
        if [ -n "${n:-}" ]; then resume_flag=(--resume "$out/ckpt_ep$n"); fi
        echo "[r4q $(date -u +%H:%M:%S)] leg $out attempt $attempt ${resume_flag[*]}"
        run_py benchmarks/train_flagship.py --epochs "$EPOCHS" \
            --ema-decay 0.9995 --save-freq 25 --best-min-epochs 1000 \
            --out-dir "$out" "${resume_flag[@]}" "$@"
    done
    [ -d "$out/ckpt_ep$FINAL" ]
}

# ---- Leg A: baseline replica ----
run_leg "$OUT_A" || { echo "[r4q] leg A failed; aborting"; exit 1; }

# ---- Gates A: as-written, then Q1-fixed, on the same checkpoint ----
run_py benchmarks/bench_quality.py --ckpt "$OUT_A/ckpt_ep$FINAL" \
    --label "r4a$EPOCHS" --ancestral-n 20
run_py benchmarks/bench_quality.py --ckpt "$OUT_A/ckpt_ep$FINAL" \
    --label "r4a${EPOCHS}q1fix" --cfg-fixed-orientation --ancestral-n 20

# ---- Leg B: co-flip augmentation A/B ----
if run_leg "$OUT_B" --co-flip-mask; then
    run_py benchmarks/bench_quality.py --ckpt "$OUT_B/ckpt_ep$FINAL" \
        --label "r4b${EPOCHS}coflip" --ancestral-n 20
else
    echo "[r4q] leg B incomplete at deadline"
fi
echo "[r4q $(date -u +%H:%M:%S)] DONE"
