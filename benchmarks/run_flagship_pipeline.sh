#!/bin/bash
# Unattended flagship pipeline (round 3): wait for the in-flight 150-epoch
# SGDR leg, then run the constant-eta_min anneal leg to 190, then the
# quality gates at 150/190 (+ a raw-vs-EMA A/B). Everything is strictly
# sequential — the dev chip tolerates only one program/compile at a time.
#
# Designed to be launched DETACHED (setsid) right after train_flagship.py:
#   setsid bash benchmarks/run_flagship_pipeline.sh >/tmp/flagship_pipeline.log 2>&1 &
#
# Robustness: if a training leg dies before writing its final checkpoint,
# it is relaunched resuming from the newest ckpt_epN (up to 3 attempts per
# leg) — the tunneled TPU occasionally drops a long job.
set -u
cd "$(dirname "$0")/.."
OUT=./output/bench_quality
PIDFILE=/tmp/flagship.pid

wait_pid() {  # wait for a non-child pid
    local pid=$1
    while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}

newest_ckpt() {
    ls -d "$OUT"/ckpt_ep* 2>/dev/null | sed 's/.*ckpt_ep//' | sort -n | tail -1
}

run_leg() {  # run_leg <final_epoch_0based> <epochs> [extra flags...]
    local final=$1 epochs=$2; shift 2
    local attempt=0
    while [ ! -d "$OUT/ckpt_ep$final" ] && [ $attempt -lt 3 ]; do
        attempt=$((attempt + 1))
        local resume_flag=()
        local n; n=$(newest_ckpt)
        if [ -n "${n:-}" ]; then resume_flag=(--resume "$OUT/ckpt_ep$n"); fi
        echo "[pipeline $(date -u +%H:%M:%S)] leg to ep$final attempt $attempt ${resume_flag[*]:-fresh}"
        python -u benchmarks/train_flagship.py --epochs "$epochs" \
            --ema-decay 0.9995 "${resume_flag[@]}" "$@"
    done
    [ -d "$OUT/ckpt_ep$final" ]
}

# ---- Leg 1: SGDR 0->150 (already in flight; babysit it) ----
if [ -f "$PIDFILE" ]; then
    echo "[pipeline $(date -u +%H:%M:%S)] waiting on in-flight leg 1 (pid $(cat $PIDFILE))"
    wait_pid "$(cat $PIDFILE)"
fi
run_leg 149 150 || { echo "[pipeline] leg 1 never produced ckpt_ep149; aborting"; exit 1; }

# ---- Leg 2: constant-eta_min anneal 150->190 ----
run_leg 189 190 --lr 3e-5 --lr-schedule none --save-freq 40 \
    || { echo "[pipeline] leg 2 never produced ckpt_ep189; aborting"; exit 1; }

# ---- Quality gates (EMA-sampled; sequential) ----
python -u benchmarks/bench_quality.py --ckpt "$OUT/ckpt_ep149" --label 150
python -u benchmarks/bench_quality.py --ckpt "$OUT/ckpt_ep189" --label 190 --ancestral-n 20
python -u benchmarks/bench_quality.py --ckpt "$OUT/ckpt_ep189" --label 190raw --raw-params
echo "[pipeline $(date -u +%H:%M:%S)] DONE"
