#!/bin/bash
# Round-5 perf measurement batch (VERDICT r4 #1/#2/#4/#5/#6/#9),
# unattended and deadline-ROBUST (VERDICT r4 #7: round 4 ran
# cheapest-first against one global deadline and silently dropped its
# four most valuable stages). Fixes applied here:
#   - stages are ordered by VALUE, not cost;
#   - every stage has its OWN timeout budget (a hung stage cannot eat
#     the batch);
#   - every stage's outcome (ok / rc / skipped-at-deadline) is recorded
#     in benchmarks/ROUND5_MANIFEST.json so a skipped measurement can
#     never be silently absent from the round report.
#
# Launch:  DEADLINE=<epoch_s> setsid bash benchmarks/run_round5_perf.sh \
#              >/tmp/round5_perf.log 2>&1 &
# Strictly sequential — one TPU program at a time on this host.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(($(date +%s) + 43200))}
MANIFEST=benchmarks/ROUND5_MANIFEST.json
echo '{}' > "$MANIFEST"

remaining() { echo $((DEADLINE - $(date +%s))); }

record() {  # record <stage> <status>
    python3 - "$1" "$2" <<'EOF'
import json, sys
p = "benchmarks/ROUND5_MANIFEST.json"
d = json.load(open(p))
d[sys.argv[1]] = sys.argv[2]
json.dump(d, open(p, "w"), indent=1)
EOF
}

run_stage() {  # run_stage <name> <budget_s> <cmd...>
    local name=$1 budget=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 120 ]; then
        echo "[r5p $(date -u +%H:%M:%S)] DEADLINE; skip: $name"
        record "$name" "skipped_deadline"
        return 1
    fi
    [ "$budget" -gt "$left" ] && budget=$left
    echo "[r5p $(date -u +%H:%M:%S)] RUN ($budget s budget): $name: $*"
    timeout --signal=TERM --kill-after=60 "$budget" python -u "$@"
    local rc=$?
    echo "[r5p $(date -u +%H:%M:%S)] rc=$rc done: $name"
    record "$name" "rc=$rc"
    return $rc
}

# Value order (VERDICT r4 "Next round" #1 first): attribution + the
# composed operating point, then parity evidence, then the headline
# bench, then serving/kernels/roofline, then the LDM legs.
run_stage probe_fused_variants 3000 benchmarks/probe_mfu.py --names mb1r0f,mb1r0fg
run_stage probe_attr_composed 2400 benchmarks/probe_mfu.py --attr --attr-variant mb1r0fg
run_stage accum_parity 1800 benchmarks/probe_accum_parity.py --steps 40
run_stage probe_convremat 3000 benchmarks/probe_mfu.py --names mb2r1c,mb2r1cfg,mb4r1cfg
run_stage bench_main 3600 bench.py
run_stage serving_ancestral 3000 benchmarks/bench_serving.py --ancestral
run_stage conv_ceiling 1500 benchmarks/bench_conv_ceiling.py
run_stage kernels_rebench 1800 benchmarks/bench_kernels.py
run_stage probe_mb4r1 1500 benchmarks/probe_mfu.py --names mb4r1
run_stage ldm_train 7200 benchmarks/bench_ldm_train.py
run_stage ldm_infer 2400 benchmarks/bench_ldm.py
echo "[r5p $(date -u +%H:%M:%S)] BATCH DONE; manifest:"
cat "$MANIFEST"
