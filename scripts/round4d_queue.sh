#!/usr/bin/env bash
# Round-4d: speed-4 COLD learnability run, then coldstart continuation.
#
# The 40-epoch warm fine-tunes sat at chance on BOTH (14,4,64) and the
# isolation config (1,4,32) — but speed-1 configs are documented to hold
# chance plateaus past 100 clean-label epochs (BASELINE.md), so a 40-epoch
# negative cannot separate "unlearnable" from "budget-limited", and the
# warm start itself may be negative transfer (its first val losses were
# >1.0, i.e. the speed-1 prior is miscalibrated at 4x speed). This gives
# the isolation config a COLD start at the measured-stable lr 3e-4 with a
# 150-epoch budget, evals every best-val ckpt, then returns the chip to
# the coldstart reference protocol for the rest of the round.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}:/root/.axon_site"
export PATHTRACKER_DATA_ROOT="$PWD/datasets"
export PATHTRACKER_DOT_SIZE=2
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/jax"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
PIDFILE=/tmp/convrun.pid
LOGDIR=/tmp/r4bqueue
mkdir -p "$LOGDIR"

run_stage() {
    local tag="$1"; shift
    if [ -e /tmp/queue_abort ]; then
        echo "queue: /tmp/queue_abort present — skipping $tag"; return 1
    fi
    echo "queue: [$tag] $* ($(date +%H:%M:%S))"
    "$@" >"$LOGDIR/$tag.log" 2>&1 &
    local pid=$!
    echo "$pid" > "$PIDFILE"
    wait "$pid"; local rc=$?
    rm -f "$PIDFILE"
    tail -3 "$LOGDIR/$tag.log"
    if grep -q "SIGTERM: finishing step" "$LOGDIR/$tag.log"; then
        echo "queue: $tag yielded the device — not starting further stages"
        touch /tmp/queue_abort
        return 1
    fi
    [ $rc -ne 0 ] && echo "queue: $tag failed rc=$rc (log: $LOGDIR/$tag.log)"
    return $rc
}

gcommit() {
    local msg="$1"; shift
    git add -f "$@" 2>/dev/null || { sleep 3; git add -f "$@"; }
    git commit -m "$msg" >/dev/null 2>&1 \
        || { sleep 3; git commit -m "$msg" >/dev/null 2>&1; } || true
    echo "queue: committed: $msg"
}

SC=results_conv/32_4_1/speed4cold

# --- stage: cold start on the isolation config (dist=1, speed=4, T=32) ---
if [ ! -e /tmp/r4_s4cold_done ] && [ ! -e /tmp/queue_abort ]; then
    run_stage s4cold python mainclean.py --model InT --name speed4cold \
        --length 32 --speed 4 --dist 1 -b 128 --lr 3e-4 \
        --epochs 150 --bf16 --device-data --fused-steps 12 \
        --results-dir results_conv --auto-resume \
        && touch /tmp/r4_s4cold_done
    gcommit "speed-4 cold start on the isolation config (1,4,32): 150-epoch budget at the measured-stable lr (curves + checkpoints)" \
        "$SC"/train.npz "$SC"/val.npz "$SC"/hp_dict.npz \
        "$SC"/saved_models/model_val_acc_*.tar
fi

if [ ! -e /tmp/r4_evalS4C_done ] && [ -e /tmp/r4_s4cold_done ]; then
    for ck in "$SC"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_s4cold_$tag" python test_model.py --model InT \
            --name "s4cold_eval_$tag" --dist 1 --speed 4 --length 32 \
            -b 128 --bf16 --ckpt "$ck"
    done
    gcommit "Held-out test_perf for every speed-4 cold-start checkpoint" \
        results/s4cold_eval_*/test_perf_*.npz
    touch /tmp/r4_evalS4C_done
fi

# --- stage: coldstart continuation (reference protocol), rest of round ---
CS=results_conv/64_1_14/coldstart
while [ ! -e /tmp/queue_abort ]; do
    done_epochs=$(PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import numpy as np, os
p='$CS/val.npz'
print(len(np.load(p)['balacc']) if os.path.exists(p) else 0)")
    target=$((done_epochs + 25))
    [ "$target" -gt 2000 ] && break
    run_stage "coldstart_$target" python mainclean.py --model InT \
        --name coldstart --length 64 --speed 1 --dist 14 -b 128 --lr 3e-4 \
        --epochs "$target" --bf16 --device-data --fused-steps 12 \
        --results-dir results_conv --auto-resume || break
    gcommit "coldstart (reference protocol, lr 3e-4) through epoch $target" \
        "$CS"/train.npz "$CS"/val.npz "$CS"/hp_dict.npz \
        "$CS"/saved_models/model_last_epoch_checkpoint.pth.tar
done

echo "queue: round4d done at $(date)"
