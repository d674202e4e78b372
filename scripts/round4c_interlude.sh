#!/usr/bin/env bash
# Round-4c interlude: speed-4 learnability experiment + coldstart continuation.
#
# The on-config (14,4,64) fine-tune sat at chance for 40 epochs — but so
# does the greedy bar there (50.5%), so that result cannot distinguish
# "task is unlearnable at 4x speed with 14 distractors" from "framework
# cannot learn fast motion". This isolates the question on (1,4,32),
# where greedy reads 70.3% (probe, n=1000): a model beating that bar
# demonstrates the framework learns 4x motion where association is
# resolvable. Then the coldstart reference-protocol loop resumes exactly
# as scripts/round4b_queue.sh ran it (25-epoch committed slices).
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

best_ckpt() {
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from pathtracker_tpu.train.checkpoint import find_best_checkpoint
print(find_best_checkpoint('$1'))"
}

B=results_conv/32_1_5/chainB
SE=results_conv/32_4_1/speed4easy

# --- stage: speed-4-easy fine-tune from chainB (dist=1, speed=4, T=32) ---
if [ ! -e /tmp/r4_s4easy_done ] && [ ! -e /tmp/queue_abort ]; then
    run_stage s4easy python mainclean.py --model InT --name speed4easy \
        --length 32 --speed 4 --dist 1 -b 128 --lr 1e-4 \
        --lr-schedule cosine --epochs 40 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$(best_ckpt "$B")" \
        && touch /tmp/r4_s4easy_done
    gcommit "speed-4-easy fine-tune (dist=1,T=32) from chainB: isolate fast-motion learnability from association ambiguity" \
        "$SE"/train.npz "$SE"/val.npz "$SE"/hp_dict.npz \
        "$SE"/saved_models/model_val_acc_*.tar
fi

# --- stage: held-out eval of every speed4easy checkpoint ---
if [ ! -e /tmp/r4_evalS4E_done ] && [ -e /tmp/r4_s4easy_done ]; then
    for ck in "$SE"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_s4easy_$tag" python test_model.py --model InT \
            --name "s4easy_eval_$tag" --dist 1 --speed 4 --length 32 \
            -b 128 --bf16 --ckpt "$ck"
    done
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pathtracker_tpu.eval.greedy \
        --glob "$PWD/datasets/pathtracker_32_32_32/1_dist_speed_4/tfrecords/test-*" \
        --n 2500 > results/greedy_1_4_32.txt 2>&1
    gcommit "Held-out test_perf for every speed-4-easy checkpoint + greedy bar on the real shard" \
        results/s4easy_eval_*/test_perf_*.npz results/greedy_1_4_32.txt
    touch /tmp/r4_evalS4E_done
fi

# --- stage: retry the three transient-backend-stall eval casualties ---
if [ ! -e /tmp/r4_evalretry_done ] && [ ! -e /tmp/queue_abort ]; then
    run_stage eval_chainD_0068_epoch_01 python test_model.py --model InT \
        --name chainD_eval_0068_epoch_01 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt results_conv/64_1_14/chainD/saved_models/model_val_acc_0068_epoch_01_checkpoint.pth.tar
    run_stage eval_chainC_0066_epoch_08 python test_model.py --model InT \
        --name chainC_eval_0066_epoch_08 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt results_conv/64_1_14/chainC/saved_models/model_val_acc_0066_epoch_08_checkpoint.pth.tar
    run_stage eval_chainC_0066_epoch_12 python test_model.py --model InT \
        --name chainC_eval_0066_epoch_12 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt results_conv/64_1_14/chainC/saved_models/model_val_acc_0066_epoch_12_checkpoint.pth.tar
    gcommit "Retry the three transient-backend-stall eval casualties (chainD e01, chainC e08/e12)" \
        results/chainD_eval_0068_epoch_01/test_perf_*.npz \
        results/chainC_eval_0066_epoch_08/test_perf_*.npz \
        results/chainC_eval_0066_epoch_12/test_perf_*.npz
    touch /tmp/r4_evalretry_done
fi

# --- stage: coldstart continuation (reference protocol), rest of the round ---
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

echo "queue: round4c interlude done at $(date)"
