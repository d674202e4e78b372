#!/usr/bin/env bash
# Round-4b post-wipe recovery queue (single-client chip; CLAUDE.md).
#
# A VM reset at 01:49 destroyed every checkpoint and all synthesized
# datasets (both gitignored), including the chainC epoch-34 best the whole
# round-4 plan warm-starts from — the second wipe to cost a headline
# checkpoint. This queue rebuilds everything AND commits the small
# canonical checkpoints to git after each stage (git add -f overrides the
# *.tar ignore), so a wipe can never again reset the accuracy campaign.
#
# Stage order (value-first, each stage durable before the next starts):
#   rntsm  — zoo throughput rows at the MEASURED envelope (T=32 b<=4,
#            T=64 b=1 per the round-4 compile-report sweep; the first
#            queue attempt OOMed on stale pre-sweep batch sizes).
#   chain  — rebuild A->B->C via reproduce_canonical.sh (auto-resume,
#            synthesizes its datasets on first touch); commit best ckpts.
#   evalC  — held-out test_perf for EVERY chainC best-val ckpt (the
#            3-batch 0.5-threshold val meter orders ckpts loosely).
#   aug    — 20k extra (14,1,64) train clips -> datasets_aug (CPU only).
#   chainD — anneal from chainC best: cosine 5e-5 -> 0, EMA, 2x data.
#   evalD  — held-out test_perf for every chainD ckpt.
#   speed4 — fine-tune on (14,4,64) (synthesizes on first touch) + evals.
#   cold   — reference-protocol cold start (lr 3e-4) for the rest of the
#            round; recommits its curves+rolling ckpt every 25 epochs.
# `touch /tmp/queue_abort` skips unstarted stages; bench.py's pre-flight
# SIGTERMs the live stage via /tmp/convrun.pid and the queue then stops.
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

run_stage() { # run_stage <tag> <cmd...>
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
    if [ $rc -ne 0 ]; then
        echo "queue: $tag failed rc=$rc (log: $LOGDIR/$tag.log)"
    fi
    return $rc
}

gcommit() { # gcommit <msg> <paths...>  (retry once on index-lock contention)
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

commit_run() { # commit_run <run_dir> <msg> — curves + every best-val ckpt
    gcommit "$2" "$1"/train.npz "$1"/val.npz "$1"/hp_dict.npz \
        "$1"/saved_models/model_val_acc_*.tar
}

A=results_conv/8_1_1/chainA
B=results_conv/32_1_5/chainB
C=results_conv/64_1_14/chainC
D=results_conv/64_1_14/chainD
S4=results_conv/64_4_14/speed4ft

# --- stage: rntsm throughput rows at the measured envelope ---
if [ ! -e /tmp/r4_rntsm_done ]; then
    : > results/rntsm_rows_r4.txt
    for cfg in "32 4" "32 2" "64 1"; do
        set -- $cfg
        run_stage "rntsm_t$1b$2" env BENCH_MODEL=rntsm BENCH_T="$1" \
            BENCH_BATCH="$2" BENCH_REMAT_BLOCKS=1 python bench.py \
          && { tail -1 "$LOGDIR/rntsm_t$1b$2.log" >> results/rntsm_rows_r4.txt; }
    done
    if [ -s results/rntsm_rows_r4.txt ]; then
        gcommit "rntsm zoo throughput rows at the block-remat envelope (raw bench JSON)" \
            results/rntsm_rows_r4.txt
        touch /tmp/r4_rntsm_done
    fi
fi

# --- stage: rebuild the canonical chain (ckpts + datasets were wiped) ---
if [ ! -e /tmp/r4_chain_done ] && [ ! -e /tmp/queue_abort ]; then
    EPOCHS_C=48 bash scripts/reproduce_canonical.sh \
        && touch /tmp/r4_chain_done
    commit_run "$A" "Recovery: chainA rebuilt post-wipe; commit best-val checkpoints so wipes cannot reset the campaign"
    commit_run "$B" "Recovery: chainB rebuilt post-wipe (curves + best-val checkpoints)"
    commit_run "$C" "Recovery: chainC rebuilt post-wipe (curves + best-val checkpoints)"
fi

# --- stage: held-out eval of EVERY chainC best-val checkpoint ---
if [ ! -e /tmp/r4_evalC_done ] && [ -e /tmp/r4_chain_done ]; then
    for ck in "$C"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_chainC_$tag" python test_model.py --model InT \
            --name "chainC_eval_$tag" --dist 14 --speed 1 --length 64 \
            -b 128 --bf16 --ckpt "$ck"
    done
    gcommit "Held-out test_perf for every rebuilt-chainC best-val checkpoint" \
        results/chainC_eval_*/test_perf_*.npz
    touch /tmp/r4_evalC_done
fi

# --- stage: augmented data root (CPU only; chip idle) ---
if [ ! -e /tmp/r4_aug_done ] && [ ! -e /tmp/queue_abort ]; then
    run_stage aug env SYNTH_PARTS=1 python scripts/synth_round4_data.py \
        && touch /tmp/r4_aug_done
fi

# --- stage: chainD anneal (cosine 5e-5 -> 0, EMA, 2x fresh data) ---
if [ ! -e /tmp/r4_chainD_done ] && [ -e /tmp/r4_chain_done ] \
   && [ -e /tmp/r4_aug_done ]; then
    run_stage chainD env PATHTRACKER_DATA_ROOT="$PWD/datasets_aug" \
        python mainclean.py --model InT --name chainD \
        --length 64 --speed 1 --dist 14 -b 128 --lr 5e-5 \
        --lr-schedule cosine --epochs 40 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$(best_ckpt "$C")" \
        && touch /tmp/r4_chainD_done
    commit_run "$D" "chainD anneal rerun from the rebuilt chainC best (curves + checkpoints)"
fi

# --- stage: held-out eval of every chainD checkpoint ---
if [ ! -e /tmp/r4_evalD_done ] && [ -e /tmp/r4_chainD_done ]; then
    for ck in "$D"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_chainD_$tag" python test_model.py --model InT \
            --name "chainD_eval_$tag" --dist 14 --speed 1 --length 64 \
            -b 128 --bf16 --ckpt "$ck"
    done
    gcommit "Held-out test_perf for every chainD-anneal checkpoint" \
        results/chainD_eval_*/test_perf_*.npz
    touch /tmp/r4_evalD_done
fi

# --- stage: speed-4 fine-tune (synthesizes its 20k/2.5k shards on touch) ---
if [ ! -e /tmp/r4_speed4_done ] && [ -e /tmp/r4_chain_done ]; then
    run_stage speed4 python mainclean.py --model InT --name speed4ft \
        --length 64 --speed 4 --dist 14 -b 128 --lr 1e-4 \
        --lr-schedule cosine --epochs 40 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --synth-train 20000 --synth-test 2500 \
        --results-dir results_conv --auto-resume \
        --ckpt "$(best_ckpt "$C")" \
        && touch /tmp/r4_speed4_done
    commit_run "$S4" "speed-4 fine-tune from chainC best: does the model class learn 4x motion on-config? (curves + checkpoints)"
fi

if [ ! -e /tmp/r4_evalS4_done ] && [ -e /tmp/r4_speed4_done ]; then
    for ck in "$S4"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_speed4_$tag" python test_model.py --model InT \
            --name "speed4_eval_$tag" --dist 14 --speed 4 --length 64 \
            -b 128 --bf16 --ckpt "$ck"
    done
    gcommit "Held-out test_perf for every speed-4 fine-tune checkpoint" \
        results/speed4_eval_*/test_perf_*.npz
    touch /tmp/r4_evalS4_done
fi

# --- stage: cold start (reference protocol), rest of the round ---
# The wipe also destroyed the coldstart rolling checkpoint, so this restarts
# from epoch 0; run in 25-epoch slices so curves + the rolling ckpt land in
# git continuously (VERDICT r3 next #2b: "commit its curves every session").
CS=results_conv/64_1_14/coldstart
rm -rf "$CS"   # epoch-0 restart: stale npz would mislead --auto-resume logs
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
    gcommit "coldstart (reference protocol, lr 3e-4) through epoch $target post-wipe restart" \
        "$CS"/train.npz "$CS"/val.npz "$CS"/hp_dict.npz \
        "$CS"/saved_models/model_last_epoch_checkpoint.pth.tar
done

echo "queue: all stages done at $(date)"
