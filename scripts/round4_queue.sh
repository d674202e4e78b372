#!/usr/bin/env bash
# Round-4 serialized TPU queue (single-client chip; CLAUDE.md).
# Stages, in order:
#   rntsm   — zoo bench rows for TSM-R50 at its working envelope (VERDICT r3
#             missing #3): T=32 largest fitting batch, and T=64/b2 + block
#             remat if it fits.
#   viz     — real-checkpoint attribution artifact from the viz entry point
#             (VERDICT r3 missing #2).
#   chainD  — anneal fine-tune from chainC's epoch-34 best (68.59% held out):
#             cosine 5e-5 -> 0, EMA, 2x fresh data (datasets_aug holds 20k
#             extra (14,1,64) clips; test shards are symlinks — byte-identical
#             held-out set). The round-3 evidence says MORE constant-lr epochs
#             actively degrade (val 70.6@34 -> ~56 late), so decay + fresh
#             data are the levers (VERDICT r3 next #2a).
#   speed4  — fine-tune on (dist=14, speed=4, T=64) to convert the matrix
#             dip explanation into evidence (VERDICT r3 next #5).
#   evals   — held-out test_perf npz for chainD and speed4.
#   cold    — resume the reference-protocol cold start (lr 3e-4, epoch 11,
#             --auto-resume) for the rest of the round (VERDICT r3 next #2b).
# `touch /tmp/queue_abort` skips unstarted stages; bench.py's pre-flight
# SIGTERMs whatever training stage is live via /tmp/convrun.pid.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}:/root/.axon_site"
export PATHTRACKER_DOT_SIZE=2
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/jax"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
PIDFILE=/tmp/convrun.pid
LOGDIR=/tmp/r4queue
mkdir -p "$LOGDIR"

CHAINC_BEST=results_conv/64_1_14/chainC/saved_models/model_val_acc_0070_epoch_34_checkpoint.pth.tar

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

# --- stage: rntsm bench rows ---
if [ ! -e /tmp/r4_rntsm_done ]; then
    run_stage rntsm_t32 env BENCH_MODEL=rntsm BENCH_T=32 BENCH_BATCH=32 \
        BENCH_REMAT_BLOCKS=1 python bench.py
    run_stage rntsm_t32b64 env BENCH_MODEL=rntsm BENCH_T=32 BENCH_BATCH=64 \
        BENCH_REMAT_BLOCKS=1 python bench.py
    run_stage rntsm_t64b2 env BENCH_MODEL=rntsm BENCH_T=64 BENCH_BATCH=2 \
        BENCH_REMAT_BLOCKS=1 python bench.py
    touch /tmp/r4_rntsm_done
fi

# --- stage: real-checkpoint attribution artifact ---
if [ ! -e /tmp/r4_viz_done ]; then
    run_stage viz python viz_model_att.py --model InT --name chainC_viz \
        --set_name gen_1_14_64 -b 32 --bf16 --ckpt "$CHAINC_BEST" \
        && touch /tmp/r4_viz_done
fi

# --- stage: chainD anneal ---
D=results_conv/64_1_14/chainD
if [ ! -e /tmp/r4_chainD_done ]; then
    run_stage chainD env PATHTRACKER_DATA_ROOT="$PWD/datasets_aug" \
        python mainclean.py --model InT --name chainD \
        --length 64 --speed 1 --dist 14 -b 128 --lr 5e-5 \
        --lr-schedule cosine --epochs 80 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$CHAINC_BEST" || exit 1
    touch /tmp/r4_chainD_done
fi

# --- stage: speed-4 fine-tune ---
S4=results_conv/64_4_14/speed4ft
if [ ! -e /tmp/r4_speed4_done ]; then
    run_stage speed4 python mainclean.py --model InT --name speed4ft \
        --length 64 --speed 4 --dist 14 -b 128 --lr 1e-4 \
        --lr-schedule cosine --epochs 60 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$CHAINC_BEST" || exit 1
    touch /tmp/r4_speed4_done
fi

# --- stage: held-out evals (EVERY best-val checkpoint of each fine-tune:
# the 3-batch 0.5-threshold val meter orders checkpoints loosely — BASELINE —
# so the held-out argmax must see all candidates, not the meter's pick) ---
if [ ! -e /tmp/r4_evals_done ]; then
    for ck in "$D"/saved_models/model_val_acc_*.tar; do
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_chainD_$tag" python test_model.py --model InT \
            --name "chainD_eval_$tag" --dist 14 --speed 1 --length 64 \
            -b 128 --bf16 --ckpt "$ck"
    done
    for ck in "$S4"/saved_models/model_val_acc_*.tar; do
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_speed4_$tag" python test_model.py --model InT \
            --name "speed4_eval_$tag" --dist 14 --speed 4 --length 64 \
            -b 128 --bf16 --ckpt "$ck"
    done
    touch /tmp/r4_evals_done
fi

# --- stage: cold-start resume, rest of the round (flags must match the
# round-3 launch exactly so --auto-resume continues the same trajectory) ---
run_stage coldstart python mainclean.py --model InT --name coldstart \
    --length 64 --speed 1 --dist 14 -b 128 --lr 3e-4 \
    --epochs 2000 --bf16 --device-data --fused-steps 12 \
    --results-dir results_conv --auto-resume

echo "queue: all stages done at $(date)"
