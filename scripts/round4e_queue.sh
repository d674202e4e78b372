#!/usr/bin/env bash
# Round-4e: corrected + extended round-4d queue (post-wipe session).
#
# The 4d script was written while the datasets still existed and passed no
# --synth-train/--synth-test; after the VM wipe its first stage silently
# synthesized a 512-clip shard and trained on that (caught at step 0,
# run+shard deleted). Synthesis is fully seeded (registry.py seeds from
# hash((dist,speed,length))), so resynthesizing at the original
# 20000/2500 sizes reproduces the round-4 shards byte-for-byte and keeps
# every held-out number comparable.
#
# Stages (each self-commits; /tmp/queue_abort stops before the next):
#   1. s4cold   — the decisive speed-4 learnability run: COLD start on the
#                 isolation config (dist=1, speed=4, T=32), lr 3e-4,
#                 150-epoch budget (speed-1 configs hold chance plateaus
#                 past 100 epochs, so 40-epoch warm negatives were moot).
#   2. evals    — held-out test_perf for every s4cold best-val ckpt +
#                 greedy bar on the real 2500-clip shard.
#   3. retries  — the three transient-backend-stall eval casualties
#                 (chainD 68@1, chainC 66@8, 66@12).
#   4. bench    — one quiet-chip bench.py run (VERDICT r3 item 3: the 660
#                 clips/s round-3 number was measured seconds after a
#                 SIGTERM yield; this one has no contention).
#   5. chainE   — the one untried warm-start lever: the reference's own
#                 batch 180 (train_InT.sh:3), cosine 5e-5->0 anneal from
#                 the chainD best-held-out ckpt (68.67%), 2x data root.
#   6. evals    — held-out test_perf for every chainE ckpt.
#   7. coldstart— reference-protocol loop (lr 3e-4, 2000-epoch budget) in
#                 25-epoch committed slices for the rest of the round.
#
# A background CPU job resynthesizes the canonical (14,1,64) root and the
# datasets_aug 2x root while stage 1 holds the chip (host is mostly idle
# under --device-data), so stages 3/5/7 find their data ready.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}:/root/.axon_site"
export PATHTRACKER_DATA_ROOT="$PWD/datasets"
export PATHTRACKER_DOT_SIZE=2
export PATHTRACKER_SYNTH_TRAIN=20000
export PATHTRACKER_SYNTH_TEST=2500
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
D=results_conv/64_1_14/chainD
E=results_conv/64_1_14/chainE
CS=results_conv/64_1_14/coldstart
CHAIND_BEST="$D/saved_models/model_val_acc_0068_epoch_03_checkpoint.pth.tar"

# --- background CPU: resynthesize the canonical + aug (14,1,64) roots ---
if [ ! -e /tmp/r4_roots_done ]; then
    (
        # Wait until stage 1 is past its own synthesis (chip busy, host idle)
        seen=0
        for i in $(seq 1 240); do
            grep -q "Loading finished" "$LOGDIR/s4cold.log" 2>/dev/null \
                && { seen=1; break; }
            sleep 5
        done
        if [ "$seen" = 0 ]; then
            # Never fall through: stage 1's own host-side synthesis may still
            # be running, and two CPU-heavy jobs on this single-core VM
            # serialize each other (both then look hung). No marker => no
            # resynthesis; stage 5 reports the missing r4_roots_done.
            echo "roots: stage-1 'Loading finished' never appeared — NOT" \
                 "starting CPU resynthesis" >"$LOGDIR/roots.log"
            exit 1
        fi
        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nice -n 10 python -c "
from pathtracker_tpu.data.registry import dataset_selector
dataset_selector(dist=14, speed=1, length=64)
print('canonical root ready')" >"$LOGDIR/roots.log" 2>&1
        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu SYNTH_PARTS=1 nice -n 10 \
            python scripts/synth_round4_data.py >>"$LOGDIR/roots.log" 2>&1 \
            && touch /tmp/r4_roots_done
        tail -2 "$LOGDIR/roots.log"
    ) &
fi

# --- stage 1: cold start on the isolation config (dist=1, speed=4, T=32) ---
if [ ! -e /tmp/r4_s4cold_done ] && [ ! -e /tmp/queue_abort ]; then
    run_stage s4cold python mainclean.py --model InT --name speed4cold \
        --length 32 --speed 4 --dist 1 -b 128 --lr 3e-4 \
        --synth-train 20000 --synth-test 2500 \
        --epochs 150 --bf16 --device-data --fused-steps 12 \
        --results-dir results_conv --auto-resume \
        && touch /tmp/r4_s4cold_done
    gcommit "speed-4 cold start on the isolation config (1,4,32): 150-epoch budget at the measured-stable lr (curves + checkpoints)" \
        "$SC"/train.npz "$SC"/val.npz "$SC"/hp_dict.npz \
        "$SC"/saved_models/model_val_acc_*.tar
fi

# --- stage 2: held-out eval of every s4cold checkpoint + real greedy bar ---
if [ ! -e /tmp/r4_evalS4C_done ] && [ -e /tmp/r4_s4cold_done ]; then
    all_ok=1
    for ck in "$SC"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_s4cold_$tag" python test_model.py --model InT \
            --name "s4cold_eval_$tag" --dist 1 --speed 4 --length 32 \
            -b 128 --bf16 --ckpt "$ck" || all_ok=0
    done
    # CPU-side greedy bar: stderr to the log dir (a warning must not pollute
    # the committed number), gated on queue_abort, committed only on rc 0.
    if [ ! -e /tmp/queue_abort ] \
       && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pathtracker_tpu.eval.greedy \
            --glob "$PWD/datasets/pathtracker_32_32_32/1_dist_speed_4/tfrecords/test-*" \
            --n 2500 > results/greedy_1_4_32.txt 2>"$LOGDIR/greedy_1_4_32.err"; then
        gcommit "Held-out test_perf for every speed-4 cold-start checkpoint + greedy bar on the real shard" \
            results/s4cold_eval_*/test_perf_*.npz results/greedy_1_4_32.txt
    else
        rm -f results/greedy_1_4_32.txt
        all_ok=0
        gcommit "Held-out test_perf for every speed-4 cold-start checkpoint" \
            results/s4cold_eval_*/test_perf_*.npz
    fi
    # Done-marker only when every eval AND the greedy bar succeeded — a
    # relaunch after a transient stall must re-enter this stage.
    [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r4_evalS4C_done
fi

# --- stage 3: retry the three transient-backend-stall eval casualties ---
if [ ! -e /tmp/r4_evalretry_done ] && [ -e /tmp/r4_evalS4C_done ]; then
    all_ok=1
    run_stage eval_chainD_0068_epoch_01 python test_model.py --model InT \
        --name chainD_eval_0068_epoch_01 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt "$D/saved_models/model_val_acc_0068_epoch_01_checkpoint.pth.tar" \
        || all_ok=0
    run_stage eval_chainC_0066_epoch_08 python test_model.py --model InT \
        --name chainC_eval_0066_epoch_08 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt "results_conv/64_1_14/chainC/saved_models/model_val_acc_0066_epoch_08_checkpoint.pth.tar" \
        || all_ok=0
    run_stage eval_chainC_0066_epoch_12 python test_model.py --model InT \
        --name chainC_eval_0066_epoch_12 --dist 14 --speed 1 --length 64 \
        -b 128 --bf16 \
        --ckpt "results_conv/64_1_14/chainC/saved_models/model_val_acc_0066_epoch_12_checkpoint.pth.tar" \
        || all_ok=0
    gcommit "Retry the three transient-backend-stall eval casualties (chainD 68@1, chainC 66@8, 66@12)" \
        results/chainD_eval_0068_epoch_01/test_perf_*.npz \
        results/chainC_eval_0066_epoch_08/test_perf_*.npz \
        results/chainC_eval_0066_epoch_12/test_perf_*.npz
    # This stage EXISTS to retry stalls — another stall must not mark it done.
    [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r4_evalretry_done
fi

# --- stage 4: quiet-chip bench (no contention, fresh boot) ---
if [ ! -e /tmp/r4_bench_done ] && [ -e /tmp/r4_evalretry_done ]; then
    run_stage bench_quiet python bench.py \
        && cp "$LOGDIR/bench_quiet.log" results/bench_r4e_quiet.txt \
        && gcommit "Quiet-chip bench (round-4e): no training contention, fresh boot" \
            results/bench_r4e_quiet.txt
    touch /tmp/r4_bench_done
fi

# --- stage 5: chainE — batch-180 anneal from the chainD best (68.67%) ---
if [ ! -e /tmp/r4_chainE_done ] && [ -e /tmp/r4_bench_done ] \
   && [ ! -e /tmp/r4_roots_done ]; then
    # Make a silently-failed background resynthesis visible in the queue log
    # instead of dropping straight into the coldstart loop.
    echo "queue: SKIPPING chainE — /tmp/r4_roots_done missing (background" \
         "aug-root resynthesis failed or never ran; see $LOGDIR/roots.log)"
fi
if [ ! -e /tmp/r4_chainE_done ] && [ -e /tmp/r4_bench_done ] \
   && [ -e /tmp/r4_roots_done ]; then
    run_stage chainE env PATHTRACKER_DATA_ROOT="$PWD/datasets_aug" \
        python mainclean.py --model InT --name chainE \
        --length 64 --speed 1 --dist 14 -b 180 --lr 5e-5 \
        --lr-schedule cosine --epochs 30 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$CHAIND_BEST" \
        && touch /tmp/r4_chainE_done
    gcommit "chainE: the untried batch-180 lever (reference train_InT.sh batch) — cosine anneal from the chainD 68.67% ckpt on the 2x root" \
        "$E"/train.npz "$E"/val.npz "$E"/hp_dict.npz \
        "$E"/saved_models/model_val_acc_*.tar
fi

# --- stage 6: held-out eval of every chainE checkpoint ---
if [ ! -e /tmp/r4_evalE_done ] && [ -e /tmp/r4_chainE_done ]; then
    all_ok=1
    for ck in "$E"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_chainE_$tag" python test_model.py --model InT \
            --name "chainE_eval_$tag" --dist 14 --speed 1 --length 64 \
            -b 128 --bf16 --ckpt "$ck" || all_ok=0
    done
    gcommit "Held-out test_perf for every chainE (batch-180) checkpoint" \
        results/chainE_eval_*/test_perf_*.npz
    [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r4_evalE_done
fi

# --- stage 7: coldstart continuation (reference protocol), rest of round ---
while [ ! -e /tmp/queue_abort ]; do
    done_epochs=$(PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import numpy as np, os
p='$CS/val.npz'
print(len(np.load(p)['balacc']) if os.path.exists(p) else 0)")
    target=$((done_epochs + 25))
    [ "$target" -gt 2000 ] && break
    run_stage "coldstart_$target" python mainclean.py --model InT \
        --name coldstart --length 64 --speed 1 --dist 14 -b 128 --lr 3e-4 \
        --synth-train 20000 --synth-test 2500 \
        --epochs "$target" --bf16 --device-data --fused-steps 12 \
        --results-dir results_conv --auto-resume || break
    gcommit "coldstart (reference protocol, lr 3e-4) through epoch $target" \
        "$CS"/train.npz "$CS"/val.npz "$CS"/hp_dict.npz \
        "$CS"/saved_models/model_last_epoch_checkpoint.pth.tar \
        "$CS"/saved_models/model_val_acc_*.tar
done

echo "queue: round4e done at $(date)"
