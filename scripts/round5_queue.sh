#!/usr/bin/env bash
# Round-5 queue: takes the chip over from round4e_queue.sh (stage-7 coldstart
# loop) after /tmp/queue_abort drains it, and runs the round-5 program:
#
#   1. chainE   — re-run of the batch-180 lever that OOMed in round 4e:
#                 the aug (2x, 40k-clip) root is 7.9 GB device-resident and
#                 does not fit HBM next to batch-180 activations, so this
#                 run uses the canonical 20k root (still device-resident).
#                 Even so, a monolithic batch 180 OOMs on its own: the
#                 scan-saved activations (f32[64,180,32,32,32] + remat
#                 peers) reach 13.5 GB HLO temp next to the 3.9 GB resident
#                 shard. The reference's effective batch is reproduced as
#                 2 x 90 gradient accumulation (optax.MultiSteps): identical
#                 averaged-gradient trajectory at half the activation
#                 footprint; the one semantic delta is BN batch stats over
#                 90 instead of 180 clips (noted in BASELINE.md).
#                 Cosine 5e-5 -> 0 anneal from the chainD best-held-out ckpt
#                 (68.67%), reference batch (train_InT.sh:3 `-b 180`).
#   2. evals    — held-out test_perf for every chainE best-val checkpoint.
#                 rc-accumulated: the done-marker is only touched when every
#                 eval succeeded (fixes the round-4e advisor-medium pattern).
#   3. interleaved continuation loop, 2:1 coldstart:s4cold —
#                 coldstart (reference protocol: lr 3e-4, 2000-epoch budget)
#                 in 25-epoch committed slices, and the speed-4 cold run
#                 continued from its epoch-149 rolling checkpoint toward the
#                 500-epoch budget BASELINE.md promises. Both runs commit
#                 train/val npz + the rolling last-epoch checkpoint each
#                 slice (wipe-proofing). A slice that advances zero epochs
#                 breaks the loop (advisor-high guard).
#   4. s4cold evals — once s4cold reaches 500 epochs, held-out test_perf for
#                 any new best-val checkpoints the continuation produced.
#
# Epoch accounting reads len(val.npz['balacc']); train/loop.py preloads the
# prior npz on --auto-resume (commit 92c4e25), so the count is cumulative
# across slices and the round-4 advisor-high no-op-loop bug cannot recur.
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
LOGDIR=/tmp/r5queue
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

epochs_done() {
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import numpy as np, os
p='$1/val.npz'
print(len(np.load(p)['balacc']) if os.path.exists(p) else 0)"
}

SC=results_conv/32_4_1/speed4cold
D=results_conv/64_1_14/chainD
E=results_conv/64_1_14/chainE
CS=results_conv/64_1_14/coldstart
CHAIND_BEST="$D/saved_models/model_val_acc_0068_epoch_03_checkpoint.pth.tar"

# --- wait for the round-4e queue (if still alive) to drain ---
if [ -n "${OLD_QUEUE_PID:-}" ]; then
    echo "queue: waiting for round-4e queue pid $OLD_QUEUE_PID to exit"
    while kill -0 "$OLD_QUEUE_PID" 2>/dev/null; do sleep 15; done
    rm -f /tmp/queue_abort
    echo "queue: round-4e queue drained; round 5 takes the chip ($(date))"
fi

# --- stage 1: chainE, the batch-180 lever (canonical root; aug root OOMs) ---
if [ ! -e /tmp/r5_chainE_done ]; then
    if run_stage chainE python mainclean.py --model InT --name chainE \
        --length 64 --speed 1 --dist 14 -b 90 --accum-steps 2 --lr 5e-5 \
        --lr-schedule cosine --epochs 30 --bf16 --device-data \
        --fused-steps 12 --ema 0.998 \
        --synth-train 20000 --synth-test 2500 \
        --results-dir results_conv --auto-resume \
        --ckpt "$CHAIND_BEST"; then
        gcommit "chainE (reference effective batch 180 as 2x90 accumulation, train_InT.sh lever): cosine anneal from the chainD 68.67% ckpt on the canonical 20k root — monolithic b180 OOMs HBM (13.5G activations; +7.9G data for the aug root)" \
            "$E"/train.npz "$E"/val.npz "$E"/hp_dict.npz \
            "$E"/saved_models/model_last_epoch_checkpoint.pth.tar \
            "$E"/saved_models/model_val_acc_*.tar
        touch /tmp/r5_chainE_done
    fi
fi

# --- stage 2: held-out eval of every chainE checkpoint ---
if [ ! -e /tmp/r5_evalE_done ] && [ -e /tmp/r5_chainE_done ]; then
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
    [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r5_evalE_done
fi

# --- stage 2b: chainF — constant-lr 1e-4 unclipped continuation ---
# chainE (batch-180 anneal) landed 69.08% held-out, still under 70: the
# one further lever VERDICT asks for. The pre-wipe 70.00% came from the
# measured-stable continuation recipe (BASELINE "lr stability study":
# constant unclipped lr 1e-4 + EMA, val meter rising to 72 over 57+
# epochs), not from an anneal — so chainF applies exactly that recipe to
# the new best: 40 epochs from the chainE 72@15 ckpt on the 2x aug root
# at the b128 throughput optimum (b128 + 7.9G aug root fits HBM; b180
# does not, see chainE notes).
CHAINE_BEST="$E/saved_models/model_val_acc_0072_epoch_15_checkpoint.pth.tar"
F=results_conv/64_1_14/chainF
if [ ! -e /tmp/r5_chainF_done ] && [ -e /tmp/r5_evalE_done ]; then
    if run_stage chainF env PATHTRACKER_DATA_ROOT="$PWD/datasets_aug" \
        python mainclean.py --model InT --name chainF \
        --length 64 --speed 1 --dist 14 -b 128 --lr 1e-4 \
        --epochs 40 --bf16 --device-data --fused-steps 12 --ema 0.998 \
        --results-dir results_conv --auto-resume \
        --ckpt "$CHAINE_BEST"; then
        gcommit "chainF (pre-wipe recipe on the new best): constant unclipped lr 1e-4 + EMA from the chainE 69.08% ckpt, 2x root, 40 epochs" \
            "$F"/train.npz "$F"/val.npz "$F"/hp_dict.npz \
            "$F"/saved_models/model_last_epoch_checkpoint.pth.tar \
            "$F"/saved_models/model_val_acc_*.tar
        touch /tmp/r5_chainF_done
    fi
fi

# --- stage 2c: held-out eval of every chainF checkpoint ---
if [ ! -e /tmp/r5_evalF_done ] && [ -e /tmp/r5_chainF_done ]; then
    all_ok=1
    for ck in "$F"/saved_models/model_val_acc_*.tar; do
        [ -e "$ck" ] || continue
        tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
        run_stage "eval_chainF_$tag" python test_model.py --model InT \
            --name "chainF_eval_$tag" --dist 14 --speed 1 --length 64 \
            -b 128 --bf16 --ckpt "$ck" || all_ok=0
    done
    gcommit "Held-out test_perf for every chainF (constant-1e-4 continuation) checkpoint" \
        results/chainF_eval_*/test_perf_*.npz
    [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r5_evalF_done
fi

# --- stage 3: interleaved coldstart / s4cold continuation ---
while [ ! -e /tmp/queue_abort ]; do
    # two coldstart slices (priority: the reference cold-start protocol)
    for i in 1 2; do
        cs_done=$(epochs_done "$CS")
        target=$((cs_done + 25))
        [ "$target" -gt 2000 ] && break 2
        run_stage "coldstart_$target" python mainclean.py --model InT \
            --name coldstart --length 64 --speed 1 --dist 14 -b 128 \
            --lr 3e-4 --synth-train 20000 --synth-test 2500 \
            --epochs "$target" --bf16 --device-data --fused-steps 12 \
            --results-dir results_conv --auto-resume || break 2
        cs_new=$(epochs_done "$CS")
        if [ "$cs_new" -le "$cs_done" ]; then
            echo "queue: coldstart advanced zero epochs ($cs_done -> $cs_new) — stopping"
            break 2
        fi
        gcommit "coldstart (reference protocol, lr 3e-4) through epoch $cs_new" \
            "$CS"/train.npz "$CS"/val.npz "$CS"/hp_dict.npz \
            "$CS"/saved_models/model_last_epoch_checkpoint.pth.tar \
            "$CS"/saved_models/model_val_acc_*.tar
    done

    # one s4cold slice until the 500-epoch budget BASELINE.md promises
    # (50-epoch slices: T=32 epochs are ~20s, so the commit cadence stays
    # under ~20 min while halving the per-slice client-boot overhead)
    sc_done=$(epochs_done "$SC")
    if [ "$sc_done" -lt 500 ]; then
        sc_target=$((sc_done + 50))
        [ "$sc_target" -gt 500 ] && sc_target=500
        run_stage "s4cold_$sc_target" python mainclean.py --model InT \
            --name speed4cold --length 32 --speed 4 --dist 1 -b 128 \
            --lr 3e-4 --synth-train 20000 --synth-test 2500 \
            --epochs "$sc_target" --bf16 --device-data --fused-steps 12 \
            --results-dir results_conv --auto-resume || break
        sc_new=$(epochs_done "$SC")
        if [ "$sc_new" -le "$sc_done" ]; then
            echo "queue: s4cold advanced zero epochs ($sc_done -> $sc_new) — stopping"
            break
        fi
        gcommit "speed-4 cold continuation (toward the 500-epoch budget) through epoch $sc_new" \
            "$SC"/train.npz "$SC"/val.npz "$SC"/hp_dict.npz \
            "$SC"/saved_models/model_last_epoch_checkpoint.pth.tar \
            "$SC"/saved_models/model_val_acc_*.tar
    elif [ ! -e /tmp/r5_evalS4C2_done ]; then
        # stage 4: eval any new best-val ckpts the continuation produced
        all_ok=1
        for ck in "$SC"/saved_models/model_val_acc_*.tar; do
            [ -e "$ck" ] || continue
            tag=$(basename "$ck" | sed 's/model_val_acc_//;s/_checkpoint.pth.tar//')
            [ -e "results/s4cold_eval_$tag/test_perf_dist_1_speed_4_length_32.npz" ] && continue
            run_stage "eval_s4cold_$tag" python test_model.py --model InT \
                --name "s4cold_eval_$tag" --dist 1 --speed 4 --length 32 \
                -b 128 --bf16 --ckpt "$ck" || all_ok=0
        done
        gcommit "Held-out test_perf for the speed-4 continuation checkpoints (epochs 150-500)" \
            results/s4cold_eval_*/test_perf_*.npz
        [ "$all_ok" = 1 ] && [ ! -e /tmp/queue_abort ] && touch /tmp/r5_evalS4C2_done
    fi
done

echo "queue: round5 done at $(date)"
