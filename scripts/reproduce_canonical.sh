#!/usr/bin/env bash
# Reproduce the canonical-config accuracy headlines from a clean clone, on
# one TPU chip, via the warm-start chain measured in BASELINE.md:
#
#   stage A  easy config  (T=8,  dist=1)  cold start, lr 2e-3   ~6 chip-min
#   stage B  dist=5/T=32  warm from A,    lr 3e-4 (stable at T=32)
#   stage C  dist=14/T=64 warm from B,    lr 1e-4 unclipped + EMA
#            (the measured stable recipe for the 64-step BPTT horizon;
#             clip=1.0 and lr>=2e-4 were measured harmful/unstable there)
#
# Datasets are synthesized on first touch (20k train clips per config,
# 2x2-px dots — the registry renders them into $PATHTRACKER_DATA_ROOT).
# Each stage writes best-val checkpoints under
#   results_conv/{L}_{S}_{D}/<name>/saved_models/ and a rolling
# last-epoch checkpoint; stages are --auto-resume so re-running this
# script continues wherever it stopped (including after a SIGTERM from
# bench.py's pre-flight device yield, which aborts the remaining stages
# so the chain never contends with a benchmark for the single-client chip).
set -u
cd "$(dirname "$0")/.."

export PYTHONPATH="$PWD:${PYTHONPATH:-}:/root/.axon_site"
export PATHTRACKER_DATA_ROOT="${PATHTRACKER_DATA_ROOT:-$PWD/datasets}"
export PATHTRACKER_DOT_SIZE="${PATHTRACKER_DOT_SIZE:-2}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.cache/jax}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
PIDFILE="${CONVRUN_PIDFILE:-/tmp/convrun.pid}"
LOGDIR="${CONVRUN_LOGDIR:-/tmp/convchain}"
mkdir -p "$LOGDIR"

run_stage() { # run_stage <tag> <cmd...>
    local tag="$1"; shift
    if [ -e /tmp/queue_abort ]; then
        echo "chain: /tmp/queue_abort present — skipping $tag"; return 1
    fi
    echo "chain: [$tag] $*"
    python -u "$@" >"$LOGDIR/$tag.log" 2>&1 &
    local pid=$!
    echo "$pid" > "$PIDFILE"
    wait "$pid"; local rc=$?
    rm -f "$PIDFILE"
    tail -3 "$LOGDIR/$tag.log"
    if [ $rc -ne 0 ]; then
        echo "chain: $tag failed rc=$rc (log: $LOGDIR/$tag.log)"; return $rc
    fi
    if grep -q "SIGTERM: finishing step" "$LOGDIR/$tag.log"; then
        echo "chain: $tag was asked to yield the device — stopping the chain"
        return 1
    fi
}

best_ckpt() { # best_ckpt <results_folder>
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from pathtracker_tpu.train.checkpoint import find_best_checkpoint
print(find_best_checkpoint('$1'))"
}

stage_done() { # a stage counts as done once it has any best-val checkpoint
    ls "$1"/saved_models/model_val_acc_*.tar >/dev/null 2>&1
}

A=results_conv/8_1_1/chainA
B=results_conv/32_1_5/chainB
C=results_conv/64_1_14/chainC

if ! stage_done "$A" || [ "${FORCE_A:-0}" = 1 ]; then
    run_stage A mainclean.py --model InT --name chainA \
        --length 8 --speed 1 --dist 1 -b 128 --lr 2e-3 \
        --epochs "${EPOCHS_A:-60}" --bf16 --device-data --fused-steps 12 \
        --synth-train 20000 --synth-test 2000 \
        --results-dir results_conv --auto-resume || exit 1
fi

if ! stage_done "$B" || [ "${FORCE_B:-0}" = 1 ]; then
    run_stage B mainclean.py --model InT --name chainB \
        --length 32 --speed 1 --dist 5 -b 128 --lr 3e-4 \
        --epochs "${EPOCHS_B:-40}" --bf16 --device-data --fused-steps 12 \
        --synth-train 20000 --synth-test 2500 \
        --results-dir results_conv --auto-resume \
        --ckpt "$(best_ckpt "$A")" || exit 1
fi

run_stage C mainclean.py --model InT --name chainC \
    --length 64 --speed 1 --dist 14 -b 128 --lr 1e-4 \
    --epochs "${EPOCHS_C:-400}" --bf16 --device-data --fused-steps 12 \
    --ema "${EMA_C:-0.998}" \
    --synth-train 20000 --synth-test 2500 \
    --results-dir results_conv --auto-resume \
    $(stage_done "$C" || echo --ckpt "$(best_ckpt "$B")") || exit 1

echo "chain: done; evaluate with:"
echo "  python test_model.py --model InT --name chainC --results-dir results_conv \\"
echo "      --which_tests 64 -b 128 --bf16 --ckpt \"\$(best_ckpt $C)\""
