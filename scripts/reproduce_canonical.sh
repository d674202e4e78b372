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

# MODEL selects the registry name (default InT — the flagship); the chain
# recipe (warm-start ladder, lr schedule per stage) is model-family generic
# for the recurrent trackers. Run dirs carry the model in their name so
# chains for different models coexist: chainA / hgru_chainA / ...
MODEL="${MODEL:-InT}"
PFX=""
[ "$MODEL" != "InT" ] && PFX="${MODEL}_"

# Size knobs so the chain can be smoke-tested cheaply (tiny dims compile in
# seconds on the CPU backend; the production -b 128 + fused 12-step scan
# takes ~30+ min to compile there because CPU fully unrolls recurrent scans).
BATCH="${BATCH:-128}"
SYNTH_TRAIN="${SYNTH_TRAIN:-20000}"
SYNTH_TEST="${SYNTH_TEST:-2500}"
FUSED_STEPS="${FUSED_STEPS:-12}"
EXTRA_FLAGS="${EXTRA_FLAGS:-}"   # e.g. "-d 8 -k 3" for a tiny smoke

A=results_conv/8_1_1/${PFX}chainA
B=results_conv/32_1_5/${PFX}chainB
C=results_conv/64_1_14/${PFX}chainC

if ! stage_done "$A" || [ "${FORCE_A:-0}" = 1 ]; then
    run_stage ${PFX}A mainclean.py --model "$MODEL" --name ${PFX}chainA \
        --length 8 --speed 1 --dist 1 -b "$BATCH" --lr 2e-3 \
        --epochs "${EPOCHS_A:-60}" --bf16 --device-data --fused-steps "$FUSED_STEPS" \
        --synth-train "$SYNTH_TRAIN" --synth-test "$SYNTH_TEST" \
        --results-dir results_conv --auto-resume $EXTRA_FLAGS || exit 1
fi

if ! stage_done "$B" || [ "${FORCE_B:-0}" = 1 ]; then
    run_stage ${PFX}B mainclean.py --model "$MODEL" --name ${PFX}chainB \
        --length 32 --speed 1 --dist 5 -b "$BATCH" --lr 3e-4 \
        --epochs "${EPOCHS_B:-40}" --bf16 --device-data --fused-steps "$FUSED_STEPS" \
        --synth-train "$SYNTH_TRAIN" --synth-test "$SYNTH_TEST" \
        --results-dir results_conv --auto-resume $EXTRA_FLAGS \
        --ckpt "$(best_ckpt "$A")" || exit 1
fi

run_stage ${PFX}C mainclean.py --model "$MODEL" --name ${PFX}chainC \
    --length 64 --speed 1 --dist 14 -b "$BATCH" --lr 1e-4 \
    --epochs "${EPOCHS_C:-400}" --bf16 --device-data --fused-steps "$FUSED_STEPS" \
    --ema "${EMA_C:-0.998}" \
    --synth-train "$SYNTH_TRAIN" --synth-test "$SYNTH_TEST" \
    --results-dir results_conv --auto-resume $EXTRA_FLAGS \
    $(stage_done "$C" || echo --ckpt "$(best_ckpt "$B")") || exit 1

echo "chain: done; evaluate with:"
echo "  python test_model.py --model $MODEL --name ${PFX}chainC --results-dir results_conv \\"
echo "      --which_tests 64 -b 128 --bf16 --ckpt \"\$(best_ckpt $C)\""
