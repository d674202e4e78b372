"""Run the full 8-config ALL_DATASETS generalization sweep for one checkpoint.

The reference's eval deliverable (reference test_model.py:73-75,
utils/engine.py:31-40): one trained checkpoint evaluated across all 8
(dist, speed, length) configs. `eval_best_model` does this with its own
checkpoint pick; this driver pins an explicit checkpoint (reproducibility:
the matrix must be attributable to one committed .tar) and orders configs
so all T=64 shapes share one compile — each evaluate_model call builds a
fresh jit, so the sharing happens through the persistent compilation cache,
which this script therefore enables itself (machine-keyed, utils/cache.py)
rather than assuming the caller exported JAX_COMPILATION_CACHE_DIR.

Usage: python scripts/eval_matrix.py <ckpt> [results_folder] [model]
"""

import sys
from types import SimpleNamespace

from pathtracker_tpu.utils import cache as _cache

_cache.enable()

from pathtracker_tpu.data.registry import ALL_DATASETS
from pathtracker_tpu.eval.test_model import evaluate_model_with_retry


def main():
    ckpt = sys.argv[1]
    results_folder = sys.argv[2] if len(sys.argv) > 2 else "results/chainC_matrix"
    model = sys.argv[3] if len(sys.argv) > 3 else "InT"

    args = SimpleNamespace(
        batch_size=128, parallel=True, ckpt=ckpt, model=model,
        penalty="Testing", algo="Testing", dimensions=32, fb_kernel_size=7,
        seed=0, pretrained=False, bf16=True)

    # T=64 first (six configs share one compiled step), then 32, then 128.
    configs = sorted(ALL_DATASETS, key=lambda d: (d["length"] != 64, d["length"]))
    results = {}
    for d in configs:
        key = (d["dist"], d["speed"], d["length"])
        print(f"=== config dist={key[0]} speed={key[1]} length={key[2]} ===",
              flush=True)
        results[key] = evaluate_model_with_retry(
            results_folder, args, prep_gifs=0,
            dist=d["dist"], speed=d["speed"], length=d["length"])
        print(f"=== done {key}: acc={results[key][0]:.4f} "
              f"loss={results[key][1]:.4f} ===", flush=True)

    print("MATRIX COMPLETE")
    for key, (acc, loss) in results.items():
        print(f"{key}: {acc * 100:.2f}% / {loss:.4f} BCE", flush=True)


if __name__ == "__main__":
    main()
