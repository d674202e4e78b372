"""Generalization evaluation — the reference test_model.py flow.

`eval_best_model` picks the best checkpoint (val.npz balacc argmax over
mtime-sorted saved_models/*.tar, reference test_model.py:59-64) and evaluates
it across the 8 (dist, speed, length) configs; `evaluate_model` runs one
config, writing test_perf_dist_{d}_speed_{s}_length_{l}.npz with (mean acc,
mean loss) and — for recurrent models — the Img/Attn/Activity plots + GIFs.

The reference's phantom `--which_tests=64` flag (test_InT.sh:3, never defined
in its opts) is honored: it filters the config sweep by clip length.
"""

from __future__ import annotations

import functools
import os
import time
from types import SimpleNamespace

import jax
import numpy as np

from pathtracker_tpu import engine
from pathtracker_tpu.data.pipeline import tfr_data_loader
from pathtracker_tpu.data.prepare import prepare_batch
from pathtracker_tpu.train import checkpoint as ckpt_lib
from pathtracker_tpu.train.loop import init_model
from pathtracker_tpu.utils.metrics import bce_with_logits
from pathtracker_tpu.utils.opts import parser


# Backend status-code classes that mark a TRANSIENT failure of the tunneled
# TPU client (stalls, pool-grant races) rather than a bug in the eval itself.
# Round-4 postmortem: five 2-minute evals died on FAILED_PRECONDITION-class
# errors and only got a second chance when a round-long queue script reached
# its retry stage — the eval entry point itself should retry once.
_TRANSIENT_MARKERS = ("FAILED_PRECONDITION", "DEADLINE_EXCEEDED",
                      "UNAVAILABLE", "ABORTED", "RESOURCE_EXHAUSTED: Attempting")


def _is_transient_backend_error(e: Exception) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _prune_empty_results_dir(results_folder: str) -> None:
    """Never leave an empty results/<name>/ behind on a failed eval — an
    empty dir reads as 'eval ran, produced nothing' in the artifact tree."""
    try:
        if os.path.isdir(results_folder) and not os.listdir(results_folder):
            os.rmdir(results_folder)
    except OSError:
        pass


def evaluate_model_with_retry(results_folder, args, prep_gifs=3, dist=14,
                              speed=1, length=64, retries=1,
                              backoff_s=None, _eval_fn=None):
    """`evaluate_model` with one self-retry on transient backend errors.

    The tunneled single-client TPU intermittently surfaces
    FAILED_PRECONDITION/stall-class errors that clear within a minute or two;
    the retry sleeps `backoff_s` (env PATHTRACKER_EVAL_RETRY_BACKOFF_S,
    default 90) and re-runs the config in-process — the process already holds
    the single TPU client, so probing from a subprocess would contend with
    ourselves. Non-transient errors propagate immediately; a failed final
    attempt removes an empty results dir before re-raising.
    """
    if backoff_s is None:
        backoff_s = float(os.environ.get("PATHTRACKER_EVAL_RETRY_BACKOFF_S", 90))
    fn = _eval_fn or evaluate_model
    attempt = 0
    while True:
        try:
            return fn(results_folder, args, prep_gifs=prep_gifs, dist=dist,
                      speed=speed, length=length)
        except Exception as e:  # noqa: BLE001 — classified below
            if not _is_transient_backend_error(e) or attempt >= retries:
                _prune_empty_results_dir(results_folder)
                raise
            attempt += 1
            print(f"eval: transient backend error "
                  f"({type(e).__name__}: {str(e)[:200]}); retry "
                  f"{attempt}/{retries} after {backoff_s:.0f}s backoff")
            time.sleep(backoff_s)


def evaluate_model(results_folder, args, prep_gifs=3, dist=14, speed=1, length=64):
    """Evaluate one (dist, speed, length) config (reference test_model.py:78-139)."""
    os.makedirs(results_folder, exist_ok=True)

    pf_root, timesteps, len_train_loader, len_val_loader = engine.dataset_selector(
        dist=dist, speed=speed, length=length)
    print("Loading validation dataset")
    val_loader = tfr_data_loader(
        data_dir=os.path.join(pf_root, "test-*"), batch_size=args.batch_size,
        drop_remainder=True, timesteps=timesteps)

    model, variables = init_model(args, timesteps)
    params = variables["params"]
    n_params = sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(params))
    print(n_params)

    assert args.ckpt is not None, "You must pass a checkpoint for testing."
    params = engine.load_ckpt(params, args.ckpt)

    recurrent = engine.family(args.model) == "recurrent"
    prep = {"pretrained_norm": getattr(args, "pretrained", False),
            "coord_channels": engine.needs_coord_channels(args.model)}

    @jax.jit
    def test_step(p, raw_imgs, raw_labels):
        imgs, target = prepare_batch(raw_imgs, raw_labels, **prep)
        out = engine.model_step(model, {"params": p}, imgs, args.model, test=True)
        output, states, gates = out
        loss = bce_with_logits(output, target)
        acc = (target.reshape(-1) == (output.reshape(-1) > 0)).mean()
        return output, states, gates, loss, acc, imgs, target

    accs, losses = [], []
    output = states = gates = imgs_dev = target_dev = None
    for idx, (imgs, target) in enumerate(val_loader):
        output, states, gates, loss, acc, imgs_dev, target_dev = test_step(
            params, imgs, target)
        accs.append(float(acc))
        losses.append(float(loss))

    print(f"Mean accuracy: {np.mean(accs)}, mean loss: {np.mean(losses)}")
    np.savez(os.path.join(results_folder,
                          f"test_perf_dist_{dist}_speed_{speed}_length_{length}"),
             np.mean(accs), np.mean(losses))

    if recurrent and states is not None and prep_gifs:
        data_results_folder = os.path.join(
            results_folder, f"test_dist_{dist}_speed_{speed}_length_{length}")
        os.makedirs(data_results_folder, exist_ok=True)
        engine.plot_results(states, imgs_dev, target_dev, output=output,
                            timesteps=timesteps, gates=gates, prep_gifs=prep_gifs,
                            results_folder=data_results_folder)
    return float(np.mean(accs)), float(np.mean(losses))


def eval_best_model(directory, model, prep_gifs=3, batch_size=100,
                    which_tests=None, results_folder=None):
    """Find the best checkpoint in `directory` and evaluate it on all configs
    (reference test_model.py:52-75)."""
    args = SimpleNamespace()
    args.batch_size = batch_size
    args.parallel = True
    args.ckpt = ckpt_lib.find_best_checkpoint(directory)
    args.model = model
    args.penalty = "Testing"
    args.algo = "Testing"
    args.dimensions = 32
    args.fb_kernel_size = 7
    args.seed = 0
    args.pretrained = "imagenet" in directory
    results = {}
    for d in engine.get_datasets():
        if which_tests is not None and str(d["length"]) != str(which_tests):
            continue
        key = (d["dist"], d["speed"], d["length"])
        results[key] = evaluate_model_with_retry(
            results_folder or directory, args, prep_gifs=prep_gifs,
            dist=d["dist"], speed=d["speed"], length=d["length"])
    return results


def main(args=None):
    if args is None:
        args = parser.parse_args()
    results_folder = os.path.join("results", str(args.name))
    if args.ckpt is None:
        # Training runs write under results/{length}_{speed}_{dist}/{name};
        # accept either layout.
        from pathtracker_tpu.train.loop import results_folder_for
        candidates = [results_folder]
        if args.length is not None:
            candidates.insert(0, results_folder_for(args))
        directory = next((c for c in candidates
                          if os.path.exists(os.path.join(c, "val.npz"))), None)
        if directory is None:
            raise FileNotFoundError(
                f"no val.npz under any of {candidates}; pass --ckpt explicitly")
        return eval_best_model(directory=directory, model=args.model,
                               which_tests=args.which_tests)
    return evaluate_model_with_retry(
        results_folder=results_folder, args=args,
        dist=args.dist if args.dist is not None else 14,
        speed=args.speed if args.speed is not None else 1,
        length=args.length if args.length is not None else 64)


if __name__ == "__main__":
    main()
