"""Attribution visualization — the reference viz_model_att.py flow, with
`jax.grad` wrt inputs instead of torch double-use of .backward().

Loads the best checkpoint for a run, loads MTurk human per-clip responses
(mturk_responses/{set_name}_average_responses.npy; synthesized placeholders
with a warning if absent, since the assets are not in the repo), runs the
model in testmode, computes MSE(model logits, logit(human)) and its input
gradient, splits into positive/negative saliency, and saves
mturk_visualizations_{set_name}.npz with attention/states/grads/imgs plus the
model-vs-human accuracy printout (reference viz_model_att.py:148-215).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from pathtracker_tpu import engine
from pathtracker_tpu.data.pipeline import tfr_data_loader
from pathtracker_tpu.data.prepare import prepare_batch
from pathtracker_tpu.train import checkpoint as ckpt_lib
from pathtracker_tpu.train.loop import init_model
from pathtracker_tpu.utils.opts import parser


def load_human_responses(set_name: str, n_clips: int,
                         responses_dir: str = "mturk_responses",
                         shard_pattern: str | None = None,
                         timesteps: int | None = None) -> np.ndarray:
    """Per-clip averaged human responses for `set_name`.

    Loads the reference's MTurk asset when present (reference
    viz_model_att.py:148-152; the .npy ships nowhere public). Absent that,
    synthesizes a PROXY by running the greedy nearest-neighbor tracker over
    the same clips the viz loop will read (eval/greedy.py): the proxy's
    "human accuracy" is then the documented algorithmic bar for the config
    rather than noise, so the model-vs-human printout stays meaningful."""
    path = os.path.join(responses_dir, f"{set_name}_average_responses.npy")
    if os.path.exists(path):
        return np.load(path)
    if shard_pattern is not None:
        from pathtracker_tpu.eval.greedy import greedy_responses_for_shards

        print(f"WARNING: {path} not found; using greedy-tracker proxy "
              "responses computed on the evaluation clips.")
        return greedy_responses_for_shards(shard_pattern, timesteps, n_clips)
    print(f"WARNING: {path} not found; synthesizing placeholder human responses.")
    rng = np.random.default_rng(0)
    return rng.uniform(0.05, 0.95, size=(n_clips,)).astype(np.float32)


def evaluate_model(args, results_folder: str, batch_size: int | None = None):
    if batch_size is None:
        batch_size = getattr(args, "batch_size", 40)
    set_name = args.set_name or "gen_1_25_64"
    pf_root, timesteps, _, len_val = engine.human_dataset_selector(set_name)
    loader = tfr_data_loader(
        data_dir=os.path.join(pf_root, "test-*"), batch_size=batch_size,
        drop_remainder=True, shuffle_buffer=0, timesteps=timesteps)

    model_name = engine.fix_model_name(args.model)
    margs = SimpleNamespace(**vars(args))
    margs.model = model_name
    model, variables = init_model(margs, timesteps)
    params = engine.load_ckpt(variables["params"], args.ckpt, strict=False)

    human = load_human_responses(
        set_name, len_val,
        shard_pattern=os.path.join(pf_root, "test-*"), timesteps=timesteps)
    prep = {"pretrained_norm": getattr(args, "pretrained", False)}

    @jax.jit
    def attribution_step(p, raw_imgs, raw_labels, human_probs):
        imgs, target = prepare_batch(raw_imgs, raw_labels, **prep)

        def score_fn(im):
            output, states, gates = engine.model_step(
                model, {"params": p}, im, model_name, test=True)
            human_logit = jnp.log(human_probs) - jnp.log1p(-human_probs)
            score = jnp.mean((output.reshape(-1) - human_logit) ** 2)
            return score, (output, states, gates)

        grads, (output, states, gates) = jax.grad(score_fn, has_aux=True)(imgs)
        pos_grads = jax.nn.relu(grads)
        neg_grads = jax.nn.relu(-grads)
        return output, states, gates, pos_grads, neg_grads, imgs, target

    all_out = {"attention": [], "states": [], "pos_grads": [], "neg_grads": [],
               "imgs": [], "targets": [], "outputs": [], "human": []}
    model_correct, human_correct, count = 0, 0, 0
    offset = 0
    for raw_imgs, raw_labels in loader:
        b = raw_imgs.shape[0]
        hp = jnp.asarray(np.clip(human[offset:offset + b], 1e-4, 1 - 1e-4)
                         if offset + b <= len(human)
                         else np.full((b,), 0.5, np.float32))
        output, states, gates, pos_g, neg_g, imgs, target = attribution_step(
            params, raw_imgs, raw_labels, hp)
        output = np.asarray(output).reshape(-1)
        target = np.asarray(target).reshape(-1)
        hp = np.asarray(hp)
        model_pred = (output > 0).astype(np.float32)
        human_pred = (hp > 0.5).astype(np.float32)
        model_correct += float((model_pred == target).sum())
        human_correct += float((human_pred == target).sum())
        count += b
        # Keep correct-and-positive clips, like the reference (:200-213).
        keep = np.where((model_pred == target) & (target == 1))[0]
        if len(keep):
            all_out["attention"].append(np.asarray(gates)[keep])
            all_out["states"].append(np.asarray(states)[keep])
            all_out["pos_grads"].append(np.asarray(pos_g)[keep])
            all_out["neg_grads"].append(np.asarray(neg_g)[keep])
            all_out["imgs"].append(np.asarray(imgs)[keep])
            all_out["targets"].append(target[keep])
            all_out["outputs"].append(output[keep])
            all_out["human"].append(hp[keep])
        offset += b

    os.makedirs(results_folder, exist_ok=True)
    np.savez(
        os.path.join(results_folder, f"mturk_visualizations_{set_name}"),
        **{k: np.concatenate(v) if v else np.zeros((0,)) for k, v in all_out.items()})
    print(f"Model accuracy: {model_correct / max(count, 1)}, "
          f"human accuracy: {human_correct / max(count, 1)}")
    return model_correct / max(count, 1), human_correct / max(count, 1)


def main(args=None):
    if args is None:
        args = parser.parse_args()
    results_folder = os.path.join("results", str(args.name))
    if args.ckpt is None:
        from pathtracker_tpu.train.loop import results_folder_for
        candidates = [results_folder]
        if args.length is not None:
            candidates.insert(0, results_folder_for(args))
        directory = next((c for c in candidates
                          if os.path.exists(os.path.join(c, "val.npz"))), None)
        if directory is None:
            raise FileNotFoundError(f"no val.npz under {candidates}; pass --ckpt")
        args.ckpt = ckpt_lib.find_best_checkpoint(directory)
    return evaluate_model(args, results_folder)


if __name__ == "__main__":
    main()
