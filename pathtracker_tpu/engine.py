"""Engine: registries, forward-family dispatch, data prep glue, ckpt loading.

The reference-compatible API layer (reference utils/engine.py): model_selector,
model_step, prepare_data, dataset_selector, get_datasets, load_ckpt,
plot_results, plus the APIs its viz script called but the snapshot never
defined (fix_model_name, human_dataset_selector — SURVEY.md header).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from pathtracker_tpu.data.prepare import prepare_batch
from pathtracker_tpu.data.registry import (  # noqa: F401  (re-exported API)
    ALL_DATASETS,
    dataset_selector,
    get_datasets,
    human_dataset_selector,
)
from pathtracker_tpu.models.registry import (MODEL_FAMILY, family,
                                             needs_coord_channels,
                                             model_selector as _build)
from pathtracker_tpu.train import checkpoint as ckpt_lib

TORCHVISION = [k for k, v in MODEL_FAMILY.items() if v == "torchvision"]
SLOWFAST = [k for k, v in MODEL_FAMILY.items() if v == "slowfast"]
SLOWFAST_ALPHA = 4  # slow pathway takes every 4th frame (reference utils/engine.py:52)


def model_selector(args, timesteps: int, device=None):
    """Build a model from parsed args (reference utils/engine.py:75-217)."""
    if args.model == "convlstm":
        # ConvLSTM keeps the reference's legacy direct-call contract — a
        # STATIC [B,1,H,W] image in, [B,2,H,W] map out, criterion passed
        # into forward (reference convlstm.py:116; not wired into the
        # reference's model_selector either). It is reachable via
        # models.registry.model_selector("convlstm") for direct use, not
        # through the video train/eval CLIs.
        raise NotImplementedError(
            "'convlstm' uses the reference's legacy direct-call contract "
            "(static image -> [B,2,H,W]; reference convlstm.py:116) and is "
            "not trainable through the video CLI — build it via "
            "pathtracker_tpu.models.registry.model_selector('convlstm')")
    kwargs = {}
    if getattr(args, "bf16", False) and (
            args.model.startswith(("InT", "r3d", "mc3", "r2plus1", "nostride"))
            or args.model in ("hgru", "hgru_v2", "clock_hgru",
                              "clock_hgru_fixed", "gru")):
        # bfloat16 fast path: recurrent trackers use mixed precision (bf16
        # MXU inputs, f32 state); feedforward ResNets run fully bf16.
        kwargs["dtype"] = "bfloat16"
    algo = getattr(args, "algo", "bptt")
    if algo != "bptt" and family(args.model) == "recurrent":
        # The reference printed args.algo but hardwired bptt
        # (reference utils/engine.py:78-84); here --algo rbp is wired for
        # real — but only where the model implements it. Every other model
        # accepts grad_method as a field and ignores it, so passing it
        # through silently would mislabel BPTT runs as RBP.
        if "rbp" in algo and not args.model.startswith("InT"):
            # (convlstm also implements RBP but is legacy-contract and not
            # reachable through this CLI selector — see the guard above.)
            raise NotImplementedError(
                f"--algo {algo!r} is implemented for InT*; "
                f"{args.model!r} trains with bptt")
        kwargs["grad_method"] = algo
    if getattr(args, "remat_blocks", False):
        # Per-residual-block rematerialization for the no-stride heavies
        # whose backprop residuals exceed HBM at production T (rntsm needs
        # 85G at batch 8/T=64 without it — results/tpu_experiments.md).
        if args.model != "rntsm":
            raise NotImplementedError(
                f"--remat-blocks is wired for 'rntsm'; {args.model!r} fits "
                "HBM without it (use --fused-steps remat for InT-family)")
        kwargs["remat"] = True
    if family(args.model) == "slowfast" or args.model == "slow":
        # yaml is the SlowFast config surface (reference
        # models/cfgs/*.yaml via slowfast_utils.py:13-17); --slowfast_cfg
        # points at a modified cfg, else the in-repo default for the name.
        # `slow` (single-pathway, TORCHVISION contract) shares the surface.
        kwargs["cfg_path"] = getattr(args, "slowfast_cfg", None)
    return _build(
        args.model,
        timesteps=timesteps,
        fb_kernel_size=getattr(args, "fb_kernel_size", 7),
        dimensions=getattr(args, "dimensions", 32),
        pretrained=getattr(args, "pretrained", False),
        **kwargs,
    )


def slowfast_pathways(imgs, alpha: int = SLOWFAST_ALPHA):
    """[slow, fast] pathway list (reference utils/engine.py:47-61): fast = all
    frames; slow = T//ALPHA frames sampled evenly with the same linspace/long
    rounding as torch.index_select on linspace(0, T-1, T//ALPHA). ALPHA
    follows the model's yaml cfg when a model is in scope (model_step)."""
    t = imgs.shape[2]
    idx = np.linspace(0, t - 1, t // alpha).astype(np.int64)
    slow = jnp.take(imgs, jnp.asarray(idx), axis=2)
    return [slow, imgs]


def model_step(model, params, imgs, model_name: str, test: bool = False,
               rngs=None):
    """Forward dispatch over the three contract families
    (reference utils/engine.py:42-72). Returns (output, jv_penalty) or, with
    test=True, (output, states, gates) — None states/gates for non-recurrent
    families. `rngs` (e.g. {'dropout': key}) is supplied by the train step;
    models without stochastic layers ignore it."""
    fam = family(model_name)
    kw = {"rngs": rngs} if rngs else {}
    if fam == "torchvision":
        output = model.apply(params, imgs, **kw)
        jv_penalty = jnp.ones((1,), jnp.float32)
    elif fam == "slowfast":
        output = model.apply(
            params,
            slowfast_pathways(imgs, getattr(model, "alpha", SLOWFAST_ALPHA)),
            **kw)
        jv_penalty = jnp.ones((1,), jnp.float32)
    else:
        if test:
            return model.apply(params, imgs, testmode=True, **kw)
        return model.apply(params, imgs, **kw)
    if test:
        return output, None, None
    return output, jv_penalty


def prepare_data(imgs, target, args, device=None, disentangle_channels: bool = False,
                 use_augmentations: bool = False):
    """Batch prep (reference utils/engine.py:220-255), on device.

    imgs: uint8 [B,T,H,W,3] numpy; target: uint8/byte labels.
    Returns (f32 [B,C,T,H,W] on device, f32 [B] targets)."""
    model_name = getattr(args, "model", "")
    coord = needs_coord_channels(model_name)
    return prepare_batch(
        jnp.asarray(np.asarray(imgs)),
        jnp.asarray(np.asarray(target)),
        disentangle_channels=disentangle_channels,
        pretrained_norm=getattr(args, "pretrained", False),
        coord_channels=coord,
    )


def load_ckpt(params, model_path: str, strict: bool = True):
    """Restore params from a checkpoint path (reference utils/engine.py:258-269,
    plus the strict=False mode its viz script wanted)."""
    return ckpt_lib.load_params(model_path, template=params, strict=strict)


def fix_model_name(name: str) -> str:
    """Normalize run names to model names (phantom reference API
    viz_model_att.py:119): strips trailing run qualifiers like 'InT_run2'."""
    for known in sorted(MODEL_FAMILY, key=len, reverse=True):
        if name.startswith(known):
            return known
    for known in ("InT_no_inh", "InT_no_mult", "InT_no_add", "InT_mult_add",
                  "InT_only_add", "InT_tanh", "InT", "hgru_v2", "hgru", "gru",
                  "fc", "ffnet", "convlstm", "stlstm", "fflstm", "lrcn_last",
                  "lrcn", "performer", "timesformer", "lambda"):
        if name.startswith(known):
            return known
    return name


def plot_results(states, imgs, target, output, timesteps, gates=None,
                 prep_gifs=False, results_folder=None, show_fig=False):
    """Per-timestep Img/Attn/Activity panels + optional GIFs
    (reference utils/engine.py:272-340). Lazy-imports matplotlib/imageio."""
    from pathtracker_tpu.eval.plots import plot_results as _plot

    return _plot(states, imgs, target, output, timesteps, gates=gates,
                 prep_gifs=prep_gifs, results_folder=results_folder,
                 show_fig=show_fig)
