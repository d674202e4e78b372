"""Model registry: name -> constructor, mirroring reference utils/engine.py:75-217.

Every reference `--model` name resolves here. MODEL_FAMILY mirrors the three
forward-contract families dispatched by the reference's model_step
(reference utils/engine.py:29-30,42-72):
  'recurrent'    forward(x) -> (logit, jv_penalty); testmode adds states/gates
  'torchvision'  forward(x) -> logit only
  'slowfast'     forward([slow, fast]) -> logit only
"""

from __future__ import annotations

from typing import Any

MODEL_FAMILY = {
    "r3d": "torchvision",
    "mc3": "torchvision",
    "r2plus1": "torchvision",
    "nostride_r3d": "torchvision",
    "nostride_r3d_pos": "torchvision",
    "nostride_r3d_cc": "torchvision",
    "nostride_video_cc_small": "torchvision",
    "rntsm": "torchvision",
    "slowfast": "slowfast",
    "slowfast_nl": "slowfast",
    # Single-pathway Slow net (reference models/cfgs/slow.yaml, unreachable
    # there); plain-clip input, so the TORCHVISION forward contract.
    "slow": "torchvision",
}


def family(model_name: str) -> str:
    return MODEL_FAMILY.get(model_name, "recurrent")


def needs_coord_channels(model_name: str) -> bool:
    """Models whose stem takes 5 input channels (x + meshgrid coords
    appended by data prep, reference utils/engine.py:249-254).
    nostride_video_cc_small keeps '_cc' in its name but appends coords
    INSIDE forward, so prep must not (reference nostridetv_cc_smallest.py)."""
    return "_cc" in model_name and model_name != "nostride_video_cc_small"


def model_selector(model_name: str, timesteps: int, fb_kernel_size: int = 7,
                   dimensions: int = 32, pretrained: bool = False, **kwargs: Any):
    """Build the model for a reference `--model` name."""
    from pathtracker_tpu.models import int_circuit

    if pretrained and model_name not in ("r3d", "mc3", "r2plus1"):
        # The reference downloaded Kinetics/ImageNet torchvision weights
        # (reference nostridetv.py:12-16, resnet_TSM.py model_urls); this
        # environment has no network egress and torch checkpoints don't map
        # onto the fac-narrowed forks. --pretrained still selects the
        # ImageNet-video normalization in prepare_data (reference
        # utils/engine.py:244-247); weights start from init. For the plain
        # torchvision trunks (r3d/mc3/r2plus1) train/loop.py's
        # load_pretrained owns the messaging: it loads a locally provided
        # .pth from $PATHTRACKER_PRETRAINED_DIR, or warns if absent.
        import warnings
        warnings.warn(
            "--pretrained: no pretrained weights are available offline for "
            f"{model_name!r}; using the pretrained input normalization "
            "only. Load weights explicitly with --ckpt if you have a "
            "converted checkpoint.",
            stacklevel=2)

    if model_name == "InT":
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size, **kwargs)
    if model_name == "InT_no_inh":  # excitation-only circuit
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size, no_inh=True, **kwargs)
    if model_name == "InT_no_mult":  # lesion div-inh + add-exc ("reverse mely")
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size,
                               lesion_alpha=True, lesion_gamma=True, **kwargs)
    if model_name == "InT_no_add":  # lesion sub-inh + mult-exc ("mely style")
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size,
                               lesion_mu=True, lesion_kappa=True, **kwargs)
    if model_name == "InT_mult_add":  # div/mult only
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size,
                               lesion_gamma=True, lesion_mu=True, **kwargs)
    if model_name == "InT_only_add":  # sub/add only
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size,
                               lesion_alpha=True, lesion_kappa=True, **kwargs)
    if model_name == "InT_tanh":
        return int_circuit.InT(dimensions=dimensions, timesteps=timesteps,
                               kernel_size=fb_kernel_size, nl="tanh", **kwargs)
    if model_name == "fc":
        return int_circuit.FC(dimensions=dimensions, timesteps=timesteps,
                              kernel_size=fb_kernel_size, **kwargs)

    if model_name == "hgru":
        from pathtracker_tpu.models import hgru
        return hgru.FFhGRU(dimensions=dimensions, timesteps=timesteps,
                           kernel_size=fb_kernel_size, **kwargs)
    if model_name == "hgru_v2":
        from pathtracker_tpu.models import hgru
        return hgru.FFhGRUv2(dimensions=dimensions, timesteps=timesteps,
                             kernel_size=fb_kernel_size, **kwargs)
    if model_name in ("clock_hgru", "clock_hgru_fixed"):
        from pathtracker_tpu.models import hgru
        clock = "fixed" if model_name.endswith("_fixed") else "dynamic"
        return hgru.ClockHGRU(dimensions=dimensions, timesteps=timesteps,
                              kernel_size=fb_kernel_size, clock_type=clock,
                              **kwargs)
    if model_name == "gru":
        from pathtracker_tpu.models import convgru
        # The reference doubles the width for the ConvGRU baseline
        # (reference utils/engine.py:148-153).
        return convgru.GRU(dimensions=dimensions * 2, timesteps=timesteps,
                           kernel_size=fb_kernel_size, **kwargs)
    if model_name == "convlstm":
        from pathtracker_tpu.models import convlstm
        return convlstm.ConvLSTM(timesteps=timesteps, **kwargs)
    if model_name == "stlstm":
        from pathtracker_tpu.models import stlstm
        return stlstm.FFSTLSTM(timesteps=timesteps, **kwargs)
    if model_name == "fflstm":
        from pathtracker_tpu.models import fflstm
        return fflstm.FFLSTM(timesteps=timesteps, **kwargs)
    if model_name == "lrcn":
        from pathtracker_tpu.models import lrcn
        return lrcn.LRCNStyle(timesteps=timesteps, **kwargs)
    if model_name == "lrcn_last":
        from pathtracker_tpu.models import lrcn
        return lrcn.LRCNStyleLast(timesteps=timesteps, **kwargs)
    if model_name == "ffnet":
        from pathtracker_tpu.models import ffnet
        return ffnet.FFConvNet(**kwargs)

    if model_name in ("r3d", "mc3", "r2plus1"):
        from pathtracker_tpu.models import video_resnet
        return video_resnet.build(model_name, **kwargs)
    if model_name in ("nostride_r3d", "nostride_r3d_pos", "nostride_r3d_cc",
                      "nostride_video_cc_small"):
        from pathtracker_tpu.models import video_resnet
        return video_resnet.build(model_name, timesteps=timesteps, **kwargs)
    if model_name == "rntsm":
        from pathtracker_tpu.models import tsm_resnet
        return tsm_resnet.resnet50_tsm(num_segments=8, flow_estimation=True, **kwargs)
    if model_name in ("slowfast", "slowfast_nl"):
        from pathtracker_tpu.models import slowfast
        return slowfast.build(model_name, **kwargs)
    if model_name == "slow":
        from pathtracker_tpu.models import slowfast
        # PathTracker head: 1 logit (overrides the yaml's Kinetics-400 head;
        # kwargs merge over yaml, the reference's direction).
        kwargs.setdefault("num_classes", 1)
        return slowfast.build(model_name, **kwargs)
    if model_name == "timesformer":
        from pathtracker_tpu.models import transformers
        return transformers.TransformerModel(dimensions=dimensions, timesteps=timesteps,
                                             **kwargs)
    if model_name == "performer":
        from pathtracker_tpu.models import transformers
        return transformers.PerformerModel(dimensions=dimensions, timesteps=timesteps,
                                           **kwargs)
    if model_name == "lambda":
        from pathtracker_tpu.models import transformers
        return transformers.LambdaModel(dimensions=dimensions, timesteps=timesteps,
                                        **kwargs)
    raise NotImplementedError(f"Model not found: {model_name!r}")
