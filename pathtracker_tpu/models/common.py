"""Shared model pieces: layout helpers and the target-conditioned readout.

The PathTracker models share one readout idiom (reference models/InT.py:236-241,
ffhgru_hierarchy.py:254-272, kys.py:125-131, transformers.py:121-129):
collapse the final state to 1 channel with a 1x1 conv, concatenate the blue
channel of frame 0 (the target-dot marker), 5x5 conv to 1 channel, global
average pool, then a Linear(1, 1) scale+intercept to a single logit.

Implemented as plain functions over params created in the host module, so the
1x1 readout conv can also run inside a scan (testmode collects the per-step
state maps, reference models/InT.py:233).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import conv2d, dense, global_avg_pool


def bcthw_to_bthwc(x):
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def bthwc_to_bcthw(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def make_readout_params(mod: nn.Module, dimensions: int) -> dict:
    """Create target-conditioned readout params on `mod` (torch default inits;
    target_conv bias zero-init per reference models/InT.py:206)."""
    return {
        "readout_kernel": mod.param("readout_conv_kernel", pt_init.torch_conv_default,
                                    (dimensions, 1)),
        "readout_bias": mod.param("readout_conv_bias", pt_init.torch_conv_bias(dimensions),
                                  (1,)),
        "target_kernel": mod.param("target_conv_kernel", pt_init.torch_conv_default,
                                   (5, 5, 2, 1)),
        "target_bias": mod.param("target_conv_bias", nn.initializers.zeros, (1,)),
        "dense_kernel": mod.param("readout_dense_kernel", pt_init.torch_conv_default,
                                  (1, 1)),
        "dense_bias": mod.param("readout_dense_bias", pt_init.torch_conv_bias(1), (1,)),
    }


def readout_state_map(p: dict, state_hwc):
    """1x1 readout conv: [B,H,W,C] -> [B,H,W,1]."""
    return dense(state_hwc, p["readout_kernel"], p["readout_bias"])


def target_readout(p: dict, state_hwc, target_hw):
    """Full readout: ([B,H,W,C] state, [B,H,W] frame-0 blue) -> [B,1] logit."""
    merged = jnp.concatenate([readout_state_map(p, state_hwc), target_hw[..., None]],
                             axis=-1)
    out = conv2d(merged, p["target_kernel"], p["target_bias"])
    out = global_avg_pool(out)
    return dense(out, p["dense_kernel"], p["dense_bias"])
