"""Temporal Shift Module (reference models/tsm_util.py:4-22).

Splits channels into 1/8 shifted forward, 1/8 shifted backward, 3/4
unshifted, along the frame axis. 'zero' pads the rolled-off frame with
zeros; 'circulant' wraps."""

from __future__ import annotations

import jax.numpy as jnp


def tsm(x, version: str = "zero"):
    """x: [B, T, H, W, C] -> same shape, channels temporally shifted."""
    c = x.shape[-1]
    split = c // 8
    pre, post, peri = x[..., :split], x[..., split:2 * split], x[..., 2 * split:]
    if version == "zero":
        pre = jnp.concatenate([pre[:, 1:], jnp.zeros_like(pre[:, :1])], axis=1)
        post = jnp.concatenate([jnp.zeros_like(post[:, :1]), post[:, :-1]], axis=1)
    elif version == "circulant":
        pre = jnp.roll(pre, shift=-1, axis=1)
        post = jnp.roll(post, shift=1, axis=1)
    else:
        raise ValueError(version)
    return jnp.concatenate([pre, post, peri], axis=-1)
