"""Spatial correlation (cost volume) op.

TPU-native replacement for the reference's `spatial_correlation_sampler`
C++/CUDA extension (reference models/resnet_TSM.py:12,150 — the one genuinely
native dependency of the reference). For each position in f1, the dot product
with f2 over a patch x patch displacement neighborhood:

    corr[b, y, x, dy*patch+dx] = sum_c f1[b,y,x,c] * f2[b, y+dy-r, x+dx-r, c]

Implemented as a static unrolled shift-and-reduce over the (patch^2)
displacements of a zero-padded f2 — pure elementwise multiply + channel
reduction per displacement, which XLA fuses into a handful of kernels; no
gather/scatter, fully differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def correlation(f1, f2, patch: int = 15, dilation: int = 1):
    """f1, f2: [B, H, W, C] (NHWC). Returns [B, H, W, patch*patch]."""
    b, h, w, c = f1.shape
    r = (patch - 1) // 2 * dilation
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    slices = []
    for dy in range(patch):
        for dx in range(patch):
            oy, ox = dy * dilation, dx * dilation
            win = f2p[:, oy:oy + h, ox:ox + w, :]
            slices.append(jnp.sum(f1 * win, axis=-1))
    return jnp.stack(slices, axis=-1)


def l2_normalize(x, axis: int = -1, eps: float = 1e-6):
    """Reference Matching_layer.L2normalize (resnet_TSM.py:152-157)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / norm
