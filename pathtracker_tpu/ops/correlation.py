"""Spatial correlation (cost volume) op.

TPU-native replacement for the reference's `spatial_correlation_sampler`
C++/CUDA extension (reference models/resnet_TSM.py:12,150 — the one genuinely
native dependency of the reference). For each position in f1, the dot product
with f2 over a patch x patch displacement neighborhood:

    corr[b, y, x, dy*patch+dx] = sum_c f1[b,y,x,c] * f2[b, y+dy-r, x+dx-r, c]

Two implementations:

  * `correlation_xla` — static unrolled shift-and-reduce over the patch^2
    displacements of a zero-padded f2; XLA fuses each displacement into a
    multiply+channel-reduce, but every displacement re-reads f1 from HBM
    (patch=15 => 225 passes over f1).
  * `correlation_pallas` — a Pallas kernel, one program per batch element:
    f1 and the padded f2 live in VMEM and every displacement reads them
    on-chip, so HBM traffic is a single read of f1/f2 and a single write of
    the [H, W, patch^2] volume (the speed-of-light for this op, which is
    bandwidth-bound — ~29 VPU MFLOP per image at 32x32x64).

`correlation` dispatches to the kernel on TPU and carries a custom VJP whose
backward is the analytic gradient via the XLA formulation (correlation is
linear in each input), so models using it train unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def correlation_xla(f1, f2, patch: int = 15, dilation: int = 1):
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


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, patch: int, dilation: int,
                 height: int, width: int):
    from jax.experimental import pallas as pl

    f1 = f1_ref[0].astype(jnp.float32)  # [H, W, C]

    def body(d, _):
        dy = d // patch
        dx = d % patch
        win = f2p_ref[0, pl.ds(dy * dilation, height),
                      pl.ds(dx * dilation, width), :].astype(jnp.float32)
        # Displacement-major output: each step writes one full [H, W] plane
        # (dynamic index on an outer dim; the tiled HxW minor dims stay whole).
        out_ref[0, d] = jnp.sum(f1 * win, axis=-1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, patch * patch, body, 0)


def correlation_pallas(f1, f2, patch: int = 15, dilation: int = 1,
                       interpret: bool = False):
    """Pallas cost-volume kernel; one grid program per batch element.

    Returns [B, H, W, patch^2] (the volume is computed displacement-major in
    VMEM and transposed once in XLA on the way out)."""
    from jax.experimental import pallas as pl

    b, h, w, c = f1.shape
    r = (patch - 1) // 2 * dilation
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    kernel = functools.partial(_corr_kernel, patch=patch, dilation=dilation,
                               height=h, width=w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h + 2 * r, w + 2 * r, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, patch * patch, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, patch * patch, h, w), f1.dtype),
        interpret=interpret,
    )(f1, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation(f1, f2, patch: int = 15, dilation: int = 1):
    """Cost volume [B, H, W, patch^2]; Pallas forward on TPU, XLA elsewhere."""
    platform = jax.devices()[0].platform.lower()
    if platform not in ("cpu", "gpu", "cuda", "rocm"):
        return correlation_pallas(f1, f2, patch, dilation)
    return correlation_xla(f1, f2, patch, dilation)


def _corr_fwd(f1, f2, patch, dilation):
    return correlation(f1, f2, patch, dilation), (f1, f2)


def _corr_bwd(patch, dilation, res, g):
    f1, f2 = res
    # Correlation is bilinear: route the cotangent through the XLA
    # formulation's own VJP (identical math, always available).
    _, vjp = jax.vjp(lambda a, b: correlation_xla(a, b, patch, dilation), f1, f2)
    return vjp(g)


correlation.defvjp(_corr_fwd, _corr_bwd)


def l2_normalize(x, axis: int = -1, eps: float = 1e-6):
    """Reference Matching_layer.L2normalize (resnet_TSM.py:152-157)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / norm
