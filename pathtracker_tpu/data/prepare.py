"""Device-side batch preparation (replaces reference utils/engine.py:220-255).

The reference did all of this on host per batch (numpy transpose, /255,
ord() label decode) with a synchronous H2D copy; here the uint8 batch is
shipped to HBM once and everything else is jitted device work that XLA fuses
into the first layer: BTHWC->BCTHW layout, [0,1] normalization, optional
channel disentangling, optional Kinetics mean/std, optional coordinate
channels for the "_cc" models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Kinetics video mean/std used when --pretrained (reference utils/engine.py:245-246).
VIDEO_MEAN = (0.43216, 0.394666, 0.37645)
VIDEO_STD = (0.22803, 0.22145, 0.216989)


@functools.partial(
    jax.jit,
    static_argnames=("disentangle_channels", "pretrained_norm", "coord_channels"),
)
def prepare_batch(
    imgs: jax.Array,
    labels: jax.Array,
    disentangle_channels: bool = False,
    pretrained_norm: bool = False,
    coord_channels: bool = False,
):
    """uint8 [B,T,H,W,3] + uint8 [B] -> (f32 [B,C,T,H,W], f32 [B]).

    Semantics match reference utils/engine.py:220-255:
      * /255 to [0,1], layout BTHWC -> BCTHW;
      * disentangle: mask = round(sum over channels); ch1 <- mask==1,
        ch2 <- mask==2, ch0 <- mask==3;
      * pretrained: (x - mean) / std with the Kinetics constants;
      * coord channels: append 1-indexed (hh, ww) meshgrids as 2 extra
        channels (for the `_cc` ResNet variants).
    """
    x = imgs.astype(jnp.float32) / 255.0
    x = jnp.transpose(x, (0, 4, 1, 2, 3))  # BTHWC -> BCTHW
    target = labels.astype(jnp.float32)

    if disentangle_channels:
        mask = jnp.round(jnp.sum(x, axis=1))
        x = jnp.stack(
            [(mask == 3).astype(x.dtype),
             (mask == 1).astype(x.dtype),
             (mask == 2).astype(x.dtype)],
            axis=1,
        )

    if pretrained_norm:
        mean = jnp.asarray(VIDEO_MEAN, x.dtype)[None, :, None, None, None]
        std = jnp.asarray(VIDEO_STD, x.dtype)[None, :, None, None, None]
        x = (x - mean) / std

    if coord_channels:
        b, _, t, h, w = x.shape
        hh = jnp.arange(1, h + 1, dtype=x.dtype)[:, None] * jnp.ones((h, w), x.dtype)
        ww = jnp.arange(1, w + 1, dtype=x.dtype)[None, :] * jnp.ones((h, w), x.dtype)
        grids = jnp.stack([hh, ww])[None, :, None]  # [1,2,1,H,W]
        grids = jnp.broadcast_to(grids, (b, 2, t, h, w))
        x = jnp.concatenate([x, grids], axis=1)

    return x, target


def decode_labels(labels) -> np.ndarray:
    """Byte-string/byte labels -> float array (the reference's ord() decode)."""
    arr = np.asarray(labels)
    if arr.dtype.kind in "SU":  # byte/str labels from a tf.data source
        arr = np.vectorize(lambda s: ord(s) if isinstance(s, str) else s[0])(arr)
    return arr.astype(np.float32)
