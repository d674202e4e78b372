"""ViT support module (reference models/transformer.py:8-130).

The reference carried a lucidrains-style ViT (Residual/PreNorm/FeedForward/
Attention/Transformer/ViT) as support code — imported by
ffhgru_hierarchy.py:8 but never called, and its forward held a live
pdb.set_trace (reference transformer.py:128). Provided here as a working
JAX implementation with the same structure: patch embed + cls token + pos
embedding, prenorm residual attention/MLP blocks, cls-token MLP head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models.transformers import _MHA, _MLP, _layer_norm
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import dense


class Transformer(nn.Module):
    """Prenorm residual encoder (reference transformer.py:66-84)."""

    dim: int = 128
    depth: int = 2
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        for layer in range(self.depth):
            x = x + _MHA(self.dim, self.heads, self.dim_head,
                         name=f"attn{layer}")(
                _layer_norm(self, f"ln_a{layer}", x))
            x = x + _MLP(self.dim, self.mlp_dim, name=f"mlp{layer}")(
                _layer_norm(self, f"ln_m{layer}", x))
        return x


class ViT(nn.Module):
    """Image classifier over [B, H, W, C] inputs (reference transformer.py:86-130)."""

    image_size: int = 32
    patch_size: int = 8
    num_classes: int = 1
    dim: int = 128
    depth: int = 2
    heads: int = 4
    dim_head: int = 32
    mlp_dim: int = 256
    channels: int = 3

    @nn.compact
    def __call__(self, img):
        ps = self.patch_size
        b, h, w, c = img.shape
        ph, pw = h // ps, w // ps
        patches = img.reshape(b, ph, ps, pw, ps, c)
        patches = jnp.transpose(patches, (0, 1, 3, 2, 4, 5)).reshape(
            b, ph * pw, ps * ps * c)
        emb_k = self.param("patch_kernel", pt_init.torch_conv_default,
                           (ps * ps * c, self.dim))
        emb_b = self.param("patch_bias", pt_init.torch_conv_bias(ps * ps * c),
                           (self.dim,))
        tokens = dense(patches, emb_k, emb_b)
        cls = self.param("cls_token", nn.initializers.normal(stddev=0.02),
                         (1, 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), tokens], axis=1)
        pos = self.param("pos_emb", nn.initializers.normal(stddev=0.02),
                         (1, ph * pw + 1, self.dim))
        tokens = tokens + pos
        tokens = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                             self.mlp_dim, name="encoder")(tokens)
        cls_out = _layer_norm(self, "ln_head", tokens[:, 0])
        hk = self.param("head_kernel", pt_init.torch_conv_default,
                        (self.dim, self.num_classes))
        hb = self.param("head_bias", pt_init.torch_conv_bias(self.dim),
                        (self.num_classes,))
        return dense(cls_out, hk, hb)
