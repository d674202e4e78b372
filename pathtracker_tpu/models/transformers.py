"""Transformer baselines — reference models/transformers.py.

The reference wrapped three pip packages (timesformer-pytorch,
performer-pytorch, lambda-networks); here each architecture is implemented
in-repo in JAX:

  TransformerModel  TimeSformer with divided space-time attention
                    (arXiv:2102.05095): per layer, temporal attention across
                    frames at fixed spatial position, then spatial attention
                    within each frame, then MLP — all prenorm residual, with
                    a cls token that joins every attention group. Reference
                    config (transformers.py:30-41): image 32 / patch 32
                    (=> 1 spatial token per frame), dim=dimensions, depth 2,
                    heads 4, 1 class, input BCTHW -> BTCHW.
  PerformerModel    1x1x1 preproc to 32 channels, causal FAVOR+ linear
                    attention over the (T*H*W)-token sequence (depth 1,
                    heads 4, dim_head 32), last-frame slice + the shared
                    target-conditioned readout (reference :83-133).
  LambdaModel       LambdaLayer (arXiv:2102.08602) over 2D maps whose
                    channels are (C*T): content + positional lambdas with
                    absolute position embeddings (n=32), 4 heads, k=8, u=4,
                    then the target readout with a (C*T+1)-channel conv
                    (reference :152-198).

All three keep the reference contract: (logit [B,1], jv_penalty). testmode
returns (logit, None, None) — these baselines have no recurrent states/gates
to expose (the reference's testmode branches referenced an undefined
`states` and would have crashed; SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import favor
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import conv2d, dense, global_avg_pool, softplus


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


class _MHA(nn.Module):
    """Standard softmax multi-head attention over [B, N, D] tokens."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        qkv_k = self.param("qkv_kernel", pt_init.torch_conv_default,
                           (self.dim, inner * 3))
        out_k = self.param("out_kernel", pt_init.torch_conv_default, (inner, self.dim))
        out_b = self.param("out_bias", pt_init.torch_conv_bias(inner), (self.dim,))
        b, n, _ = x.shape
        qkv = dense(x, qkv_k).reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(self.dim_head)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return dense(out, out_k, out_b)


class _MLP(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        k1 = self.param("fc1_kernel", pt_init.torch_conv_default, (self.dim, self.hidden))
        b1 = self.param("fc1_bias", pt_init.torch_conv_bias(self.dim), (self.hidden,))
        k2 = self.param("fc2_kernel", pt_init.torch_conv_default, (self.hidden, self.dim))
        b2 = self.param("fc2_bias", pt_init.torch_conv_bias(self.hidden), (self.dim,))
        return dense(jax.nn.gelu(dense(x, k1, b1)), k2, b2)


def _layer_norm(mod, name, x):
    scale = mod.param(f"{name}_scale", nn.initializers.ones, (x.shape[-1],))
    bias = mod.param(f"{name}_bias", nn.initializers.zeros, (x.shape[-1],))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


# ---------------------------------------------------------------------------
# TimeSformer
# ---------------------------------------------------------------------------


class TransformerModel(nn.Module):
    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    patch_size: int = 32
    depth: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        d = self.dimensions
        ps = self.patch_size
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,C]
        b, t, h, w_, c = xc.shape
        ph, pw = h // ps, w_ // ps  # 1x1 for 32x32 images with patch 32
        n_sp = ph * pw

        # Patchify -> linear embed
        patches = xc.reshape(b, t, ph, ps, pw, ps, c)
        patches = jnp.transpose(patches, (0, 1, 2, 4, 3, 5, 6))
        patches = patches.reshape(b, t, n_sp, ps * ps * c)
        emb_k = self.param("patch_kernel", pt_init.torch_conv_default,
                           (ps * ps * c, d))
        emb_b = self.param("patch_bias", pt_init.torch_conv_bias(ps * ps * c), (d,))
        tokens = dense(patches, emb_k, emb_b)  # [B,T,P,D]
        pos = self.param("pos_emb", nn.initializers.normal(stddev=0.02),
                         (1, t, n_sp, d))
        tokens = tokens + pos
        cls = self.param("cls_token", nn.initializers.normal(stddev=0.02), (1, 1, d))
        cls = jnp.broadcast_to(cls, (b, 1, d))

        for layer in range(self.depth):
            # Temporal attention: sequences are (cls + the T tokens at one
            # spatial site); cls joins every group and takes the mean update.
            seq = jnp.concatenate(
                [jnp.broadcast_to(cls[:, None], (b, n_sp, 1, d)),
                 jnp.transpose(tokens, (0, 2, 1, 3))], axis=2)  # [B,P,1+T,D]
            seq_n = _layer_norm(self, f"ln_t{layer}", seq)
            att = _MHA(d, self.heads, d, name=f"time_attn{layer}")(
                seq_n.reshape(b * n_sp, 1 + t, d)).reshape(b, n_sp, 1 + t, d)
            cls = cls + jnp.mean(att[:, :, 0], axis=1, keepdims=True)
            tokens = tokens + jnp.transpose(att[:, :, 1:], (0, 2, 1, 3))

            # Spatial attention: sequences are (cls + the P tokens of one frame).
            seq = jnp.concatenate(
                [jnp.broadcast_to(cls[:, None], (b, t, 1, d)), tokens], axis=2)
            seq_n = _layer_norm(self, f"ln_s{layer}", seq)
            att = _MHA(d, self.heads, d, name=f"space_attn{layer}")(
                seq_n.reshape(b * t, 1 + n_sp, d)).reshape(b, t, 1 + n_sp, d)
            cls = cls + jnp.mean(att[:, :, 0], axis=1, keepdims=True)
            tokens = tokens + att[:, :, 1:]

            # MLP on all tokens (cls included).
            tokens = tokens + _MLP(d, d * 4, name=f"mlp{layer}")(
                _layer_norm(self, f"ln_m{layer}", tokens))
            cls = cls + _MLP(d, d * 4, name=f"mlp_cls{layer}")(
                _layer_norm(self, f"ln_mc{layer}", cls))

        cls_out = _layer_norm(self, "ln_out", cls[:, 0])
        head_k = self.param("head_kernel", pt_init.torch_conv_default, (d, 1))
        head_b = self.param("head_bias", pt_init.torch_conv_bias(d), (1,))
        logit = dense(cls_out, head_k, head_b)
        if testmode:
            return logit, None, None
        return logit, jnp.ones((1,), logit.dtype)


# ---------------------------------------------------------------------------
# Performer (causal FAVOR+)
# ---------------------------------------------------------------------------


def _favor_features(x, proj, is_query: bool, seq_axis: int = 1):
    """Positive softmax-kernel features (FAVOR+): x [..., d], proj [m, d].

    Stabilizer placement matters: for queries a per-position max cancels in
    the attention ratio (numerator and denominator share it), but for keys
    it must be GLOBAL over the sequence — a per-key max would reweight key j
    against key j' by exp(max_j - max_j') and change the attention
    distribution (same rule as performer-pytorch's softmax_kernel)."""
    d = x.shape[-1]
    x = x / (d ** 0.25)
    xw = jnp.einsum("...d,md->...m", x, proj)
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / 2.0
    m = proj.shape[0]
    if is_query:
        stab = jnp.max(xw, axis=-1, keepdims=True)
    else:
        stab = jnp.max(xw, axis=(seq_axis, -1), keepdims=True)
    return jnp.exp(xw - sq - jax.lax.stop_gradient(stab)) / np.sqrt(m) + 1e-6


class PerformerModel(nn.Module):
    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    heads: int = 4
    depth: int = 1
    n_features: int = 64

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = 32  # reference pins hgru_size=32 regardless of `dimensions` (:80)
        xc = common.bcthw_to_bthwc(x)
        b, t, h, w_, _ = xc.shape
        pre_k = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_b = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        tokens = dense(xc, pre_k, pre_b).reshape(b, t * h * w_, c)

        dh = c  # dim_head = hgru_size (reference :85)
        inner = self.heads * dh
        # Fixed orthogonal random features (the reference redraws every 1000
        # steps; a fixed draw is the deterministic-inference equivalent).
        # Stacked d x d Haar blocks with unit-norm rows — see
        # pt_init.favor_orthogonal_features for why plain orthogonal rows
        # degenerate when n_features > dim_head.
        proj = self.param("favor_proj",
                          lambda key, shape: pt_init.favor_orthogonal_features(
                              key, shape[0], shape[1], jnp.float32),
                          (self.n_features, dh))
        proj = jax.lax.stop_gradient(proj) * np.sqrt(dh)

        for layer in range(self.depth):
            z = _layer_norm(self, f"ln_a{layer}", tokens)
            qkv_k = self.param(f"attn{layer}_qkv", pt_init.torch_conv_default,
                               (c, inner * 3))
            out_k = self.param(f"attn{layer}_out", pt_init.torch_conv_default,
                               (inner, c))
            qkv = dense(z, qkv_k).reshape(b, -1, 3, self.heads, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            qf = _favor_features(q, proj, is_query=True)  # [B,N,H,M]
            kf = _favor_features(k, proj, is_query=False, seq_axis=1)
            # Causal linear attention in the chunked-scan form: the naive
            # prefix-sum over kf x v outer products materializes
            # [B, N, H, M, D] — 137 GB at the T=64 reference shape, measured
            # OOM (BASELINE.md zoo table). ops/favor.py carries only the
            # running [B,H,M,D] state; chunk = one frame of tokens.
            att = favor.causal_linear_attention(
                qf, kf, v, chunk_size=h * w_).reshape(b, -1, inner)
            tokens = tokens + dense(att, out_k)
            tokens = tokens + _MLP(c, c * 4, name=f"ff{layer}")(
                _layer_norm(self, f"ln_f{layer}", tokens))

        # Last-frame slice -> target-conditioned readout (reference :121-129).
        last = tokens.reshape(b, t, h, w_, c)[:, -1]
        tgt_k = self.param("target_conv_kernel", pt_init.torch_conv_default,
                           (5, 5, c + 1, 1))
        tgt_b = self.param("target_conv_bias", nn.initializers.zeros, (1,))
        merged = jnp.concatenate([last, xc[:, 0, :, :, 2][..., None]], axis=-1)
        out = conv2d(merged, tgt_k, tgt_b)
        out = global_avg_pool(out)
        d_k = self.param("readout_dense_kernel", pt_init.torch_conv_default, (1, 1))
        d_b = self.param("readout_dense_bias", pt_init.torch_conv_bias(1), (1,))
        logit = dense(out, d_k, d_b)
        if testmode:
            return logit, None, None
        return logit, jnp.ones((1,), logit.dtype)


# ---------------------------------------------------------------------------
# Lambda layer
# ---------------------------------------------------------------------------


class LambdaModel(nn.Module):
    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    heads: int = 4
    dim_k: int = 8
    dim_u: int = 4

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        xc = common.bcthw_to_bthwc(x)
        b, t, h, w_, _ = xc.shape
        pre_k = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_b = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        xbn = softplus(dense(xc, pre_k, pre_b))  # [B,T,H,W,C]

        # Fold time into channels: [B,H,W,C*T] (reference :186 view).
        feat = jnp.transpose(xbn, (0, 2, 3, 1, 4)).reshape(b, h, w_, t * c)
        dim = t * c
        kdim, u, heads = self.dim_k, self.dim_u, self.heads
        v_dim = dim // heads
        n = h * w_

        q_k = self.param("to_q_kernel", pt_init.torch_conv_default, (dim, kdim * heads))
        k_k = self.param("to_k_kernel", pt_init.torch_conv_default, (dim, kdim * u))
        v_k = self.param("to_v_kernel", pt_init.torch_conv_default, (dim, v_dim * u))
        pos = self.param("pos_emb", nn.initializers.normal(stddev=1.0),
                         (n, n, kdim, u))

        flat = feat.reshape(b, n, dim)
        q = dense(flat, q_k).reshape(b, n, heads, kdim)
        kk = dense(flat, k_k).reshape(b, n, kdim, u)
        v = dense(flat, v_k).reshape(b, n, v_dim, u)

        # Normalize q and v per feature (the lambda layer's BN equivalents,
        # batch-stat like the rest of this framework).
        def _bn(name, z):
            scale = self.param(f"{name}_scale", nn.initializers.ones, z.shape[2:])
            bias = self.param(f"{name}_bias", nn.initializers.zeros, z.shape[2:])
            mean = jnp.mean(z, axis=(0, 1))
            var = jnp.var(z, axis=(0, 1))
            return (z - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        q = _bn("bn_q", q)
        v = _bn("bn_v", v)
        kk = jax.nn.softmax(kk, axis=1)  # softmax over context positions

        lam_c = jnp.einsum("bmku,bmvu->bkv", kk, v)  # content lambda
        y_c = jnp.einsum("bnhk,bkv->bnhv", q, lam_c)
        lam_p = jnp.einsum("nmku,bmvu->bnkv", pos, v)  # position lambdas
        y_p = jnp.einsum("bnhk,bnkv->bnhv", q, lam_p)
        out = (y_c + y_p).reshape(b, h, w_, heads * v_dim)

        tgt_k = self.param("target_conv_kernel", pt_init.torch_conv_default,
                           (5, 5, dim + 1, 1))
        tgt_b = self.param("target_conv_bias", nn.initializers.zeros, (1,))
        merged = jnp.concatenate([out, xc[:, 0, :, :, 2][..., None]], axis=-1)
        z = conv2d(merged, tgt_k, tgt_b)
        z = global_avg_pool(z)
        d_k = self.param("readout_dense_kernel", pt_init.torch_conv_default, (1, 1))
        d_b = self.param("readout_dense_bias", pt_init.torch_conv_bias(1), (1,))
        logit = dense(z, d_k, d_b)
        if testmode:
            return logit, None, None
        return logit, jnp.ones((1,), logit.dtype)
