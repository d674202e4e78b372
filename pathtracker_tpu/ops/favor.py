"""Chunked causal linear attention (FAVOR+ numerator/denominator).

The reference's Performer baseline ran causal FAVOR+ from the
performer-pytorch package (reference models/transformers.py:83-90); the
natural JAX translation — prefix sums over the per-position outer products
``kf x v`` — materializes a [B, N, H, M, D] tensor. At the PathTracker
reference shape (N = T*H*W = 65536 tokens, H=4 heads, M=64 features,
D=32) that is 137 GB at batch 64: measured OOM on a 16 GB chip
(BASELINE.md zoo table note).

This module computes the same quantity in the chunked parallel form used
by fast linear-attention kernels: split the sequence into chunks of S
tokens and lax.scan over chunks carrying only the running prefix state
(KV [B,H,M,D] and Ksum [B,H,M]). Per chunk,

    intra = (Qf Kf^T . causal_mask) V        # exact within-chunk causality
    inter = Qf . KV_state                     # all previous chunks
    den   = (Qf Kf^T . causal_mask) 1 + Qf . Ksum
    state += Kf^T V;  Ksum += sum_s Kf

which is algebraically identical to the full prefix sum but peaks at
O(B*H*S^2) transient memory instead of O(B*N*H*M*D) resident. The scan
step is wrapped in jax.checkpoint so backward recomputes the chunk
intermediates instead of stacking them across all N/S steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_linear_attention(qf, kf, v, chunk_size: int = 1024,
                            eps: float = 1e-6):
    """Causal FAVOR+ attention output for positive features.

    Args:
      qf: [B, N, H, M] query features (positive).
      kf: [B, N, H, M] key features (positive).
      v:  [B, N, H, D] values.
      chunk_size: tokens per scan step; the sequence is zero-padded up to a
        multiple (padded positions produce garbage outputs that are sliced
        off; their kf contribution is zero so the state stays exact).

    Returns [B, N, H, D] = softmax-kernel-linearized causal attention.
    """
    b, n, h, m = qf.shape
    d = v.shape[-1]
    s = min(chunk_size, n)
    pad = (-n) % s
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (n + pad) // s

    # [nc, B, H, S, M/D] chunk-major layout for the scan.
    def to_chunks(z):
        return z.reshape(b, nc, s, h, -1).transpose(1, 0, 3, 2, 4)

    qc, kc, vc = to_chunks(qf), to_chunks(kf), to_chunks(v)
    mask = jnp.tril(jnp.ones((s, s), qf.dtype))

    @jax.checkpoint
    def step(carry, chunk):
        kv, ksum = carry  # [B,H,M,D], [B,H,M]
        q, k, val = chunk
        attn = jnp.einsum("bhsm,bhtm->bhst", q, k) * mask
        num = jnp.einsum("bhst,bhtd->bhsd", attn, val)
        num = num + jnp.einsum("bhsm,bhmd->bhsd", q, kv)
        den = jnp.sum(attn, axis=-1) + jnp.einsum("bhsm,bhm->bhs", q, ksum)
        out = num / (den[..., None] + eps)
        kv = kv + jnp.einsum("bhsm,bhsd->bhmd", k, val)
        ksum = ksum + jnp.sum(k, axis=2)
        return (kv, ksum), out

    init = (jnp.zeros((b, h, m, d), qf.dtype), jnp.zeros((b, h, m), qf.dtype))
    _, out = jax.lax.scan(step, init, (qc, kc, vc))  # [nc,B,H,S,D]
    out = out.transpose(1, 0, 3, 2, 4).reshape(b, nc * s, h, d)
    return out[:, :n]
