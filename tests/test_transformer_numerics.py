"""Numerics for the in-repo transformer pieces (the reference pulled
timesformer/performer/lambda from pip packages; ours are reimplementations,
so their math gets direct tests):

- `_MHA` against a numpy softmax-attention oracle;
- FAVOR+ causal linear attention against EXACT causal softmax attention —
  averaging the estimator over independent orthogonal feature draws must
  converge to the exact result (the unbiasedness that makes Performer an
  attention approximation rather than a different model).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mha_matches_numpy_oracle():
    from pathtracker_tpu.models.transformers import _MHA

    b, n, dim, heads, dh = 2, 6, 8, 2, 4
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (b, n, dim)).astype(np.float32)
    mod = _MHA(dim=dim, heads=heads, dim_head=dh)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = {k: np.asarray(v) for k, v in variables["params"].items()}
    qkv = (x @ p["qkv_kernel"]).reshape(b, n, 3, heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = np.empty((b, n, heads, dh), np.float32)
    for bi in range(b):
        for hi in range(heads):
            logits = q[bi, :, hi] @ k[bi, :, hi].T / np.sqrt(dh)
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            ref[bi, :, hi] = w @ v[bi, :, hi]
    ref = ref.reshape(b, n, heads * dh) @ p["out_kernel"] + p["out_bias"]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def _favor_num_den(q, k, v, proj):
    from pathtracker_tpu.models.transformers import _favor_features

    qf = _favor_features(jnp.asarray(q), proj, is_query=True)
    kf = _favor_features(jnp.asarray(k), proj, is_query=False, seq_axis=1)
    kv = jnp.einsum("bnhm,bnhd->bnhmd", kf, jnp.asarray(v))
    num = jnp.einsum("bnhm,bnhmd->bnhd", qf, jnp.cumsum(kv, axis=1))
    den = jnp.einsum("bnhm,bnhm->bnh", qf, jnp.cumsum(kf, axis=1))[..., None]
    return np.asarray(num), np.asarray(den)


def test_favor_approximates_exact_causal_attention():
    """φ(q)·φ(k) is an unbiased estimate of exp(q·k/√d), so pooling the
    numerator/denominator sums over independent orthogonal feature draws must
    converge to exact causal softmax attention (num and den share each
    draw's stabilizer scaling, which therefore cancels in the pooled ratio
    only as both converge — hence the generous but finite tolerance)."""
    from pathtracker_tpu.ops import initializers as pt_init

    b, n, h, d, m = 1, 12, 1, 8, 1024
    rng = np.random.default_rng(3)
    q = rng.normal(0, 0.5, (b, n, h, d)).astype(np.float32)
    k = rng.normal(0, 0.5, (b, n, h, d)).astype(np.float32)
    v = rng.normal(0, 1.0, (b, n, h, d)).astype(np.float32)

    # exact causal softmax attention
    exact = np.empty_like(v)
    logits = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
    for i in range(n):
        w = np.exp(logits[0, 0, i, : i + 1] - logits[0, 0, i, : i + 1].max())
        w /= w.sum()
        exact[0, i, 0] = w @ v[0, : i + 1, 0]

    # pool num/den over independent orthogonal draws (per-draw stabilizers
    # scale num and den identically, so each draw contributes a consistent
    # pair; the pooled ratio converges to the exact attention)
    nums = np.zeros_like(v)
    dens = np.zeros((b, n, h, 1), np.float32)
    for r in range(8):
        proj = pt_init.favor_orthogonal_features(jax.random.key(r), m, d)
        proj = proj * np.sqrt(d)
        num, den = _favor_num_den(q, k, v, proj)
        # undo this draw's stabilizer scale by normalizing den to mean 1
        s = den.mean()
        nums += num / s
        dens += den / s
    est = nums / dens

    # skip the first two causal positions (1-2 keys: estimator variance
    # dominates any pooling)
    err = (np.abs(est - exact)[:, 2:].mean()
           / (np.abs(exact)[:, 2:].mean() + 1e-9))
    assert err < 0.12, f"mean relative error {err:.3f}"
