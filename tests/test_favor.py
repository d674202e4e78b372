"""Chunked causal linear attention (ops/favor.py) == naive prefix sums.

The chunked-scan form must be algebraically identical to the
[B,N,H,M,D]-materializing cumsum it replaces (which OOMed at the T=64
reference shape — BASELINE.md zoo table), for both values and gradients,
including sequences that don't divide the chunk size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracker_tpu.ops.favor import causal_linear_attention


def _naive(qf, kf, v, eps=1e-6):
    kv = jnp.einsum("bnhm,bnhd->bnhmd", kf, v)
    kv_cum = jnp.cumsum(kv, axis=1)
    k_cum = jnp.cumsum(kf, axis=1)
    num = jnp.einsum("bnhm,bnhmd->bnhd", qf, kv_cum)
    den = jnp.einsum("bnhm,bnhm->bnh", qf, k_cum)[..., None]
    return num / (den + eps)


def _inputs(b=2, n=40, h=3, m=8, d=5, seed=0):
    rng = np.random.default_rng(seed)
    # Positive features, like FAVOR+ produces.
    qf = jnp.asarray(rng.uniform(0.01, 1.0, (b, n, h, m)), jnp.float32)
    kf = jnp.asarray(rng.uniform(0.01, 1.0, (b, n, h, m)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    return qf, kf, v


@pytest.mark.parametrize("chunk", [1, 7, 8, 40, 64])
def test_chunked_matches_naive(chunk):
    qf, kf, v = _inputs()
    ref = _naive(qf, kf, v)
    out = causal_linear_attention(qf, kf, v, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_naive():
    qf, kf, v = _inputs(n=24)

    def loss(fn):
        def f(args):
            return jnp.sum(fn(*args) ** 2)
        return f

    g_ref = jax.grad(loss(_naive))((qf, kf, v))
    g_new = jax.grad(loss(
        lambda a, b_, c: causal_linear_attention(a, b_, c, chunk_size=7)))(
            (qf, kf, v))
    for a, b_ in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_causality():
    # Output at position i must not change when later positions change.
    qf, kf, v = _inputs(n=20)
    out1 = causal_linear_attention(qf, kf, v, chunk_size=6)
    v2 = v.at[:, 10:].set(123.0)
    kf2 = kf.at[:, 10:].set(7.0)
    out2 = causal_linear_attention(qf, kf2, v2, chunk_size=6)
    np.testing.assert_allclose(np.asarray(out1[:, :10]),
                               np.asarray(out2[:, :10]), rtol=1e-6)
    assert not np.allclose(np.asarray(out1[:, 10:]), np.asarray(out2[:, 10:]))


def test_performer_model_runs_and_is_finite():
    # The model path at a small shape; the T=64 reference shape is the
    # BENCH_MODEL=performer TPU measurement.
    from pathtracker_tpu.models.transformers import PerformerModel

    m = PerformerModel(dimensions=32, timesteps=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 8, 8)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)["params"]
    out, _ = m.apply({"params": params}, x)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()
