"""Correlation (cost volume) op: Pallas kernel vs XLA reference, and the
custom-VJP gradient vs autodiff of the XLA formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracker_tpu.ops.correlation import (correlation, correlation_pallas,
                                             correlation_xla)


def _inputs(b=2, h=8, w=8, c=4, seed=0):
    rng = np.random.default_rng(seed)
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    return f1, f2


def test_xla_matches_naive():
    f1, f2 = _inputs()
    patch = 5
    out = np.asarray(correlation_xla(f1, f2, patch=patch))
    a, b2 = np.asarray(f1), np.asarray(f2)
    r = (patch - 1) // 2
    bp = np.pad(b2, ((0, 0), (r, r), (r, r), (0, 0)))
    for (bi, y, x, d) in [(0, 0, 0, 0), (1, 3, 4, 12), (0, 7, 7, 24), (1, 2, 6, 7)]:
        dy, dx = d // patch, d % patch
        expect = np.sum(a[bi, y, x] * bp[bi, y + dy, x + dx])
        np.testing.assert_allclose(out[bi, y, x, d], expect, rtol=1e-5)


def test_pallas_matches_xla():
    f1, f2 = _inputs()
    want = np.asarray(correlation_xla(f1, f2, patch=5))
    got = np.asarray(correlation_pallas(f1, f2, patch=5, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_matches_xla_15():
    f1, f2 = _inputs(b=1, h=16, w=16, c=8, seed=1)
    want = np.asarray(correlation_xla(f1, f2, patch=15))
    got = np.asarray(correlation_pallas(f1, f2, patch=15, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff():
    f1, f2 = _inputs(b=1, h=6, w=6, c=3)

    def loss_custom(a, b):
        return jnp.sum(jnp.tanh(correlation(a, b, 3)))

    def loss_ref(a, b):
        return jnp.sum(jnp.tanh(correlation_xla(a, b, 3)))

    g1 = jax.grad(loss_custom, argnums=(0, 1))(f1, f2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pallas_matches_xla_dilated():
    f1, f2 = _inputs(b=1, h=12, w=12, c=4, seed=2)
    want = np.asarray(correlation_xla(f1, f2, patch=5, dilation=2))
    got = np.asarray(correlation_pallas(f1, f2, patch=5, dilation=2,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
