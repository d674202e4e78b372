"""Neumann-series RBP custom VJP vs ground truth (SURVEY.md §4 test item f):
on a contractive linear fixed-point map the Neumann series converges to the
exact implicit gradient, so the RBP gradient must match (I - J^T)^{-1} and
finite differences of the fully-converged fixed point."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracker_tpu.ops.penalty import jacobian_penalty
from pathtracker_tpu.ops.rbp import neumann_rbp


def _contractive_step(aux, state):
    w, b = aux
    return jnp.tanh(state @ w + b) * 0.5


def test_rbp_matches_implicit_gradient():
    rng = np.random.default_rng(0)
    n = 4
    w = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))

    # Converge to the fixed point (well within machine precision).
    state = jnp.zeros((1, n))
    for _ in range(200):
        state = _contractive_step((w, b), state)

    def loss_rbp(w_):
        last = neumann_rbp(_contractive_step, (w_, b), state, 40)
        return 1e-3 * jnp.sum(last ** 2)

    g_rbp = jax.grad(loss_rbp)(w)

    # Ground truth via the implicit function theorem: dL/dw with
    # s* = f(w, s*) gives dL/dw = (dL/ds*) (I - J_s)^{-1} J_w, which equals
    # differentiating K unrolled steps from the fixed point for large K.
    def loss_unrolled(w_):
        s = jax.lax.stop_gradient(state)
        for _ in range(60):
            s = _contractive_step((w_, b), s)
        return 1e-3 * jnp.sum(s ** 2)

    g_true = jax.grad(loss_unrolled)(w)
    np.testing.assert_allclose(np.asarray(g_rbp), np.asarray(g_true),
                               rtol=2e-3, atol=1e-5)


def test_rbp_matches_finite_differences():
    rng = np.random.default_rng(1)
    n = 3
    w = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)) * 0.25
    b = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    state = jnp.zeros((1, n))
    for _ in range(300):
        state = _contractive_step((w, b), state)

    def loss_of_w(w_flat):
        w_ = w_flat.reshape(n, n)
        s = jnp.zeros((1, n))
        for _ in range(300):
            s = _contractive_step((w_, b), s)
        return float(1e-3 * jnp.sum(s ** 2))

    def loss_rbp(w_):
        last = neumann_rbp(_contractive_step, (w_, b), state, 50)
        return 1e-3 * jnp.sum(last ** 2)

    g_rbp = np.asarray(jax.grad(loss_rbp)(w)).ravel()

    w_flat = np.asarray(w, dtype=np.float64).ravel()
    eps = 1e-3
    g_fd = np.zeros_like(w_flat)
    for i in range(w_flat.size):
        wp, wm = w_flat.copy(), w_flat.copy()
        wp[i] += eps
        wm[i] -= eps
        g_fd[i] = (loss_of_w(jnp.asarray(wp, jnp.float32))
                   - loss_of_w(jnp.asarray(wm, jnp.float32))) / (2 * eps)
    np.testing.assert_allclose(g_rbp, g_fd, rtol=5e-2, atol=1e-3)


def test_jacobian_penalty_semantics():
    """(||J^T 1|| clamp shape) — penalty is zero for a contraction with small
    gain and positive when the map amplifies (reference convlstm.py:154-163)."""

    def step_small(s):
        return 0.1 * s

    def step_big(s):
        return 3.0 * s

    s = jnp.ones((2, 4))
    pen_small = jacobian_penalty(step_small, s)
    pen_big = jacobian_penalty(step_big, s)
    assert float(pen_small) == 0.0
    assert float(pen_big) > 0.0


def test_int_rbp_trains():
    """InT with grad_method='rbp': forward matches bptt (same equations) and
    params receive finite gradients through the Neumann VJP."""
    from pathtracker_tpu.models.int_circuit import InT

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 10, 10)).astype(np.float32))
    bptt = InT(dimensions=6, timesteps=4, kernel_size=3)
    variables = bptt.init(jax.random.key(0), x)
    rbp = InT(dimensions=6, timesteps=4, kernel_size=3, grad_method="rbp")

    l_bptt, _ = bptt.apply(variables, x)
    l_rbp, _ = rbp.apply(variables, x)
    np.testing.assert_allclose(np.asarray(l_bptt), np.asarray(l_rbp),
                               rtol=1e-5, atol=1e-6)

    def loss(params):
        logit, _ = rbp.apply({"params": params}, x)
        return jnp.mean(jax.nn.sigmoid(logit))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.all(np.isfinite(v)) for _, v in leaves)
    gnorms = {jax.tree_util.keystr(k): float(jnp.linalg.norm(v))
              for k, v in leaves}
    # Recurrent weights get gradient through the final RBP step.
    for name in ("['w_exc']", "['w_inh']", "['readout_dense_kernel']"):
        assert gnorms[name] > 0, f"zero grad for {name}"
