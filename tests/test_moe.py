"""Expert parallelism (parallel/moe.py): the expert-sharded MoE must be
numerically identical to the single-device formulation — forward AND
gradients — on the virtual 8-device mesh, pure ep and composed dp x ep.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pathtracker_tpu.parallel.moe import (init_moe_params, moe_apply,
                                          moe_apply_sharded,
                                          shard_moe_params)

N_EXPERTS, D_IN, D_HID = 8, 16, 32


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.key(0), N_EXPERTS, D_IN, D_HID)
    x = jax.random.normal(jax.random.key(1), (16, D_IN))
    return params, x


def test_ep_matches_single_device(setup):
    params, x = setup
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("expert",))
    sharded = shard_moe_params(mesh, params)
    want = np.asarray(moe_apply(params, x))
    got = np.asarray(jax.jit(
        lambda p, v: moe_apply_sharded(mesh, p, v))(sharded, x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ep_gradients_match(setup):
    params, x = setup
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("expert",))
    sharded = shard_moe_params(mesh, params)

    def loss_ref(p):
        return jnp.mean(moe_apply(p, x) ** 2)

    def loss_ep(p):
        return jnp.mean(moe_apply_sharded(mesh, p, x) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_ep = jax.jit(jax.grad(loss_ep))(sharded)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_ep[k]), np.asarray(g_ref[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_dp_x_ep_composition(setup):
    params, x = setup
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "expert"))
    sharded = shard_moe_params(mesh, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    want = np.asarray(moe_apply(params, x))
    got = np.asarray(jax.jit(lambda p, v: moe_apply_sharded(
        mesh, p, v, batch_axis="data"))(sharded, xs))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # Gradient psums over BOTH axes must still match the dense reference.
    def loss_ep(p):
        return jnp.mean(moe_apply_sharded(mesh, p, xs,
                                          batch_axis="data") ** 2)

    g_ref = jax.grad(lambda p: jnp.mean(moe_apply(p, x) ** 2))(params)
    g_ep = jax.jit(jax.grad(loss_ep))(sharded)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_ep[k]), np.asarray(g_ref[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


def test_gates_are_top1(setup):
    params, x = setup
    from pathtracker_tpu.parallel.moe import _gates

    g = np.asarray(_gates(params["router_w"], x))
    assert ((g > 0).sum(axis=1) == 1).all()  # exactly one expert per row
    assert (g.max(axis=1) <= 1.0).all() and (g.max(axis=1) > 0).all()
