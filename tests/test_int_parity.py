"""Golden-tensor parity of the InT circuit against an independent PyTorch
oracle implementing the reference equations (reference models/InT.py:145-179,
210-245). The oracle is written directly from the documented dynamics — it is
the test's ground truth, torch-cpu being a numerically unrelated stack.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pathtracker_tpu.models.int_circuit import InT  # noqa: E402

B, C, T, H, W, K = 3, 8, 5, 12, 12, 5


def torch_oracle(params, x, no_inh=False, lesions=(), nl=TF.softplus):
    """Reference InT forward in torch, from the equations. params holds numpy
    arrays in this framework's layouts ([Cin,Cout] matmul kernels, HWIO convs).
    x: [B,3,T,H,W] float32 torch tensor. Returns (logit, states, gates)."""
    p = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}

    def mm(name, z):  # 1x1 conv as matmul on NCHW: [B,C,H,W] -> [B,C,H,W]
        kern = p[f"{name}_kernel"]  # [Cin, Cout]
        bias = p[f"{name}_bias"]
        return torch.einsum("bchw,cd->bdhw", z, kern) + bias[None, :, None, None]

    def convk(name, z):  # KxK conv, HWIO -> torch OIHW
        w = p[name].permute(3, 2, 0, 1)
        return TF.conv2d(z, w, padding=w.shape[-1] // 2)

    def bn(idx, z):
        scale, bias = p[f"bn{idx}_scale"], p[f"bn{idx}_bias"]
        mean = z.mean(dim=(0, 2, 3))
        var = z.var(dim=(0, 2, 3), unbiased=False)
        return (z - mean[None, :, None, None]) / torch.sqrt(var + 1e-3)[None, :, None, None] \
            * scale[None, :, None, None] + bias[None, :, None, None]

    def scalar(name, default):
        if name in lesions:
            return torch.zeros(1)
        return p[name][None, :, None, None]

    xbn = nl(torch.einsum("bcthw,cd->bdthw", x, p["preproc_kernel"])
             + p["preproc_bias"][None, :, None, None, None])
    b = x.shape[0]
    exc = torch.zeros((b, xbn.shape[1], x.shape[3], x.shape[4]))
    inh = torch.zeros_like(exc)
    states, gates = [], []
    for t in range(x.shape[2]):
        inp = xbn[:, :, t]
        att = torch.sigmoid(mm("a_w_gate", inp) + mm("a_u_gate", exc))
        gated_exc = att * exc
        if not no_inh:
            inh_intx = bn(0, convk("w_inh", gated_exc))
            inh_hat = nl(inp - nl(inh_intx * (scalar("alpha", 1.0) * inh + scalar("mu", 0.0))))
            g_i = torch.sigmoid(mm("i_w_gate", inp) + mm("i_u_gate", inh))
            new_inh = (1 - g_i) * inh + g_i * inh_hat
            gate_inh_ref = inh
        else:
            new_inh = gated_exc
            gate_inh_ref = exc
        g_e = torch.sigmoid(mm("e_w_gate", gate_inh_ref) + mm("e_u_gate", gated_exc))
        exc_intx = bn(1, convk("w_exc", new_inh))
        exc_hat = nl(exc_intx * (scalar("kappa", 1.0) * new_inh + scalar("gamma", 0.0)))
        exc = (1 - g_e) * exc + g_e * exc_hat
        inh = new_inh
        states.append(torch.einsum("bchw,cd->bdhw", exc, p["readout_conv_kernel"])
                      + p["readout_conv_bias"][None, :, None, None])
        gates.append(att)

    out = torch.cat([states[-1], x[:, 2, 0][:, None]], 1)
    tk = p["target_conv_kernel"].permute(3, 2, 0, 1)
    out = TF.conv2d(out, tk, bias=p["target_conv_bias"], padding=2)
    out = out.mean(dim=(2, 3))
    logit = out @ p["readout_dense_kernel"] + p["readout_dense_bias"]
    return logit, torch.stack(states, 1), torch.stack(gates, 1)


def _build(model_kwargs):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, 3, T, H, W)).astype(np.float32)
    model = InT(dimensions=C, timesteps=T, kernel_size=K, **model_kwargs)
    variables = model.init(jax.random.key(1), jnp.asarray(x))
    flat = {k: np.asarray(v) for k, v in variables["params"].items()}
    return model, variables, flat, x


@pytest.mark.parametrize("case", [
    {},
    {"no_inh": True},
    {"lesion_alpha": True, "lesion_gamma": True},
    {"lesion_mu": True, "lesion_kappa": True},
    {"nl": "tanh"},
])
def test_int_forward_matches_oracle(case):
    model, variables, flat, x = _build(case)
    logit, states, gates = model.apply(variables, jnp.asarray(x), testmode=True)

    lesions = {f for f in ("alpha", "mu", "gamma", "kappa") if case.get(f"lesion_{f}")}
    nl = torch.tanh if case.get("nl") == "tanh" else TF.softplus
    tlogit, tstates, tgates = torch_oracle(
        flat, torch.from_numpy(x), no_inh=case.get("no_inh", False),
        lesions=lesions, nl=nl)

    # Cross-backend (XLA vs torch/oneDNN) float drift compounds through the
    # recurrence: measured ~1.4e-5 at T=1, ~3e-4 at T=5. 1e-3 still rejects
    # any equation error (wrong gating shifts values by O(0.1)).
    np.testing.assert_allclose(np.asarray(logit), tlogit.numpy(), atol=1e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(states), tstates.numpy(), atol=1e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(gates), tgates.numpy(), atol=1e-3, rtol=5e-3)


def test_int_single_step_tight():
    """At T=1 (no drift accumulation) parity must hold to ~1e-4."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, 3, 1, H, W)).astype(np.float32)
    model = InT(dimensions=C, timesteps=1, kernel_size=K)
    variables = model.init(jax.random.key(1), jnp.asarray(x))
    flat = {k: np.asarray(v) for k, v in variables["params"].items()}
    logit, states, gates = model.apply(variables, jnp.asarray(x), testmode=True)
    tlogit, tstates, tgates = torch_oracle(flat, torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(logit), tlogit.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(states), tstates.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gates), tgates.numpy(), atol=1e-4)


def test_int_train_eval_paths_agree():
    """testmode=False logit must equal testmode=True logit (same params)."""
    model, variables, _, x = _build({})
    l1, _ = model.apply(variables, jnp.asarray(x))
    l2, _, _ = model.apply(variables, jnp.asarray(x), testmode=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_int_gradients_finite_and_nonzero():
    model, variables, _, x = _build({})

    def loss_fn(params):
        logit, _ = model.apply({"params": params}, jnp.asarray(x))
        return jnp.mean(jax.nn.sigmoid(logit))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.all(np.isfinite(v)) for _, v in leaves)
    # Recurrent weights must receive gradient through the 5-step unroll.
    gnorms = {jax.tree_util.keystr(k): float(jnp.linalg.norm(v)) for k, v in leaves}
    for name in ("['w_exc']", "['w_inh']", "['preproc_kernel']", "['a_w_gate_kernel']"):
        assert gnorms[name] > 0, f"zero grad for {name}"
    # The unused `w` scalar must receive zero gradient (parity with reference).
    assert gnorms["['w']"] == 0


def test_int_init_distributions():
    """Init parity checks (reference models/InT.py:104-131)."""
    model, variables, flat, _ = _build({})
    # Orthogonal 1x1 gates: W W^T = I on the [O, I] view.
    w = flat["a_w_gate_kernel"].T  # [O, I]
    np.testing.assert_allclose(w @ w.T, np.eye(C), atol=1e-5)
    # Orthogonal KxK: flattened [O, I*k*k] rows orthonormal.
    we = np.transpose(flat["w_exc"], (3, 2, 0, 1)).reshape(C, -1)
    np.testing.assert_allclose(we @ we.T, np.eye(C), atol=1e-5)
    # Attention bias +1; i/e gate biases its negative.
    np.testing.assert_allclose(flat["a_w_gate_bias"], 1.0)
    np.testing.assert_allclose(flat["i_w_gate_bias"], -1.0)
    np.testing.assert_allclose(flat["e_u_gate_bias"], -1.0)
    # Scalars & BN.
    np.testing.assert_allclose(flat["alpha"], 1.0)
    np.testing.assert_allclose(flat["mu"], 0.0)
    np.testing.assert_allclose(flat["gamma"], 0.0)
    np.testing.assert_allclose(flat["kappa"], 1.0)
    np.testing.assert_allclose(flat["bn0_scale"], 0.1)
    np.testing.assert_allclose(flat["target_conv_bias"], 0.0)


def test_int_chrono_init_no_attention():
    model = InT(dimensions=C, timesteps=16, kernel_size=K, use_attention=False)
    x = jnp.zeros((1, 3, 4, H, W))
    flat = model.init(jax.random.key(0), x)["params"]
    iw = np.asarray(flat["i_w_gate_bias"])
    assert (iw >= 0).all() and (iw <= np.log(15) + 1e-6).all()
    np.testing.assert_allclose(np.asarray(flat["e_w_gate_bias"]), -iw)


def test_remat_policies_same_gradients():
    """'conv', 'conv_gates', and 'full' remat change what backward stores,
    never what it computes: loss and gradients must match bitwise-closely."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((B, 3, T, H, W)).astype(np.float32))
    y = jnp.asarray((np.arange(B) % 2).astype(np.float32))

    def grads_for(policy):
        model = InT(dimensions=C, timesteps=T, kernel_size=K,
                    remat_policy=policy)
        variables = model.init(jax.random.key(21), x)

        def loss(p):
            logit, _ = model.apply({"params": p}, x)
            return jnp.mean(
                jnp.maximum(logit[:, 0], 0) - logit[:, 0] * y
                + jnp.log1p(jnp.exp(-jnp.abs(logit[:, 0]))))

        lv, g = jax.value_and_grad(loss)(variables["params"])
        return float(lv), g

    l0, g0 = grads_for("conv")
    for policy in ("conv_gates", "full"):
        lv, g = grads_for(policy)
        assert abs(lv - l0) < 1e-6, (policy, lv, l0)
        for name in g0:
            np.testing.assert_allclose(
                np.asarray(g[name]), np.asarray(g0[name]),
                atol=1e-5, rtol=1e-4, err_msg=f"{policy}:{name}")
