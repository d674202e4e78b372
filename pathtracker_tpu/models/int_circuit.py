"""The InT gated recurrent circuit (the reference's primary model).

Re-derivation of reference models/InT.py (rCell :58, InT :182, FC :248) as a
TPU-first `lax.scan`. Per-step dynamics (reference models/InT.py:145-179), all
in softplus range, state = (inhibition, excitation):

    att   = sigmoid(a_w(x_t) + a_u(exc))                  # attention spotlight
    g_exc = att * exc
    inh~  = sp(x_t - sp(BN0(conv(g_exc, w_inh)) * (alpha*inh + mu)))
    g_i   = sigmoid(i_w(x_t) + i_u(inh))
    inh'  = (1-g_i)*inh + g_i*inh~
    g_e   = sigmoid(e_w(inh) + e_u(g_exc))                # uses the OLD inh
    exc~  = sp(BN1(conv(inh', w_exc)) * (kappa*inh' + gamma))
    exc'  = (1-g_e)*exc + g_e*exc~

with a 1x1x1 Conv3d+softplus preproc (3 -> C channels) before the scan and the
target-conditioned readout after it. `no_inh` collapses the inhibition branch
(inh' = g_exc, and the e-gate then reads the OLD exc, reference
models/InT.py:168); the four lesion switches freeze alpha/mu/gamma/kappa at 0
(the reference's intent: its `.weight = 0.` on an nn.Parameter was a no-op
accident, see SURVEY.md header).

TPU-first structure:
  * the input-dependent gate projections a_w(x_t) and i_w(x_t) plus the
    preproc are hoisted out of the scan into batched [B*T*H*W, C] matmuls
    (MXU-shaped), so the sequential step only carries state-dependent work;
  * per-step BatchNorm uses current-batch statistics (the reference's
    track_running_stats=False), making the whole model a pure function;
  * the step is `jax.checkpoint`-ed so 64-128 frame BPTT stores only the
    (inh, exc) carry per step instead of every intermediate.

BatchNorm inside the scan computes stats over the *local* batch under plain
jit over a data-sharded mesh XLA turns these into global-batch (sync) stats;
this differs from the reference's DataParallel per-replica stats, which is a
deliberate upgrade (documented in SURVEY.md §7 hard-part b).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name as _ckpt_name

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import (batch_norm, conv2d, dense,
                                        scan_unroll, softplus)


def _nl(name: str):
    return {"softplus": softplus, "tanh": jnp.tanh}[name]


def _int_cell_step_fused_core(shape, w_inh, w_exc, fp, xt, carry):
    """Fused-kernel variant of the default cell (attention on, inhibition
    on, softplus, mixed bf16): the three elementwise/gate phases run as
    Pallas kernels with hand-derived backward (ops/int_fused.py); the two
    k x k convs and the BN statistics stay in XLA. `fp` carries the packed
    parameter forms (block-diagonal gate matrices, lane-tiled per-channel
    params) hoisted out of the scan.

    Everything flows in the PACKED [B*H*W*C/128, 128] layout (`shape` is
    the static [B,H,W,C] spatial view, entered only at the two convs):
    packed arrays have a 128-lane minor dim, so neither HBM tiling nor the
    Pallas block specs pad them — C=32-minor layouts pad 4x in HBM, which
    is the difference between fitting and OOM at batch 128 (see the
    step-remat note below). Numerics match _int_cell_step on the mixed
    path (tests/test_int_fused.py)."""
    from pathtracker_tpu.ops import int_fused as F

    inp_p, attx_p, gix_p = xt
    inh_p, exc_p = carry
    c = shape[-1]

    def fconv(z_p, kern):
        y = conv2d(F.unpack(z_p, shape), kern,
                   mxu_dtype=jnp.bfloat16, keep_mxu_dtype=True)
        return F.pack(y)

    gated_p, att_p = F.k1_attention(exc_p, attx_p, fp["a_u_bd"],
                                    fp["a_u_b_t"])
    ci_p = fconv(gated_p, w_inh)
    mean0, rstd0 = F.packed_stats(ci_p, c)
    new_inh_p = F.k2_inhibition(
        ci_p, mean0, rstd0, fp["bn0_scale_t"], fp["bn0_bias_t"],
        inp_p, gix_p, inh_p, fp["i_u_bd"], fp["i_u_b_t"],
        fp["alpha_t"], fp["mu_t"])
    ce_p = fconv(new_inh_p, w_exc)
    mean1, rstd1 = F.packed_stats(ce_p, c)
    new_exc_p = F.k3_excitation(
        ce_p, mean1, rstd1, fp["bn1_scale_t"], fp["bn1_bias_t"],
        new_inh_p, inh_p, gated_p, exc_p, fp["e_w_bd"], fp["e_w_b_t"],
        fp["e_u_bd"], fp["e_u_b_t"], fp["kappa_t"], fp["gamma_t"])
    return (new_inh_p, new_exc_p), att_p


# Step-level manual remat: `jax.checkpoint` policies cannot drop residuals
# saved by custom_vjp calls (they are opaque to partial eval), so wrapping
# the per-phase kernels in the usual policy-remat stacks every phase's
# inputs across all T steps (~12 GiB at batch 128 — OOMs the chip). This
# custom_vjp saves ONLY the step inputs and re-runs the fused forward under
# jax.vjp inside the backward, where the per-kernel custom bwds execute
# transiently. Memory then matches the pure-XLA remat path.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _int_cell_step_fused(shape, w_inh, w_exc, fp, xt, carry):
    return _int_cell_step_fused_core(shape, w_inh, w_exc, fp, xt, carry)


def _fused_step_fwd(shape, w_inh, w_exc, fp, xt, carry):
    out = _int_cell_step_fused_core(shape, w_inh, w_exc, fp, xt, carry)
    return out, (w_inh, w_exc, fp, xt, carry)


def _fused_step_bwd(shape, res, cots):
    _, vjp = jax.vjp(
        lambda *a: _int_cell_step_fused_core(shape, *a), *res)
    return vjp(cots)


_int_cell_step_fused.defvjp(_fused_step_fwd, _fused_step_bwd)


def _fused_params(cp, mxu, c):
    """Packed parameter forms for the fused cell — built once per call;
    differentiable (tile/blockdiag backprop sums the copies)."""
    from pathtracker_tpu.ops import int_fused as F

    t = functools.partial(F.tile_param, c=c)
    return dict(
        a_u_bd=F.blockdiag(cp["a_u"].astype(mxu), c),
        a_u_b_t=t(cp["a_u_b"]),
        i_u_bd=F.blockdiag(cp["i_u"].astype(mxu), c),
        i_u_b_t=t(cp["i_u_b"]),
        e_w_bd=F.blockdiag(cp["e_w"].astype(mxu), c),
        e_w_b_t=t(cp["e_w_b"]),
        e_u_bd=F.blockdiag(cp["e_u"].astype(mxu), c),
        e_u_b_t=t(cp["e_u_b"]),
        alpha_t=t(cp["alpha"]), mu_t=t(cp["mu"]),
        kappa_t=t(cp["kappa"]), gamma_t=t(cp["gamma"]),
        bn0_scale_t=t(cp["bn0_scale"]), bn0_bias_t=t(cp["bn0_bias"]),
        bn1_scale_t=t(cp["bn1_scale"]), bn1_bias_t=t(cp["bn1_bias"]),
    )


def _int_cell_step(cp, xt, carry, *, use_attention, no_inh, act, mxu,
                   save_convs=True):
    """One rCell step as a pure function of (param dict, hoisted inputs,
    carry) — shared by the BPTT scan and the RBP custom-VJP path (which
    forbids closed-over tracers). Returns ((new_inh, new_exc), att)."""
    inp, att_x, gi_x = xt
    inh, exc = carry

    def fdense(z, kern, bias=None):
        y = dense(z, kern, bias, mxu_dtype=mxu)
        # Tagged so remat_policy='conv_gates' can save these four in-scan
        # matmul outputs instead of recomputing them in backward. In the
        # mixed path they are bf16 in forward already, so saving them is
        # bit-identical to recomputation — a pure speed/memory trade.
        return _ckpt_name(y, "cell_gate")

    def fconv(z, kern):
        y = conv2d(z, kern, mxu_dtype=mxu, keep_mxu_dtype=True)
        if save_convs:
            y = _ckpt_name(y, "cell_conv")
        return y.astype(jnp.float32) if mxu is not None else y

    if use_attention:
        att = jax.nn.sigmoid(att_x + fdense(exc, cp["a_u"], cp["a_u_b"]))
        gated_exc = att * exc
    else:
        att = jnp.ones_like(exc)
        gated_exc = exc
    if not no_inh:
        inh_intx = batch_norm(fconv(gated_exc, cp["w_inh"]),
                              cp["bn0_scale"], cp["bn0_bias"])
        inh_hat = act(inp - act(inh_intx * (cp["alpha"] * inh + cp["mu"])))
        g_i = jax.nn.sigmoid(gi_x + fdense(inh, cp["i_u"], cp["i_u_b"]))
        new_inh = (1.0 - g_i) * inh + g_i * inh_hat
        gate_inh_ref = inh  # e-gate reads the pre-update inhibition
    else:
        new_inh = gated_exc
        gate_inh_ref = exc  # reference models/InT.py:168
    g_e = jax.nn.sigmoid(fdense(gate_inh_ref, cp["e_w"], cp["e_w_b"])
                         + fdense(gated_exc, cp["e_u"], cp["e_u_b"]))
    exc_intx = batch_norm(fconv(new_inh, cp["w_exc"]),
                          cp["bn1_scale"], cp["bn1_bias"])
    exc_hat = act(exc_intx * (cp["kappa"] * new_inh + cp["gamma"]))
    new_exc = (1.0 - g_e) * exc + g_e * exc_hat
    return (new_inh, new_exc), att


class InT(nn.Module):
    """InT wrapper: preproc -> scan(rCell) -> target-conditioned readout.

    Contract (matches reference models/InT.py:210-245):
      __call__(x [B,3,T,H,W]) -> (logit [B,1], jv_penalty [1])
      __call__(x, testmode=True) -> (logit, states [B,T,1,H,W], gates [B,T,C,H,W])
    """

    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 7
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    use_attention: bool = True
    no_inh: bool = False
    lesion_alpha: bool = False
    lesion_mu: bool = False
    lesion_gamma: bool = False
    lesion_kappa: bool = False
    nl: str = "softplus"
    remat: bool = True
    # 'conv' saves the two k x k conv outputs per step and rematerializes only
    # the cheap elementwise/gate chain in backward (the convs are the FLOPs:
    # full remat replays them, +50% conv cost); 'conv_gates' additionally
    # saves the four in-scan gate matmul outputs (more memory, less backward
    # recompute — bit-identical in the mixed path where they are bf16
    # forward values anyway); 'full' stores nothing but the carry
    # (reference-style minimal memory). Numerics are identical.
    remat_policy: str = "conv"
    # Fused Pallas cell kernels for the elementwise/gate phases on the
    # mixed-bf16 path (ops/int_fused.py). OFF by default: measured 5x
    # SLOWER on TPU (156 vs 30 ms/step forward at batch 128/T=64) — the
    # kernels themselves match XLA exactly (packed-XLA control: 156.7 ms),
    # the entire loss is the packed<->spatial relayouts at the two conv
    # boundaries, and the unpacked variant OOMs from 4x HBM tile padding
    # on the per-step residual stacks. Kept as an opt-in with full parity
    # tests (tests/test_int_fused.py); see results/tpu_experiments.md.
    # Only applies to the default config (attention on, inhibition on,
    # softplus, no lesions, bptt); other configs use the pure-XLA step.
    fused: bool = False
    # Compute dtype policy: 'float32' runs everything f32 with
    # Precision.HIGHEST (reference parity); 'bfloat16' is the MIXED fast
    # path — MXU inputs cast to bf16 with f32 accumulation, while
    # activations, the recurrent carry, BN statistics, and the loss all stay
    # f32. A pure-bf16 carry stalls training: the per-step state lerp
    # (1-g)*exc + g*exc_hat accumulates updates smaller than bf16's 8-bit
    # mantissa and the model never escapes the chance-level plateau
    # (measured; see BASELINE.md).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        k = self.kernel_size
        act = _nl(self.nl)
        mxu = None if jnp.dtype(self.dtype) == jnp.float32 else jnp.dtype(self.dtype)

        def fdense(z, kern, bias=None):
            return dense(z, kern, bias, mxu_dtype=mxu)

        # ---- parameters (names mirror the reference's state_dict keys) ----
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))

        if self.use_attention:
            a_w = self.param("a_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
            a_u = self.param("a_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
            a_w_b = self.param("a_w_gate_bias", pt_init.constant(1.0), (c,))
            a_u_b = self.param("a_u_gate_bias", pt_init.constant(1.0), (c,))
            # Gate biases tied to the negated attention bias at init
            # (reference models/InT.py:121-125).
            i_w_b = self.param("i_w_gate_bias", pt_init.constant(-1.0), (c,))
            i_u_b = self.param("i_u_gate_bias", pt_init.constant(-1.0), (c,))
            e_w_b = self.param("e_w_gate_bias", pt_init.constant(-1.0), (c,))
            e_u_b = self.param("e_u_gate_bias", pt_init.constant(-1.0), (c,))
        else:
            # Chrono-style init (reference intent at models/InT.py:127-131).
            i_w_b = self.param("i_w_gate_bias", pt_init.chrono_gate_bias(self.timesteps), (c,))
            i_u_b = self.param("i_u_gate_bias", pt_init.chrono_gate_bias(self.timesteps), (c,))
            e_w_b = self.param("e_w_gate_bias", lambda k_, s: -i_w_b, (c,))
            e_u_b = self.param("e_u_gate_bias", lambda k_, s: -i_u_b, (c,))

        i_w = self.param("i_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        i_u = self.param("i_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        e_w = self.param("e_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        e_u = self.param("e_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))

        w_exc = self.param("w_exc", pt_init.torch_orthogonal_conv, (k, k, c, c))
        if not self.no_inh:
            w_inh = self.param("w_inh", pt_init.torch_orthogonal_conv, (k, k, c, c))
            alpha = 0.0 if self.lesion_alpha else self.param("alpha", pt_init.constant(1.0), (c,))
            mu = 0.0 if self.lesion_mu else self.param("mu", pt_init.constant(0.0), (c,))
        gamma = 0.0 if self.lesion_gamma else self.param("gamma", pt_init.constant(0.0), (c,))
        kappa = 0.0 if self.lesion_kappa else self.param("kappa", pt_init.constant(1.0), (c,))
        # `w` exists in the reference cell but is unused by its forward
        # (reference models/InT.py:100); kept for checkpoint parity.
        self.param("w", pt_init.constant(1.0), (c,))

        bn0_scale = self.param("bn0_scale", pt_init.constant(0.1), (c,))
        bn0_bias = self.param("bn0_bias", nn.initializers.zeros, (c,))
        bn1_scale = self.param("bn1_scale", pt_init.constant(0.1), (c,))
        bn1_bias = self.param("bn1_bias", nn.initializers.zeros, (c,))

        ro = common.make_readout_params(self, c)

        # ---- preproc + hoisted input projections (big batched matmuls) ----
        xc = common.bcthw_to_bthwc(x)  # [B,T,H,W,3]
        b, t, h, w_, _ = xc.shape
        xbn = act(fdense(xc, pre_kernel, pre_bias))  # [B,T,H,W,C]
        if self.use_attention:
            att_in = fdense(xbn, a_w, a_w_b)  # a_w(x_t) for all t at once
        gi_in = fdense(xbn, i_w, i_w_b)  # i_w(x_t) for all t at once

        # Scan over time: xs are [T, B, H, W, C]. Under the mixed policy the
        # hoisted projections are STORED bf16 (they sit in HBM for all T
        # frames — f32 storage OOMs at batch 256) and rejoin f32 math inside
        # the step via type promotion.
        def to_tb(z):
            z = jnp.transpose(z, (1, 0, 2, 3, 4))
            return z.astype(mxu) if mxu is not None else z

        xs = (to_tb(xbn), to_tb(att_in) if self.use_attention else None,
              to_tb(gi_in))

        cp = dict(a_u=a_u, a_u_b=a_u_b, i_u=i_u, i_u_b=i_u_b,
                  e_w=e_w, e_w_b=e_w_b, e_u=e_u, e_u_b=e_u_b,
                  gamma=gamma, kappa=kappa, w_exc=w_exc,
                  bn1_scale=bn1_scale, bn1_bias=bn1_bias) \
            if self.use_attention else \
            dict(i_u=i_u, i_u_b=i_u_b, e_w=e_w, e_w_b=e_w_b, e_u=e_u,
                 e_u_b=e_u_b, gamma=gamma, kappa=kappa, w_exc=w_exc,
                 bn1_scale=bn1_scale, bn1_bias=bn1_bias)
        if not self.no_inh:
            cp.update(w_inh=w_inh, alpha=alpha, mu=mu,
                      bn0_scale=bn0_scale, bn0_bias=bn0_bias)
        step_kw = dict(use_attention=self.use_attention, no_inh=self.no_inh,
                       act=act, mxu=mxu)

        # Fused Pallas cell (ops/int_fused.py): mixed-bf16 default config
        # only — the f32 golden-parity path and the lesion/no-attention
        # variants keep the pure-XLA step.
        from pathtracker_tpu.ops import int_fused as _F

        use_fused = (self.fused and mxu == jnp.bfloat16 and self.use_attention
                     and not self.no_inh and self.nl == "softplus"
                     and not self.lesion_alpha and not self.lesion_mu
                     and not self.lesion_gamma and not self.lesion_kappa
                     and "rbp" not in self.grad_method
                     and _F.supported(c, b * h * w_ * c))
        fp = _fused_params(cp, mxu, c) if use_fused else None

        shape = (b, h, w_, c)

        def step(carry, xt):
            if use_fused:
                new_carry, att = _int_cell_step_fused(
                    shape, cp["w_inh"], cp["w_exc"], fp, xt, carry)
                if testmode:
                    exc_s = _F.unpack(new_carry[1], shape)
                    att = _F.unpack(att, shape)
                    return new_carry, (common.readout_state_map(ro, exc_s),
                                       att)
                return new_carry, None
            new_carry, att = _int_cell_step(cp, xt, carry, **step_kw)
            if testmode:
                ys = (common.readout_state_map(ro, new_carry[1]), att)
            else:
                ys = None
            return new_carry, ys

        if use_fused:
            # Packed [T, R, 128] xs / [R, 128] carry: the 128-lane minor dim
            # avoids the 4x HBM tile padding a C=32 minor dim costs on the
            # per-step residual stacks (see _int_cell_step_fused).
            xs = jax.tree.map(lambda z: z.reshape(t, -1, _F.LANES), xs)

        if self.remat and not use_fused:
            if self.remat_policy == "conv":
                step = jax.checkpoint(
                    step,
                    policy=jax.checkpoint_policies.save_only_these_names("cell_conv"))
            elif self.remat_policy == "conv_gates":
                step = jax.checkpoint(
                    step,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "cell_conv", "cell_gate"))
            else:
                step = jax.checkpoint(step)

        zeros = (jnp.zeros((b * h * w_ * c // _F.LANES, _F.LANES), xbn.dtype)
                 if use_fused else jnp.zeros((b, h, w_, c), xbn.dtype))
        if "rbp" in self.grad_method and not testmode:
            # Neumann-series RBP (reference models/InT.py:10-55 dummyhgru):
            # unroll T-1 steps without gradient, take ONE differentiable step
            # through the custom VJP — backward memory is O(1) in T.
            from pathtracker_tpu.ops.rbp import neumann_rbp

            xs_head = jax.tree.map(lambda z: z[:-1], xs)
            x_last = jax.tree.map(lambda z: z[-1], xs)

            def nograd_step(carry, xt):
                new_carry, _ = _int_cell_step(cp, xt, carry,
                                              save_convs=False, **step_kw)
                return new_carry, None

            carry, _ = jax.lax.scan(nograd_step, (zeros, zeros), xs_head)
            carry = jax.lax.stop_gradient(carry)

            def rbp_step(aux, state):
                cp_, xt_ = aux
                new_carry, _ = _int_cell_step(cp_, xt_, state,
                                              save_convs=False, **step_kw)
                return new_carry

            inh, exc = neumann_rbp(rbp_step, (cp, x_last), carry, 15)
            ys = None
        else:
            (inh, exc), ys = jax.lax.scan(
                step, (zeros, zeros), xs,
                unroll=scan_unroll(self.timesteps))
            if use_fused:
                inh, exc = _F.unpack(inh, shape), _F.unpack(exc, shape)

        target_frame = xc[:, 0, :, :, 2]  # blue channel of frame 0
        logit = common.target_readout(ro, exc, target_frame).astype(jnp.float32)
        if testmode:
            states, gates = ys  # [T,B,H,W,1], [T,B,H,W,C]
            states = jnp.transpose(states, (1, 0, 4, 2, 3))  # [B,T,1,H,W]
            gates = jnp.transpose(gates, (1, 0, 4, 2, 3))  # [B,T,C,H,W]
            return logit, states, gates
        jv_penalty = jnp.ones((1,), xbn.dtype)
        return logit, jv_penalty


class FC(nn.Module):
    """Linear probe baseline (reference models/InT.py:248-271): 1x1x1 Conv3d
    preproc -> BatchNorm3d (batch stats) -> flatten -> Linear(T*C*H*W, 1)."""

    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        xc = common.bcthw_to_bthwc(x)
        b, t, h, w_, _ = xc.shape
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        bn_scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        feat_in = t * c * h * w_
        ro_kernel = self.param("readout_kernel", pt_init.torch_conv_default, (feat_in, 1))
        ro_bias = self.param("readout_bias", pt_init.torch_conv_bias(feat_in), (1,))

        z = batch_norm(dense(xc, pre_kernel, pre_bias), bn_scale, bn_bias)
        # Flatten in the reference's BCTHW order so weights map 1:1.
        z = common.bthwc_to_bcthw(z).reshape(b, -1)
        logit = dense(z, ro_kernel, ro_bias)
        return logit, jnp.ones((1,), z.dtype)
