"""hGRU family — the earlier variant of the InT circuit
(reference models/ffhgru_hierarchy.py: hConvGRUCell :59, FFhGRU :176,
FFhGRU_v2 :279).

Differences from the InT rCell (reference models/ffhgru_hierarchy.py:135-173):
  * the attention gate also replaces the inhibition input to the gates:
    gated_inhibition = att_gate (not the inhibition state);
  * with use_attention=False the snapshot's forward crashed on undefined
    gated_excitation/gated_inhibition (NameError); the intent — plain
    ungated state passthrough — is implemented here (SURVEY.md header);
  * FFhGRU_v2 reads out by concatenating the raw excitation with channels
    1: of frame 0 into a 1x1 conv (no dense scale), reference :302,:347.

Same TPU-first structure as InT: hoisted input projections, lax.scan,
per-step jax.checkpoint, batch-stat BN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pathtracker_tpu.models import common
from pathtracker_tpu.ops import initializers as pt_init
from pathtracker_tpu.ops.layers import (batch_norm, conv2d, dense,
                                         global_avg_pool, scan_unroll, softplus)


class _HGRUBase(nn.Module):
    """Shared cell params + scan for FFhGRU / FFhGRU_v2."""

    dimensions: int = 32
    timesteps: int = 64
    kernel_size: int = 15
    jacobian_penalty: bool = False
    grad_method: str = "bptt"
    use_attention: bool = True
    remat: bool = True
    # 'bfloat16' = the mixed fast path (bf16 MXU inputs, f32 state/BN —
    # a pure-bf16 carry stalls training; see models/int_circuit.py).
    dtype: str = "float32"

    @property
    def _mxu(self):
        return None if jnp.dtype(self.dtype) == jnp.float32 else jnp.dtype(self.dtype)

    def _cell_params(self):
        c = self.dimensions
        k = self.kernel_size
        p = {}
        if self.use_attention:
            p["a_w"] = self.param("a_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
            p["a_u"] = self.param("a_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
            p["a_w_b"] = self.param("a_w_gate_bias", pt_init.constant(1.0), (c,))
            p["a_u_b"] = self.param("a_u_gate_bias", pt_init.constant(1.0), (c,))
            p["i_w_b"] = self.param("i_w_gate_bias", pt_init.constant(-1.0), (c,))
            p["i_u_b"] = self.param("i_u_gate_bias", pt_init.constant(-1.0), (c,))
            p["e_w_b"] = self.param("e_w_gate_bias", pt_init.constant(-1.0), (c,))
            p["e_u_b"] = self.param("e_u_gate_bias", pt_init.constant(-1.0), (c,))
        else:
            i_w_b = self.param("i_w_gate_bias", pt_init.chrono_gate_bias(self.timesteps), (c,))
            i_u_b = self.param("i_u_gate_bias", pt_init.chrono_gate_bias(self.timesteps), (c,))
            p["i_w_b"], p["i_u_b"] = i_w_b, i_u_b
            p["e_w_b"] = self.param("e_w_gate_bias", lambda k_, s: -i_w_b, (c,))
            p["e_u_b"] = self.param("e_u_gate_bias", lambda k_, s: -i_u_b, (c,))
        p["i_w"] = self.param("i_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        p["i_u"] = self.param("i_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        p["e_w"] = self.param("e_w_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        p["e_u"] = self.param("e_u_gate_kernel", pt_init.torch_orthogonal_matrix, (c, c))
        p["w_inh"] = self.param("w_inh", pt_init.torch_orthogonal_conv, (k, k, c, c))
        p["w_exc"] = self.param("w_exc", pt_init.torch_orthogonal_conv, (k, k, c, c))
        p["alpha"] = self.param("alpha", pt_init.constant(1.0), (c,))
        p["mu"] = self.param("mu", pt_init.constant(0.0), (c,))
        p["gamma"] = self.param("gamma", pt_init.constant(0.0), (c,))
        p["kappa"] = self.param("kappa", pt_init.constant(1.0), (c,))
        self.param("w", pt_init.constant(1.0), (c,))
        p["bn0_scale"] = self.param("bn0_scale", pt_init.constant(0.1), (c,))
        p["bn0_bias"] = self.param("bn0_bias", nn.initializers.zeros, (c,))
        p["bn1_scale"] = self.param("bn1_scale", pt_init.constant(0.1), (c,))
        p["bn1_bias"] = self.param("bn1_bias", nn.initializers.zeros, (c,))
        return p

    def _run_scan(self, xbn, p, collect: bool, clock_masks=None):
        """xbn: [B,T,H,W,C] preprocessed input. Returns (inh, exc, ys).

        clock_masks: optional [T, C] in [0,1] — per-step per-channel update
        fraction (clockwork-RNN style); channels with mask 0 hold their state."""
        b, t, h, w_, c = xbn.shape
        mxu = self._mxu

        def fdense(z, kern, bias=None):
            return dense(z, kern, bias, mxu_dtype=mxu)

        def fconv(z, kern):
            y = conv2d(z, kern, mxu_dtype=mxu, keep_mxu_dtype=True)
            return y.astype(jnp.float32) if mxu is not None else y

        if self.use_attention:
            att_in = fdense(xbn, p["a_w"], p["a_w_b"])
        gi_in = fdense(xbn, p["i_w"], p["i_w_b"])

        def to_tb(z):
            z = jnp.transpose(z, (1, 0, 2, 3, 4))
            return z.astype(mxu) if mxu is not None else z

        xs = (to_tb(xbn), to_tb(att_in) if self.use_attention else None,
              to_tb(gi_in), clock_masks)

        def step(carry, xt):
            inh, exc = carry
            inp, att_x, gi_x, mask = xt
            if self.use_attention:
                att = jax.nn.sigmoid(att_x + fdense(exc, p["a_u"], p["a_u_b"]))
                gated_exc = att * exc
                gated_inh = att  # hGRU quirk: gate tensor stands in for inhibition
            else:
                att = jnp.ones_like(exc)
                gated_exc = exc
                gated_inh = inh
            inh_intx = batch_norm(fconv(gated_exc, p["w_inh"]),
                                  p["bn0_scale"], p["bn0_bias"])
            inh_hat = softplus(inp - softplus(inh_intx * (p["alpha"] * gated_inh + p["mu"])))
            g_i = jax.nn.sigmoid(gi_x + fdense(gated_inh, p["i_u"], p["i_u_b"]))
            new_inh = (1.0 - g_i) * inh + g_i * inh_hat
            g_e = jax.nn.sigmoid(fdense(gated_inh, p["e_w"], p["e_w_b"])
                                 + fdense(gated_exc, p["e_u"], p["e_u_b"]))
            exc_intx = batch_norm(fconv(new_inh, p["w_exc"]),
                                  p["bn1_scale"], p["bn1_bias"])
            exc_hat = softplus(exc_intx * (p["kappa"] * new_inh + p["gamma"]))
            new_exc = (1.0 - g_e) * exc + g_e * exc_hat
            if mask is not None:
                new_inh = mask * new_inh + (1.0 - mask) * inh
                new_exc = mask * new_exc + (1.0 - mask) * exc
            ys = (new_exc, att) if collect else None
            return (new_inh, new_exc), ys

        if self.remat:
            step = jax.checkpoint(step)
        zeros = jnp.zeros((b, h, w_, c), xbn.dtype)
        (inh, exc), ys = jax.lax.scan(step, (zeros, zeros), xs,
                                      unroll=scan_unroll(xs[0].shape[0]))
        return inh, exc, ys


class FFhGRU(_HGRUBase):
    """hGRU with attention and the target-conditioned readout
    (reference models/ffhgru_hierarchy.py:176-276)."""

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        p = self._cell_params()
        ro = common.make_readout_params(self, c)

        xc = common.bcthw_to_bthwc(x)
        xbn = softplus(dense(xc, pre_kernel, pre_bias))
        inh, exc, ys = self._run_scan(xbn, p, collect=testmode)
        logit = common.target_readout(ro, exc, xc[:, 0, :, :, 2])
        if testmode:
            excs, atts = ys
            states = common.readout_state_map(ro, excs)  # [T,B,H,W,1]
            states = jnp.transpose(states, (1, 0, 4, 2, 3))
            gates = jnp.transpose(atts, (1, 0, 4, 2, 3))
            return logit, states, gates
        return logit, jnp.ones((1,), xbn.dtype)


class ClockHGRU(_HGRUBase):
    """Clockwork hGRU (reference models/InT.py:274-371 and
    ffhgru_hierarchy.py:391+ — both referenced a `ClockHConvGRUCell` that does
    not exist anywhere in the snapshot, so this implements the *intended*
    clockwork design, Koutnik et al. arXiv:1402.3511 applied to the hConvGRU):

      * 'fixed': channels are partitioned into log2(C) groups with update
        periods 1, 2, 4, ... — group g only updates on steps where
        t % 2^g == 0 (hard binary clock masks, precomputed per step);
      * 'dynamic': a learned per-channel update rate sigmoid(clock_rate)
        blends each step's update (a differentiable soft clock; init bias +2
        so training starts near always-update).

    Readout matches the reference wrapper: per-step 1x1 readout conv on the
    excitation, frames concatenated along width (torch cat(states, -1)),
    flattened into Linear(T*H*W, 1). Preproc is 1x1 Conv3d + batch-stat BN
    (the snapshot flipped this one BN to track_running_stats=True; this
    framework is stateless by design, documented deviation)."""

    clock_type: str = "dynamic"

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        assert self.clock_type in ("fixed", "dynamic")
        c = self.dimensions
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        bn_scale = self.param("preproc_bn_scale", nn.initializers.ones, (c,))
        bn_bias = self.param("preproc_bn_bias", nn.initializers.zeros, (c,))
        p = self._cell_params()
        ro_kernel = self.param("readout_conv_kernel", pt_init.torch_conv_default, (c, 1))
        ro_bias = self.param("readout_conv_bias", pt_init.torch_conv_bias(c), (1,))

        xc = common.bcthw_to_bthwc(x)
        b, t, h, w_, _ = xc.shape
        xbn = batch_norm(dense(xc, pre_kernel, pre_bias), bn_scale, bn_bias)

        if self.clock_type == "fixed":
            # Partition channels evenly over log2-spaced periods 1,2,4,...
            n_groups = max(1, min(t.bit_length() - 1 if t > 1 else 1, 8))
            group = (jnp.arange(c) * n_groups) // c  # [C] group index
            periods = 2 ** group  # [C]
            steps = jnp.arange(t)[:, None]  # [T,1]
            clock_masks = (steps % periods[None, :] == 0).astype(xbn.dtype)  # [T,C]
        else:
            rate = self.param("clock_rate", pt_init.constant(2.0), (c,))
            clock_masks = jnp.broadcast_to(jax.nn.sigmoid(rate)[None, :],
                                           (t, c)).astype(xbn.dtype)

        inh, exc, ys = self._run_scan(xbn, p, collect=True,
                                      clock_masks=clock_masks)
        excs, atts = ys  # [T,B,H,W,C]
        states = dense(excs, ro_kernel, ro_bias)  # [T,B,H,W,1]
        # torch cat(states, -1).reshape(B, -1): frame maps concatenated along
        # width -> flatten order (h, t, w).
        flat = jnp.transpose(states[..., 0], (1, 2, 0, 3)).reshape(b, -1)
        d_kernel = self.param("readout_dense_kernel", pt_init.torch_conv_default,
                              (t * h * w_, 1))
        d_bias = self.param("readout_dense_bias", pt_init.torch_conv_bias(t * h * w_),
                            (1,))
        logit = dense(flat, d_kernel, d_bias)
        if testmode:
            st = jnp.transpose(states, (1, 0, 4, 2, 3))  # [B,T,1,H,W]
            gates = jnp.transpose(atts, (1, 0, 4, 2, 3))
            return logit, st, gates
        return logit, jnp.ones((1,), xbn.dtype)


class FFhGRUv2(_HGRUBase):
    """No-attention variant with the wide readout: cat(excitation, frame-0
    channels 1:) -> Conv2d(C+2, 1, 1) -> global pool
    (reference models/ffhgru_hierarchy.py:279-362).

    Snapshot accident (pinned by tests/test_torch_import.py): the reference
    cell's no-attention path never assigns gated_excitation/gated_inhibition
    (ffhgru_hierarchy.py:141-152), so FFhGRU_v2 raises UnboundLocalError and
    cannot run there at all. This implements the intent: without attention
    the cell reads the ungated excitation/inhibition state."""

    use_attention: bool = False

    @nn.compact
    def __call__(self, x, testmode: bool = False):
        c = self.dimensions
        pre_kernel = self.param("preproc_kernel", pt_init.torch_conv_default, (3, c))
        pre_bias = self.param("preproc_bias", pt_init.torch_conv_bias(3), (c,))
        p = self._cell_params()
        tc_kernel = self.param("target_conv_kernel", pt_init.torch_conv_default,
                               (c + 2, 1))
        tc_bias = self.param("target_conv_bias", nn.initializers.zeros, (1,))

        xc = common.bcthw_to_bthwc(x)
        xbn = softplus(dense(xc, pre_kernel, pre_bias))
        inh, exc, ys = self._run_scan(xbn, p, collect=testmode)
        merged = jnp.concatenate([exc, xc[:, 0, :, :, 1:]], axis=-1)
        out = dense(merged, tc_kernel, tc_bias)  # 1x1 conv
        logit = global_avg_pool(out)
        if testmode:
            excs, atts = ys
            states = jnp.transpose(excs, (1, 0, 4, 2, 3))  # raw excitation maps
            gates = jnp.transpose(atts, (1, 0, 4, 2, 3))
            return logit, states, gates
        return logit, jnp.ones((1,), xbn.dtype)
