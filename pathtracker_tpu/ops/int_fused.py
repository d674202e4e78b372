"""Fused Pallas kernels for the InT cell's elementwise/gate phases.

Motivation (measured, BASELINE.md round-2 ablation): at batch 128 / T=64 the
InT step spends 33 ms forward + 125 ms backward, while an equivalent
conv-only scan costs 16 + 56 ms — i.e. >100 ms/step of the mixed-path time
is elementwise/gate/BN work and its VJPs, all HBM-bandwidth-bound. XLA
fuses the forward reasonably; the backward (remat recompute + autodiff
chain) re-reads every intermediate from HBM. These kernels compute each
phase in ONE pass over VMEM-resident blocks, with hand-derived backward
kernels that recompute intermediates in-register from the saved inputs.

The cell step (reference models/InT.py:145-179) splits into three
elementwise phases interleaved with the two k x k convs (which stay in XLA
— they run at the conv roofline):

    K1  att = sigmoid(att_x + exc @ a_u + b);  gated_exc = att * exc
        -> conv_i = conv(gated_exc, w_inh); BN0 stats            [XLA]
    K2  bn0 = (conv_i - mean0) * rstd0 * scale0 + bias0
        inh_hat = sp(inp - sp(bn0 * (alpha * inh + mu)))
        g_i = sigmoid(gi_x + inh @ i_u + b)
        new_inh = (1 - g_i) * inh + g_i * inh_hat
        -> conv_e = conv(new_inh, w_exc); BN1 stats              [XLA]
    K3  g_e = sigmoid(inh @ e_w + gated_exc @ e_u + b)
        exc_hat = sp(bn1 * (kappa * new_inh + gamma))
        new_exc = (1 - g_e) * exc + g_e * exc_hat

Layout trick: every [rows, C=32] tensor is viewed as [rows/4, 128] — C=32
on the 128-lane minor dimension wastes 3/4 of the VPU and MXU; the packed
view uses all 128 lanes, and the [C,C] gate matmuls become block-diagonal
[128,128] matmuls (4 copies of U on the diagonal — 4x the FLOPs on lanes
that were idle, ~4x fewer row iterations). Per-channel parameters tile to
[1, 128].

Mixed-precision semantics match ops/layers.dense on the bf16 path: matmul
inputs bf16 with f32 accumulation, all elementwise math f32.

BatchNorm statistics (mean, rstd over the batch) are computed OUTSIDE in
XLA (they fuse with the conv) and enter the kernels as [1, 128] inputs with
their own cotangents, so autodiff through the stats stays in XLA and the
kernels only produce the direct terms plus per-block partial reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_BLOCK_R = 1024  # packed rows per grid step (shrinks for tiny inputs)


def _block_r(rows: int) -> int:
    for cand in (MAX_BLOCK_R, 512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return rows


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack(x):
    """[..., R, C] -> [R*C/128 rows, 128] packed view (C * PACK == 128)."""
    return x.reshape(-1, LANES)


def unpack(x, shape):
    return x.reshape(shape)


def tile_param(p, c):
    """[C] per-channel parameter -> [1, 128] tiled over the packed lanes."""
    return jnp.tile(jnp.reshape(p, (1, c)), (1, LANES // c))


def blockdiag(u, c):
    """[C, C] gate matrix -> [128, 128] block-diagonal (128//C copies)."""
    n = LANES // c
    eye = jnp.eye(n, dtype=u.dtype)
    return jnp.einsum("ij,ab->iajb", eye, u).reshape(n * c, n * c)


def supported(c: int, total_elements: int) -> bool:
    """Fused path preconditions: channels pack the 128 lanes exactly, the
    total element count reshapes into [rows, 128] with no remainder, and
    the packed row count tiles into aligned blocks."""
    return (LANES % c == 0 and total_elements % LANES == 0
            and (total_elements // LANES) % 8 == 0)


def _grid(n_rows):
    return (n_rows // _block_r(n_rows),)


def _row_spec(br):
    return pl.BlockSpec((br, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _par_spec():
    return pl.BlockSpec((1, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _mat_spec():
    return pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _partial_spec():
    """Per-block partial reduction output: [n_blocks, 1, 128] (3-D so the
    trailing block dims equal the array dims — a (1,128) block of a
    (nb,128) array is rejected by the TPU lowering)."""
    return pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _partial_mat_spec():
    """Per-block partial [128,128] matrix output."""
    return pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _dot(a_f32, w_bf16):
    return jnp.dot(a_f32.astype(jnp.bfloat16), w_bf16,
                   preferred_element_type=jnp.float32)


def _dot_t(a_f32, w_bf16):
    """a @ w.T without an in-kernel transpose."""
    return jax.lax.dot_general(
        a_f32.astype(jnp.bfloat16), w_bf16,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sp(x):
    return jax.nn.softplus(x)


def _sig(x):
    return jax.nn.sigmoid(x)


# ============================= K1: attention ================================

def _k1_fwd_kernel(exc_ref, attx_ref, au_ref, aub_ref, gated_ref, att_ref):
    exc = exc_ref[:]
    pre = attx_ref[:].astype(jnp.float32) + _dot(exc, au_ref[:]) + aub_ref[:]
    att = _sig(pre)
    att_ref[:] = att
    gated_ref[:] = (att * exc).astype(jnp.bfloat16)


def _k1_bwd_kernel(exc_ref, attx_ref, au_ref, aub_ref, dgated_ref, datt_ref,
                   dexc_ref, dattx_ref, dau_ref, daub_ref):
    exc = exc_ref[:]
    pre = attx_ref[:].astype(jnp.float32) + _dot(exc, au_ref[:]) + aub_ref[:]
    att = _sig(pre)
    dgated = dgated_ref[:]
    datt = dgated * exc + datt_ref[:]
    dpre = datt * att * (1.0 - att)
    dexc_ref[:] = dgated * att + _dot_t(dpre, au_ref[:])
    dattx_ref[:] = dpre.astype(jnp.bfloat16)
    # per-block partials of the weight grads (summed outside)
    dau_ref[0] = jax.lax.dot_general(
        exc.astype(jnp.bfloat16), dpre.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    daub_ref[0, 0] = jnp.sum(dpre, axis=0)


@jax.custom_vjp
def k1_attention(exc, att_x, a_u_bd, a_u_b_t):
    """exc [R,128] f32, att_x [R,128] bf16, a_u_bd [128,128] bf16 blockdiag,
    a_u_b_t [1,128] f32 -> (gated_exc bf16, att f32)."""
    r = exc.shape[0]
    br = _block_r(r)
    return pl.pallas_call(
        _k1_fwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _row_spec(br), _mat_spec(), _par_spec()],
        out_specs=(_row_spec(br), _row_spec(br)),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.float32)),
        interpret=_interpret(),
    )(exc, att_x, a_u_bd, a_u_b_t)


def _k1_fwd(exc, att_x, a_u_bd, a_u_b_t):
    out = k1_attention(exc, att_x, a_u_bd, a_u_b_t)
    return out, (exc, att_x, a_u_bd, a_u_b_t)


def _k1_bwd(res, cots):
    exc, att_x, a_u_bd, a_u_b_t = res
    dgated, datt = cots
    r = exc.shape[0]
    br = _block_r(r)
    nb = r // br
    dexc, dattx, dau_p, daub_p = pl.pallas_call(
        _k1_bwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _row_spec(br), _mat_spec(), _par_spec(),
                  _row_spec(br), _row_spec(br)],
        out_specs=(_row_spec(br), _row_spec(br), _partial_mat_spec(),
                   _partial_spec()),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((nb, LANES, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, LANES), jnp.float32)),
        interpret=_interpret(),
    )(exc, att_x, a_u_bd, a_u_b_t,
      dgated.astype(jnp.float32), datt)
    return dexc, dattx, jnp.sum(dau_p, axis=0).astype(a_u_bd.dtype), \
        jnp.sum(daub_p, axis=0)


k1_attention.defvjp(_k1_fwd, _k1_bwd)


# ============================ K2: inhibition ================================

def _k2_core(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh, iu, iub,
             alpha, mu):
    xn = (conv_i.astype(jnp.float32) - mean0) * rstd0
    bn0 = xn * scale0 + bias0
    lin = alpha * inh + mu
    t1 = bn0 * lin
    sp1 = _sp(t1)
    pre2 = inp.astype(jnp.float32) - sp1
    inh_hat = _sp(pre2)
    gpre = gi_x.astype(jnp.float32) + _dot(inh, iu) + iub
    g = _sig(gpre)
    new_inh = (1.0 - g) * inh + g * inh_hat
    return xn, bn0, lin, t1, pre2, inh_hat, gpre, g, new_inh


def _k2_fwd_kernel(conv_ref, mean_ref, rstd_ref, scale_ref, bias_ref,
                   inp_ref, gix_ref, inh_ref, iu_ref, iub_ref,
                   alpha_ref, mu_ref, out_ref):
    *_, new_inh = _k2_core(
        conv_ref[:], mean_ref[:], rstd_ref[:], scale_ref[:], bias_ref[:],
        inp_ref[:], gix_ref[:], inh_ref[:], iu_ref[:], iub_ref[:],
        alpha_ref[:], mu_ref[:])
    out_ref[:] = new_inh


def _k2_bwd_kernel(conv_ref, mean_ref, rstd_ref, scale_ref, bias_ref,
                   inp_ref, gix_ref, inh_ref, iu_ref, iub_ref,
                   alpha_ref, mu_ref, dnew_ref,
                   dconv_ref, dinp_ref, dgix_ref, dinh_ref,
                   diu_ref, dred_ref):
    conv_i = conv_ref[:]
    mean0, rstd0 = mean_ref[:], rstd_ref[:]
    scale0 = scale_ref[:]
    inh = inh_ref[:]
    alpha, mu = alpha_ref[:], mu_ref[:]
    xn, bn0, lin, t1, pre2, inh_hat, gpre, g, _ = _k2_core(
        conv_i, mean0, rstd0, scale0, bias_ref[:], inp_ref[:], gix_ref[:],
        inh, iu_ref[:], iub_ref[:], alpha, mu)
    dnew = dnew_ref[:]

    dg = dnew * (inh_hat - inh)
    dinh_hat = dnew * g
    dgpre = dg * g * (1.0 - g)
    dpre2 = dinh_hat * _sig(pre2)
    dsp1 = -dpre2
    dt1 = dsp1 * _sig(t1)
    dbn0 = dt1 * lin
    dlin = dt1 * bn0
    dxn = dbn0 * scale0

    dconv_ref[:] = (dxn * rstd0).astype(jnp.bfloat16)
    dinp_ref[:] = dpre2.astype(jnp.bfloat16)
    dgix_ref[:] = dgpre.astype(jnp.bfloat16)
    dinh_ref[:] = (dnew * (1.0 - g) + dlin * alpha
                   + _dot_t(dgpre, iu_ref[:]))
    diu_ref[0] = jax.lax.dot_general(
        inh.astype(jnp.bfloat16), dgpre.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # packed per-block reductions: rows = [diub, dalpha, dmu, dmean, drstd,
    # dscale, dbias], each [1, 128]
    dred_ref[0, 0] = jnp.sum(dgpre, axis=0)
    dred_ref[0, 1] = jnp.sum(dlin * inh, axis=0)
    dred_ref[0, 2] = jnp.sum(dlin, axis=0)
    dred_ref[0, 3] = jnp.sum(-dxn, axis=0) * rstd0[0]
    dred_ref[0, 4] = jnp.sum(dxn * (conv_i.astype(jnp.float32) - mean0),
                             axis=0)
    dred_ref[0, 5] = jnp.sum(dbn0 * xn, axis=0)
    dred_ref[0, 6] = jnp.sum(dbn0, axis=0)


@jax.custom_vjp
def k2_inhibition(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh,
                  i_u_bd, i_u_b_t, alpha_t, mu_t):
    r = inh.shape[0]
    br = _block_r(r)
    return pl.pallas_call(
        _k2_fwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _par_spec(), _par_spec(), _par_spec(),
                  _par_spec(), _row_spec(br), _row_spec(br), _row_spec(br),
                  _mat_spec(), _par_spec(), _par_spec(), _par_spec()],
        out_specs=_row_spec(br),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        interpret=_interpret(),
    )(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh, i_u_bd, i_u_b_t,
      alpha_t, mu_t)


def _k2_fwd(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh, i_u_bd,
            i_u_b_t, alpha_t, mu_t):
    out = k2_inhibition(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh,
                        i_u_bd, i_u_b_t, alpha_t, mu_t)
    return out, (conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh,
                 i_u_bd, i_u_b_t, alpha_t, mu_t)


def _k2_bwd(res, dnew):
    (conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh, i_u_bd, i_u_b_t,
     alpha_t, mu_t) = res
    r = inh.shape[0]
    br = _block_r(r)
    nb = r // br
    dconv, dinp, dgix, dinh, diu_p, dred_p = pl.pallas_call(
        _k2_bwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _par_spec(), _par_spec(), _par_spec(),
                  _par_spec(), _row_spec(br), _row_spec(br), _row_spec(br),
                  _mat_spec(), _par_spec(), _par_spec(), _par_spec(),
                  _row_spec(br)],
        out_specs=(_row_spec(br), _row_spec(br), _row_spec(br), _row_spec(br),
                   _partial_mat_spec(),
                   pl.BlockSpec((1, 7, LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, LANES, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 7, LANES), jnp.float32)),
        interpret=_interpret(),
    )(conv_i, mean0, rstd0, scale0, bias0, inp, gi_x, inh, i_u_bd, i_u_b_t,
      alpha_t, mu_t, dnew)
    red = jnp.sum(dred_p, axis=0)  # [7, 128]
    return (dconv, red[3:4], red[4:5], red[5:6], red[6:7], dinp, dgix, dinh,
            jnp.sum(diu_p, axis=0).astype(i_u_bd.dtype), red[0:1], red[1:2],
            red[2:3])


k2_inhibition.defvjp(_k2_fwd, _k2_bwd)


# ============================ K3: excitation ================================

def _k3_core(conv_e, mean1, rstd1, scale1, bias1, new_inh, inh, gated, exc,
             ew, ewb, eu, eub, kappa, gamma):
    xn = (conv_e.astype(jnp.float32) - mean1) * rstd1
    bn1 = xn * scale1 + bias1
    lin = kappa * new_inh + gamma
    t1 = bn1 * lin
    exc_hat = _sp(t1)
    gpre = _dot(inh, ew) + ewb + _dot(gated.astype(jnp.float32), eu) + eub
    g = _sig(gpre)
    new_exc = (1.0 - g) * exc + g * exc_hat
    return xn, bn1, lin, t1, exc_hat, gpre, g, new_exc


def _k3_fwd_kernel(conv_ref, mean_ref, rstd_ref, scale_ref, bias_ref,
                   ninh_ref, inh_ref, gated_ref, exc_ref,
                   ew_ref, ewb_ref, eu_ref, eub_ref,
                   kappa_ref, gamma_ref, out_ref):
    *_, new_exc = _k3_core(
        conv_ref[:], mean_ref[:], rstd_ref[:], scale_ref[:], bias_ref[:],
        ninh_ref[:], inh_ref[:], gated_ref[:], exc_ref[:],
        ew_ref[:], ewb_ref[:], eu_ref[:], eub_ref[:],
        kappa_ref[:], gamma_ref[:])
    out_ref[:] = new_exc


def _k3_bwd_kernel(conv_ref, mean_ref, rstd_ref, scale_ref, bias_ref,
                   ninh_ref, inh_ref, gated_ref, exc_ref,
                   ew_ref, ewb_ref, eu_ref, eub_ref,
                   kappa_ref, gamma_ref, dnew_ref,
                   dconv_ref, dninh_ref, dinh_ref, dgated_ref, dexc_ref,
                   dew_ref, deu_ref, dred_ref):
    conv_e = conv_ref[:]
    mean1, rstd1 = mean_ref[:], rstd_ref[:]
    scale1 = scale_ref[:]
    new_inh, inh = ninh_ref[:], inh_ref[:]
    gated, exc = gated_ref[:], exc_ref[:]
    kappa = kappa_ref[:]
    xn, bn1, lin, t1, exc_hat, gpre, g, _ = _k3_core(
        conv_e, mean1, rstd1, scale1, bias_ref[:], new_inh, inh, gated, exc,
        ew_ref[:], ewb_ref[:], eu_ref[:], eub_ref[:], kappa, gamma_ref[:])
    dnew = dnew_ref[:]

    dg = dnew * (exc_hat - exc)
    dexc_hat = dnew * g
    dgpre = dg * g * (1.0 - g)
    dt1 = dexc_hat * _sig(t1)
    dbn1 = dt1 * lin
    dlin = dt1 * bn1
    dxn = dbn1 * scale1

    dconv_ref[:] = (dxn * rstd1).astype(jnp.bfloat16)
    dninh_ref[:] = dlin * kappa
    dinh_ref[:] = _dot_t(dgpre, ew_ref[:])
    dgated_ref[:] = _dot_t(dgpre, eu_ref[:]).astype(jnp.bfloat16)
    dexc_ref[:] = dnew * (1.0 - g)
    dew_ref[0] = jax.lax.dot_general(
        inh.astype(jnp.bfloat16), dgpre.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    deu_ref[0] = jax.lax.dot_general(
        gated, dgpre.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # rows: [dewb+deub (same value), dkappa, dgamma, dmean, drstd, dscale,
    # dbias]
    dred_ref[0, 0] = jnp.sum(dgpre, axis=0)
    dred_ref[0, 1] = jnp.sum(dlin * new_inh, axis=0)
    dred_ref[0, 2] = jnp.sum(dlin, axis=0)
    dred_ref[0, 3] = jnp.sum(-dxn, axis=0) * rstd1[0]
    dred_ref[0, 4] = jnp.sum(dxn * (conv_e.astype(jnp.float32) - mean1),
                             axis=0)
    dred_ref[0, 5] = jnp.sum(dbn1 * xn, axis=0)
    dred_ref[0, 6] = jnp.sum(dbn1, axis=0)


@jax.custom_vjp
def k3_excitation(conv_e, mean1, rstd1, scale1, bias1, new_inh, inh, gated,
                  exc, e_w_bd, e_w_b_t, e_u_bd, e_u_b_t, kappa_t, gamma_t):
    r = exc.shape[0]
    br = _block_r(r)
    return pl.pallas_call(
        _k3_fwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _par_spec(), _par_spec(), _par_spec(),
                  _par_spec(), _row_spec(br), _row_spec(br), _row_spec(br),
                  _row_spec(br), _mat_spec(), _par_spec(), _mat_spec(),
                  _par_spec(), _par_spec(), _par_spec()],
        out_specs=_row_spec(br),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        interpret=_interpret(),
    )(conv_e, mean1, rstd1, scale1, bias1, new_inh, inh, gated, exc,
      e_w_bd, e_w_b_t, e_u_bd, e_u_b_t, kappa_t, gamma_t)


def _k3_fwd(*args):
    return k3_excitation(*args), args


def _k3_bwd(res, dnew):
    (conv_e, mean1, rstd1, scale1, bias1, new_inh, inh, gated, exc,
     e_w_bd, e_w_b_t, e_u_bd, e_u_b_t, kappa_t, gamma_t) = res
    r = exc.shape[0]
    br = _block_r(r)
    nb = r // br
    (dconv, dninh, dinh, dgated, dexc, dew_p, deu_p, dred_p) = pl.pallas_call(
        _k3_bwd_kernel,
        grid=_grid(r),
        in_specs=[_row_spec(br), _par_spec(), _par_spec(), _par_spec(),
                  _par_spec(), _row_spec(br), _row_spec(br), _row_spec(br),
                  _row_spec(br), _mat_spec(), _par_spec(), _mat_spec(),
                  _par_spec(), _par_spec(), _par_spec(), _row_spec(br)],
        out_specs=(_row_spec(br), _row_spec(br), _row_spec(br), _row_spec(br),
                   _row_spec(br), _partial_mat_spec(), _partial_mat_spec(),
                   pl.BlockSpec((1, 7, LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, LANES), jnp.bfloat16),
                   jax.ShapeDtypeStruct((r, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, LANES, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, LANES, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 7, LANES), jnp.float32)),
        interpret=_interpret(),
    )(conv_e, mean1, rstd1, scale1, bias1, new_inh, inh, gated, exc,
      e_w_bd, e_w_b_t, e_u_bd, e_u_b_t, kappa_t, gamma_t, dnew)
    red = jnp.sum(dred_p, axis=0)
    return (dconv, red[3:4], red[4:5], red[5:6], red[6:7], dninh, dinh,
            dgated, dexc, jnp.sum(dew_p, axis=0).astype(e_w_bd.dtype),
            red[0:1], jnp.sum(deu_p, axis=0).astype(e_u_bd.dtype), red[0:1],
            red[1:2], red[2:3])


k3_excitation.defvjp(_k3_fwd, _k3_bwd)


# ====================== packed stats + cell step glue =======================

def packed_stats(conv_out, c):
    """Batch-stat mean/rstd of a PACKED [R/4, 128] conv output, computed per
    true channel (C) then tiled to [1, 128]. Differentiable in XLA."""
    x = conv_out.astype(jnp.float32).reshape(-1, c)
    mean = jnp.mean(x, axis=0)
    var = jnp.mean(jnp.square(x), axis=0) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + 1e-3)  # reference BN eps (InT cells)
    return tile_param(mean, c), tile_param(rstd, c)
