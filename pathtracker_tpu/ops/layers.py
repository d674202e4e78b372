"""Functional NN primitives with the reference's torch numerics, NHWC layout.

Everything here is a pure function of (x, params) — no state. BatchNorm is the
reference's track_running_stats=False flavor (reference models/InT.py:102):
normalize by the *current batch* statistics in train AND eval, biased
variance, eps=1e-3. Under a data-sharded mesh the reductions are global by
construction when called inside jit over sharded arrays (XLA inserts the
collectives), which upgrades the reference's per-replica DataParallel BN to
sync-BN; `axis_name` enables the same inside shard_map/pmap bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Contractions on f32 inputs pin full-f32 accumulation explicitly: XLA's
# DEFAULT matmul precision downcasts f32 inputs to bf16 passes on the MXU,
# which silently breaks parity with the reference. The bf16 fast path is
# opt-in by *casting inputs* (dtype policy) — bf16 inputs take the DEFAULT
# single MXU pass (HIGHEST would promote them back to multi-pass f32).
PRECISION = lax.Precision.HIGHEST


def scan_unroll(length: int, cap: int = 16) -> int:
    """Unroll factor for recurrent scans whose step contains convolutions.

    XLA:CPU executes conv VJPs inside a while-loop backward ~100x slower than
    the same HLOs outside the loop (measured: a bare 16-step 7x7-conv scan
    runs fwd in 0.14 s but grad in 22.8 s; fully unrolled, grad is 0.41 s —
    partial unroll does not help, only removing the loop does). CPU is only
    the test/dev backend here, so fully unroll short scans there; past `cap`
    steps the unrolled-grad HLO itself becomes the bottleneck (a 64-step InT
    attribution grad compiled for >9 min at 14 GB RSS before being killed),
    so long scans keep the rolled loop and eat the slow backward. On TPU
    always keep the rolled scan (the backward is conv-bound, not loop-bound,
    and unrolling only bloats compile time)."""
    if jax.default_backend() != "cpu":
        return 1
    return length if length <= cap else 1


def _precision_for(x):
    return PRECISION if x.dtype == jnp.float32 else lax.Precision.DEFAULT


def softplus(x):
    """Torch-accurate softplus: log1p(exp(x)) with the x>20 passthrough.

    jax.nn.softplus (logaddexp) loses ~1e-4 absolute in f32; this form matches
    torch to ~1e-7, which matters for golden parity through long recurrences.
    """
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def dense(x, kernel, bias=None, mxu_dtype=None):
    """[..., Cin] @ [Cin, Cout] with dtype-appropriate precision.

    The models' 1x1 convs all lower to this (MXU-shaped over the flattened
    batch*space axis). mxu_dtype='bfloat16' takes the mixed-precision path:
    inputs cast to bf16 for the single MXU pass, f32 accumulation and f32
    result — activations/state stay f32 so small recurrent updates survive
    (pure-bf16 carries stall training on the plateau; see BASELINE.md)."""
    if mxu_dtype is not None and x.dtype == jnp.float32:
        # bf16 in, bf16 out, upcast after: the MXU accumulates in f32
        # internally, and the result takes ONE rounding to bf16. Producing an
        # f32 output directly (preferred_element_type) is numerically purer
        # but doubles the matmul-output bandwidth — measured 11% slower on
        # the InT step for no training benefit: the rounded values feed gate
        # sigmoids, and the f32 that actually matters (the recurrent state
        # accumulation) lives outside the contraction (BASELINE.md).
        y = lax.dot_general(x.astype(mxu_dtype), kernel.astype(mxu_dtype),
                            (((x.ndim - 1,), (0,)), ((), ()))
                            ).astype(jnp.float32)
    else:
        y = lax.dot_general(x, kernel.astype(x.dtype),
                            (((x.ndim - 1,), (0,)), ((), ())),
                            precision=_precision_for(x))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d(x, kernel, bias=None, stride=1, padding="SAME", dilation=1,
           groups: int = 1, mxu_dtype=None, keep_mxu_dtype: bool = False):
    """NHWC conv with HWIO kernel (torch cross-correlation semantics).

    mxu_dtype='bfloat16': bf16 MXU inputs; the result is produced at bf16 and
    upcast (conv_general_dilated's transpose rule rejects an f32 cotangent
    against bf16 operands, so unlike `dense` the conv output takes one bf16
    rounding — the f32 state accumulation that matters for training lives
    outside the conv). keep_mxu_dtype=True skips the upcast — used to stash
    the conv output (remat save) at half size and upcast on use."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    mixed = mxu_dtype is not None and x.dtype == jnp.float32
    y = lax.conv_general_dilated(
        x.astype(mxu_dtype) if mixed else x,
        kernel.astype(mxu_dtype if mixed else x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=lax.Precision.DEFAULT if mixed else _precision_for(x),
        preferred_element_type=mxu_dtype if mixed else x.dtype,
    )
    if mixed and not keep_mxu_dtype:
        y = y.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv3d(x, kernel, bias=None, stride=1, padding="SAME", dilation=1):
    """NTHWC conv with THWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    elif isinstance(padding, (tuple, list)) and all(isinstance(p, int) for p in padding):
        padding = [(p, p) for p in padding]
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        precision=_precision_for(x),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def batch_norm(x, scale, bias, eps: float = 1e-3, axis_name: str | None = None):
    """Batch-statistics norm over all axes but the last (channel) axis.

    Works for NHWC (stats over N,H,W) and NTHWC (stats over N,T,H,W), i.e.
    torch BatchNorm2d/BatchNorm3d with track_running_stats=False. Statistics
    accumulate in f32 even under a bf16 compute policy (cheap VPU work,
    avoids catastrophic cancellation in mean2 - mean^2).
    """
    reduce_axes = tuple(range(x.ndim - 1))
    xs = x.astype(jnp.float32)
    mean = jnp.mean(xs, axis=reduce_axes)
    mean2 = jnp.mean(jnp.square(xs), axis=reduce_axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean2 = lax.pmean(mean2, axis_name)
    var = mean2 - jnp.square(mean)  # biased variance, as torch uses for normalization
    inv = lax.rsqrt(var + eps)
    return ((x - mean.astype(x.dtype)) * (inv.astype(x.dtype) * scale.astype(x.dtype))
            + bias.astype(x.dtype))


def layer_norm_2d(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over (H, W, C) per sample (torch nn.LayerNorm([C,H,W]) on NCHW
    equals normalizing each sample over all non-batch axes)."""
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * scale + bias


def global_avg_pool(x):
    """NHWC -> [N, C] spatial mean (torch avg_pool2d with full-size kernel)."""
    return jnp.mean(x, axis=(1, 2))


def max_pool2d(x, window=2, stride=None, padding="VALID"):
    if stride is None:
        stride = window
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, window, window, 1), (1, stride, stride, 1), padding)


def avg_pool2d(x, window=2, stride=None, padding="VALID"):
    if stride is None:
        stride = window
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding)
    return summed / float(window * window)
