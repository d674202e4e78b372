"""Parameter initializers reproducing the reference's torch semantics.

The reference relies on three init families (reference models/InT.py:73-131):
  * torch's default Conv/Linear init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    for both weight and bias;
  * `init.orthogonal_` on conv weights: the OIHW tensor flattened to
    [O, I*kh*kw] is made row/column-orthonormal via QR;
  * chrono gate-bias init (arXiv:1804.11188): forget-gate bias
    ~ log U(1, T-1), input gate its negative. (The reference's in-place
    `.log()` at models/InT.py:128 silently *discarded* its result — the
    snapshot actually trained with U(1, T-1); we implement the intent.)

All conv kernels here use JAX-native HWIO layout; 1x1 convs are stored as
[Cin, Cout] matmul kernels. The mapping from torch layouts:
  OIHW -> HWIO: transpose (2, 3, 1, 0);  O,I 1x1 -> [I, O]: transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_default(key, shape, dtype=jnp.float32):
    """torch default weight init for an HWIO conv kernel or [I,O] matmul kernel."""
    if len(shape) == 2:  # [Cin, Cout] 1x1-conv / linear kernel
        fan_in = shape[0]
    elif len(shape) == 4:  # HWIO
        fan_in = shape[0] * shape[1] * shape[2]
    elif len(shape) == 5:  # THWIO (3d conv)
        fan_in = shape[0] * shape[1] * shape[2] * shape[3]
    else:
        raise ValueError(f"unsupported kernel shape {shape}")
    return _uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)


def torch_conv_bias(fan_in):
    """Bias initializer for a conv/linear with the given fan-in."""

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)

    return init


def _orthogonal_rows(key, rows, cols, dtype):
    """Matrix [rows, cols] with orthonormal rows (cols if cols < rows),
    matching torch.nn.init.orthogonal_ (gain 1)."""
    n, m = (rows, cols) if rows >= cols else (cols, rows)
    a = jax.random.normal(key, (n, m), dtype)
    q, r = jnp.linalg.qr(a)
    # Sign correction so the distribution is uniform (Haar), as torch does.
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if rows < cols:
        q = q.T
    return q


def favor_orthogonal_features(key, n_features, dim, dtype=jnp.float32):
    """FAVOR+ random-feature matrix [n_features, dim]: ceil(m/d) independent
    Haar d x d blocks stacked, every row unit-norm (performer-pytorch's
    gaussian_orthogonal_random_matrix). NOT _orthogonal_rows: for m > d that
    returns orthonormal COLUMNS, whose m rows have norm ~ sqrt(d/m) — the
    projections then collapse toward exp(0) and attention washes out to
    uniform. The caller scales rows by sqrt(d) (fixed-norm 'scaling=1')."""
    n_blocks = -(-n_features // dim)
    blocks = [
        _orthogonal_rows(jax.random.fold_in(key, i), dim, dim, dtype)
        for i in range(n_blocks)]
    return jnp.concatenate(blocks, axis=0)[:n_features]


def torch_orthogonal_matrix(key, shape, dtype=jnp.float32):
    """[Cin, Cout] kernel equal (in distribution) to torch orthogonal_ on the
    [O, I] conv weight, transposed into matmul layout."""
    cin, cout = shape
    w_oi = _orthogonal_rows(key, cout, cin, dtype)  # torch's [O, I]
    return w_oi.T


def torch_orthogonal_conv(key, shape, dtype=jnp.float32):
    """HWIO kernel from torch orthogonal_ on the flattened [O, I*kh*kw] view."""
    kh, kw, cin, cout = shape
    w = _orthogonal_rows(key, cout, cin * kh * kw, dtype)  # [O, I*kh*kw]
    w = w.reshape(cout, cin, kh, kw)  # OIHW
    return jnp.transpose(w, (2, 3, 1, 0))  # HWIO


def chrono_gate_bias(timesteps):
    """Chrono init: bias ~ log U(1, T-1) (reference intent at models/InT.py:127)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype, minval=1.0, maxval=max(float(timesteps - 1), 1.0 + 1e-6))
        return jnp.log(u)

    return init


def constant(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
