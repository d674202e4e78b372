"""Gradient observability tools (reference utils/misc_functions.py:48-69,
154-192).

The reference's `clip_grad_norm_(…, do=False)` *printed* the global grad norm
instead of clipping unless `do=True`; `plot_grad_flow` drew per-layer mean/max
bars. JAX equivalents over grad pytrees, same semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def global_grad_norm(grads) -> jnp.ndarray:
    """L2 norm over the whole grad pytree (torch clip_grad_norm_'s total_norm)."""
    leaves = [jnp.sum(jnp.square(g.astype(jnp.float32)))
              for g in jax.tree.leaves(grads)]
    return jnp.sqrt(sum(leaves))


def clip_grad_norm(grads, max_norm: float, do: bool = False, verbose: bool = False):
    """Reference semantics: report the norm; clip only when do=True.

    Returns (grads, total_norm). jit-friendly when verbose=False."""
    total = global_grad_norm(grads)
    if verbose:
        print(f"grad norm: {float(total):.6f}")
    if not do:
        return grads, total
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
                        grads), total


def grad_flow_stats(grads):
    """Per-leaf (name, mean|grad|, max|grad|) rows for kernel-like leaves
    (the reference filtered to weights with 'bias' not in name)."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = jax.tree_util.keystr(path)
        if "bias" in name:
            continue
        g = np.abs(np.asarray(leaf, dtype=np.float32))
        rows.append((name.strip("[]'\" ."), float(g.mean()), float(g.max())))
    return rows


def plot_grad_flow(grads, path: str | None = None):
    """Bar chart of per-layer mean/max grads (reference plot_grad_flow)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = grad_flow_stats(grads)
    names = [r[0] for r in rows]
    means = [r[1] for r in rows]
    maxes = [r[2] for r in rows]
    fig, ax = plt.subplots(figsize=(max(6, len(rows) * 0.5), 4))
    ax.bar(np.arange(len(rows)), maxes, alpha=0.3, lw=1, color="c", label="max")
    ax.bar(np.arange(len(rows)), means, alpha=0.7, lw=1, color="b", label="mean")
    ax.hlines(0, 0, len(rows) + 1, lw=2, color="k")
    ax.set_xticks(np.arange(len(rows)))
    ax.set_xticklabels(names, rotation="vertical", fontsize=6)
    ax.set_xlim(left=-0.5, right=len(rows) - 0.5)
    ax.set_xlabel("Layers")
    ax.set_ylabel("average gradient")
    ax.set_title("Gradient flow")
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    plt.close(fig)
    return rows
