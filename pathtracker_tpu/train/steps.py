"""Jitted train / eval steps.

One compiled XLA program per step: forward (family-dispatched), BCE loss
(+ optional Jacobian penalty * 10, reference mainclean.py:195-196), backward,
Adam update, and the train metrics — no host sync except the scalar fetch for
logging. Params/opt-state buffers are donated so the update is in-place in
HBM. Under a data mesh the batch arrives sharded on axis 0 and XLA inserts
the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pathtracker_tpu.data.prepare import prepare_batch
from pathtracker_tpu.engine import model_step
from pathtracker_tpu.utils.metrics import acc_scores, bce_with_logits, eval_accuracy


def build_lr_schedule(kind: str, lr: float, steps_per_epoch: int,
                      epochs: int, lr_steps=None,
                      warmup_epochs: float = 0.0, gamma: float = 0.1,
                      start_step: int = 0):
    """Optax learning-rate schedule from epoch-level knobs, or None.

    The reference *defined* a StepLR(step_size from --lr_steps) and never
    stepped it (reference mainclean.py:160), so `kind='none'` — constant lr
    — is the parity default. The other kinds make the flag real:

      step          — x`gamma` at each epoch boundary in `lr_steps`
      cosine        — cosine decay from lr to 0 over the full run
      warmup_cosine — linear 0->lr over `warmup_epochs`, then cosine

    Schedules are indexed by OPTIMIZER step, so `steps_per_epoch` must
    already account for gradient accumulation. `start_step` offsets the
    schedule for resumed runs (fresh Adam state restarts its count at 0,
    but the decay should continue where the previous run stopped)."""
    if not kind or kind == "none":
        return None
    spe = max(1, int(steps_per_epoch))
    total = max(1, int(epochs) * spe)
    if kind == "step":
        boundaries = {int(float(e) * spe): gamma for e in (lr_steps or [])}
        base = optax.piecewise_constant_schedule(lr, boundaries)
    elif kind == "cosine":
        base = optax.cosine_decay_schedule(lr, total)
    elif kind == "warmup_cosine":
        warm = max(1, int(float(warmup_epochs) * spe))
        base = optax.warmup_cosine_decay_schedule(0.0, lr, warm, total)
    else:
        raise ValueError(f"unknown lr schedule '{kind}'")
    if start_step:
        return lambda step: base(step + start_step)
    return base


def make_optimizer(lr: float, lr_steps=None, gamma: float = 0.1,
                   clip_grad: float | None = None,
                   accum_steps: int = 1,
                   ema: float | None = None,
                   schedule=None
                   ) -> optax.GradientTransformation:
    """Adam with torch defaults (reference mainclean.py:157).

    lr_steps: optional step boundaries for a StepLR-style piecewise decay
    (xgamma at each boundary). The reference *defined* a StepLR but never
    stepped it (reference mainclean.py:160) — the train loop matches that by
    not passing lr_steps; the capability is here for real use.

    schedule: a prebuilt optax schedule (see build_lr_schedule) — takes
    precedence over lr/lr_steps. This is what `--lr-schedule` wires in.

    clip_grad: optional global-norm gradient clip applied before Adam. The
    reference's clip_grad_norm_ is print-only (`do=False`,
    misc_functions.py:48-69) so the parity default is None; the long-horizon
    recurrent configs (T=64 BPTT) occasionally emit large gradients that
    destabilize an otherwise-converged run, and `--clip-grad` bounds them."""
    if schedule is None and lr_steps:
        schedule = optax.piecewise_constant_schedule(
            lr, {int(s): gamma for s in lr_steps})
    adam = optax.adam(schedule if schedule is not None else lr,
                      b1=0.9, b2=0.999, eps=1e-8)
    tx = adam
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), adam)
    if accum_steps > 1:
        # Gradient accumulation (no reference counterpart): average grads
        # over K micro-batches, apply Adam once per window — K x the
        # effective batch beyond the single-chip memory cliff. Pure optax
        # state, so it composes with the fused-window scan unchanged.
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    if ema is not None:
        tx = with_ema(tx, ema)  # outermost: averages the applied params
    return tx


def with_ema(tx: optax.GradientTransformation,
             decay: float) -> optax.GradientTransformation:
    """Wrap an optimizer so its state carries an exponential moving average
    of the PARAMETERS (Polyak averaging): ema <- decay*ema + (1-decay)*p
    after every update. No reference counterpart; motivated by the measured
    long-horizon fine-tune instability (BASELINE.md lr-stability study —
    val accuracy wobbles epoch-to-epoch at T=64): evaluating/checkpointing
    the EMA weights smooths over the oscillation without touching the
    training trajectory. Lives in optimizer state, so it rides the fused
    lax.scan windows and checkpointing unchanged; read it back with
    `ema_params(opt_state)`."""

    def init(params):
        # Real copies, not jnp.asarray: asarray is a no-op on jax Arrays and
        # the ema tree would ALIAS the param buffers — the train step donates
        # params and opt_state separately, and aliased buffers make XLA
        # reject the execute with "donate the same buffer twice".
        return (tx.init(params), jax.tree.map(jnp.copy, params))

    def update(grads, state, params=None):
        inner, ema = state
        updates, inner = tx.update(grads, inner, params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           ema, new_params)
        return updates, (inner, ema)

    return optax.GradientTransformation(init, update)


def ema_params(opt_state):
    """Extract the EMA parameter tree from a with_ema optimizer state."""
    return opt_state[1]


def make_train_step(model, model_name: str, optimizer, penalty: bool = False,
                    prepare_kwargs: dict | None = None, seed: int = 0):
    """Build the jitted step. The step consumes the *raw uint8* batch —
    normalization/layout runs inside the compiled program (4x smaller H2D
    transfer than shipping f32, and XLA fuses the prep into the first conv).
    A per-step dropout rng (folded from `seed`) reaches models with
    stochastic layers (SlowFast's pre-head dropout); others ignore it."""
    prep = dict(prepare_kwargs or {})

    def loss_fn(params, raw_imgs, raw_labels, rng):
        imgs, target = prepare_batch(raw_imgs, raw_labels, **prep)
        output, jv_penalty = model_step(model, {"params": params}, imgs,
                                        model_name, rngs={"dropout": rng})
        loss = bce_with_logits(output, target)
        jv = jnp.mean(jv_penalty)
        total = loss + jv * 1e1 if penalty else loss
        return total, (loss, jv, output)

    _KEYS = ("loss", "scaled_loss", "jvpen", "balacc", "precision", "recall",
             "f1score")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, raw_imgs, raw_labels, step_idx):
        # Key derivation stays inside the compiled program: an eager
        # fold_in would cost a separate device dispatch per step.
        rng = jax.random.fold_in(jax.random.key(seed), step_idx)
        (total, (loss, jv, output)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, raw_imgs, raw_labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target = raw_labels.astype(jnp.float32)
        balacc, precision, recall, f1s = acc_scores(target, output)
        # Scalars packed into ONE array: the training loop host-fetches the
        # stats every step, and on a tunneled backend each separate fetch is
        # a full round trip (measured ~27ms each — 7 unpacked scalars cost
        # more than the 64-frame fwd+bwd itself).
        packed = jnp.stack([loss.astype(jnp.float32), total, jv, balacc,
                            precision, recall, f1s])
        return params, opt_state, packed

    counter = [0]

    def train_step(params, opt_state, raw_imgs, raw_labels):
        step_idx = np.uint32(counter[0])
        counter[0] += 1
        params, opt_state, packed = _step(params, opt_state, raw_imgs,
                                          raw_labels, step_idx)
        host = np.asarray(packed)  # single host fetch / sync point
        return params, opt_state, dict(zip(_KEYS, host))

    def precompile(params, opt_state, imgs_sds, labels_sds):
        """AOT lower+compile with abstract batch shapes — NO execution.

        Multi-host bring-up calls this on every rank BEFORE the
        pre-train-loop barrier: the expensive (possibly cache-missing)
        compile happens while ranks are still allowed to be skewed, the
        barrier then re-aligns them, and the first real step's compile is
        a persistent-cache hit on every rank — so Gloo's hard-coded 30 s
        first-collective window opens with millisecond skew instead of
        compile-time skew (docs/SCALING.md; tests/test_multihost.py)."""
        _step.lower(params, opt_state, imgs_sds, labels_sds,
                    np.uint32(0)).compile()

    train_step.precompile = precompile
    return train_step


def make_eval_step(model, model_name: str, prepare_kwargs: dict | None = None):
    prep = dict(prepare_kwargs or {})

    _KEYS = ("loss", "balacc", "precision", "recall", "f1score", "acc")

    @jax.jit
    def _step(params, raw_imgs, raw_labels):
        imgs, target = prepare_batch(raw_imgs, raw_labels, **prep)
        output, _ = model_step(model, {"params": params}, imgs, model_name)
        loss = bce_with_logits(output, target)
        balacc, precision, recall, f1s = acc_scores(target, output)
        packed = jnp.stack([loss.astype(jnp.float32), balacc, precision,
                            recall, f1s, eval_accuracy(target, output)])
        return packed, output

    def eval_step(params, raw_imgs, raw_labels):
        packed, output = _step(params, raw_imgs, raw_labels)
        stats = dict(zip(_KEYS, np.asarray(packed)))  # one scalar fetch
        stats["output"] = output  # stays on device unless the caller fetches
        return stats

    def precompile(params, imgs_sds, labels_sds):
        """AOT lower+compile (no execution) — see make_train_step.precompile.
        Validation is the SECOND collective site per epoch; pre-compiling it
        alongside the train step keeps end-of-epoch rank skew at fetch
        latency, not compile latency."""
        _step.lower(params, imgs_sds, labels_sds).compile()

    eval_step.precompile = precompile
    return eval_step
