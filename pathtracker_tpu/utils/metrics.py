"""Training metrics with the reference's exact (quirky) semantics.

reference utils/misc_functions.py:12-45 defines:
  * train-time `acc_scores(target, logits)`: prediction = logit > 0.5 —
    thresholding *logits* at 0.5 (not 0), which biases the train meter low;
    deliberately reproduced because the logged curves feed checkpoint
    selection downstream;
  * bal-acc = mean(pred == target) * 100 (not actually class-balanced);
  * recall = tp / batch_size (sic, denominator is the whole batch);
  * precision = tp / max(#predicted-positive, 1e-6);
  * f1 = 2*tp / (batch_size + #predicted-positive).

Eval scripts instead use logit > 0 (reference test_model.py:127); that is
`eval_accuracy` here. All functions are jit-friendly jnp code (the reference
looped in Python per sample, a per-step host sync)."""

from __future__ import annotations

import jax.numpy as jnp


def acc_scores(target, logits):
    """Train-meter metrics. target [B] in {0,1}; logits [B,1] or [B].

    Returns (balacc*100, precision, recall, f1) as 0-d arrays."""
    target = jnp.reshape(target, (-1,))
    pred = (jnp.reshape(logits, (-1,)) > 0.5).astype(jnp.float32)
    correct = (pred == target).astype(jnp.float32)
    tp = jnp.sum(correct * (target == 1))
    batch = target.shape[0]
    tpfp = jnp.maximum(jnp.sum(pred), 1e-6)
    balacc = jnp.mean(correct) * 100.0
    precision = tp / tpfp
    recall = tp / batch
    f1s = (2.0 * tp) / (batch + tpfp)
    return balacc, precision, recall, f1s


def eval_accuracy(target, logits):
    """Eval accuracy: mean(target == (logit > 0)) (reference test_model.py:127)."""
    target = jnp.reshape(target, (-1,)).astype(jnp.float32)
    pred = (jnp.reshape(logits, (-1,)) > 0.0).astype(jnp.float32)
    return jnp.mean(target == pred)


def bce_with_logits(logits, target):
    """Mean BCEWithLogitsLoss (reference mainclean.py:156,190)."""
    z = jnp.reshape(logits, (-1,))
    y = jnp.reshape(target, (-1,))
    return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


def metric_scores(target, preds):
    """Metrics from already-thresholded byte predictions (reference
    utils/misc_functions.py:12-29): bal-acc/precision/recall/f1 with the same
    denominators as acc_scores but preds given, not derived from logits."""
    target = jnp.reshape(target, (-1,)).astype(jnp.float32)
    pred = jnp.reshape(preds, (-1,)).astype(jnp.float32)
    correct = (pred == target).astype(jnp.float32)
    tp = jnp.sum(correct * (target == 1))
    batch = target.shape[0]
    tpfp = jnp.maximum(jnp.sum(pred), 1e-6)
    return (jnp.mean(correct) * 100.0, tp / tpfp, tp / batch,
            (2.0 * tp) / (batch + tpfp))


def accuracy_topk(output, target, topk=(1,)):
    """Top-k accuracy over class logits [B, K] (reference
    utils/misc_functions.py:138-151). Returns one value per k, in percent."""
    target = jnp.reshape(target, (-1,))
    maxk = max(topk)
    idx = jnp.argsort(output, axis=-1)[:, ::-1][:, :maxk]  # [B, maxk]
    correct = (idx == target[:, None]).astype(jnp.float32)
    return [jnp.sum(correct[:, :k]) * (100.0 / target.shape[0]) for k in topk]


def focal_loss(logits, target, gamma: float = 0.0, alpha: float | None = None):
    """Binary focal loss on logits (reference utils/misc_functions.py:83-114
    defined this for softmax inputs but never used it; provided in the binary
    form that matches this task's single-logit contract)."""
    z = jnp.reshape(logits, (-1,))
    y = jnp.reshape(target, (-1,))
    log_p1 = -jnp.maximum(-z, 0) - jnp.log1p(jnp.exp(-jnp.abs(z)))  # log sigmoid(z)
    log_p0 = -jnp.maximum(z, 0) - jnp.log1p(jnp.exp(-jnp.abs(z)))  # log sigmoid(-z)
    logpt = y * log_p1 + (1 - y) * log_p0
    pt = jnp.exp(logpt)
    loss = -((1 - pt) ** gamma) * logpt
    if alpha is not None:
        at = y * alpha + (1 - y) * (1 - alpha)
        loss = loss * at
    return jnp.mean(loss)
