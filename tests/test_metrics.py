"""Metric semantics parity with reference utils/misc_functions.py:12-45,
including its quirks (0.5 threshold on logits, recall = tp/batch)."""

import numpy as np

from pathtracker_tpu.utils.metrics import acc_scores, bce_with_logits, eval_accuracy


def test_acc_scores_reference_semantics():
    target = np.array([1, 1, 0, 0], np.float32)
    logits = np.array([0.6, 0.2, 0.7, -1.0], np.float32)
    balacc, precision, recall, f1s = acc_scores(target, logits)
    # preds at >0.5: [1, 0, 1, 0] -> correct [1,0,0,1]; tp=1; tpfp=2
    assert float(balacc) == 50.0
    assert float(precision) == 0.5
    assert float(recall) == 0.25  # tp / batch_size (reference quirk)
    np.testing.assert_allclose(float(f1s), 2 * 1 / (4 + 2))


def test_acc_scores_zero_pred_guard():
    target = np.array([1, 0], np.float32)
    logits = np.array([-1.0, -1.0], np.float32)
    balacc, precision, recall, f1s = acc_scores(target, logits)
    assert float(balacc) == 50.0
    assert float(precision) == 0.0  # tp / 1e-6 guard


def test_eval_accuracy_zero_threshold():
    target = np.array([1, 0], np.float32)
    logits = np.array([0.2, 0.2], np.float32)  # >0 threshold -> preds [1,1]
    assert float(eval_accuracy(target, logits)) == 0.5


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    z = rng.standard_normal(32).astype(np.float32)
    y = (rng.uniform(size=32) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(z, y))
    theirs = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(z), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_acc_scores_matches_torch_reference_loop():
    """Cross-check against a literal reimplementation of the reference's
    per-sample loop semantics."""
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(64).astype(np.float32)
    target = (rng.uniform(size=64) > 0.4).astype(np.float32)
    pred = (logits > 0.5).astype(np.float32)
    correct = pred == target
    tp = correct[target == 1].sum()
    P = target.shape[0]
    tpfp = max(pred.sum(), 1e-6)
    exp_bacc = correct.sum() / float(P) * 100
    exp_prec = tp / tpfp
    exp_rec = tp / P
    exp_f1 = 2 * tp / (P + tpfp)
    balacc, precision, recall, f1s = acc_scores(target, logits)
    np.testing.assert_allclose(float(balacc), exp_bacc, rtol=1e-6)
    np.testing.assert_allclose(float(precision), exp_prec, rtol=1e-6)
    np.testing.assert_allclose(float(recall), exp_rec, rtol=1e-6)
    np.testing.assert_allclose(float(f1s), exp_f1, rtol=1e-6)
