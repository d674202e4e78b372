"""Checkpoint subsystem: msgpack roundtrip, strict=False partial restore,
and the reference's best-checkpoint selection convention (val.npz balacc
argmax into mtime-sorted saved_models/*.tar, reference test_model.py:59-64)."""

import os
import time

import jax.numpy as jnp
import numpy as np

from pathtracker_tpu.train.checkpoint import (find_best_checkpoint,
                                              load_checkpoint, load_params,
                                              save_checkpoint)


def _params():
    return {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                      "bias": jnp.ones((3,))},
            "head": {"kernel": jnp.full((3, 1), 2.0)}}


def test_roundtrip_and_metadata(tmp_path):
    path = str(tmp_path / "ckpt.tar")
    save_checkpoint(path, _params(), epoch=7, acc=81.25)
    state = load_checkpoint(path)
    assert int(state["epoch"]) == 7
    np.testing.assert_allclose(float(state["acc"]), 81.25)
    restored = load_params(path, template=_params())
    np.testing.assert_array_equal(np.asarray(restored["layer"]["kernel"]),
                                  np.arange(6.0).reshape(2, 3))


def test_partial_restore_strict_false(tmp_path):
    """strict=False keeps template values for missing keys (the reference viz
    script's load_ckpt(..., strict=False) phantom API)."""
    path = str(tmp_path / "ckpt.tar")
    partial = {"layer": {"kernel": jnp.zeros((2, 3)), "bias": jnp.zeros((3,))}}
    save_checkpoint(path, partial)
    template = _params()
    merged = load_params(path, template=template, strict=False)
    np.testing.assert_array_equal(np.asarray(merged["layer"]["kernel"]), 0.0)
    # 'head' missing from the checkpoint -> template value survives
    np.testing.assert_array_equal(np.asarray(merged["head"]["kernel"]), 2.0)


def test_find_best_checkpoint_selection(tmp_path):
    folder = str(tmp_path)
    os.makedirs(os.path.join(folder, "saved_models"))
    # Three checkpoints in mtime order; balacc argmax at index 1.
    for i in range(3):
        p = os.path.join(folder, "saved_models", f"ckpt_{i}.tar")
        save_checkpoint(p, _params(), epoch=i)
        t = time.time() - (3 - i) * 10
        os.utime(p, (t, t))
    np.savez(os.path.join(folder, "val"),
             balacc=np.asarray([10.0, 90.0, 50.0]))
    best = find_best_checkpoint(folder)
    assert best.endswith("ckpt_1.tar")


def test_find_best_ignores_rolling_last_epoch_snapshot(tmp_path):
    """The rolling model_last_epoch_checkpoint.pth.tar (train/loop.py writes
    it every epoch) is always the newest *.tar; best-ckpt selection must
    skip it — with the clamp (argmax beyond the improving-epochs count) it
    would otherwise always win."""
    folder = str(tmp_path)
    os.makedirs(os.path.join(folder, "saved_models"))
    for i in range(2):
        p = os.path.join(folder, "saved_models", f"ckpt_{i}.tar")
        save_checkpoint(p, _params(), epoch=i)
        t = time.time() - (3 - i) * 10
        os.utime(p, (t, t))
    rolling = os.path.join(folder, "saved_models",
                           "model_last_epoch_checkpoint.pth.tar")
    save_checkpoint(rolling, _params(), epoch=99)  # newest by mtime
    # argmax at index 5 > number of best-checkpoints -> clamp fires.
    np.savez(os.path.join(folder, "val"),
             balacc=np.asarray([10.0, 20.0, 30.0, 40.0, 50.0, 90.0]))
    best = find_best_checkpoint(folder)
    assert best.endswith("ckpt_1.tar")
