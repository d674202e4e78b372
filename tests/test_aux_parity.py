"""Tests for the auxiliary reference-parity modules: group transforms,
presets, legacy dataset, grad tools, extra metrics, ClockHGRU, ViT."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_group_transforms_roundtrip():
    from pathtracker_tpu.data.transforms import (
        Augmentation, Compose, ConvertBCHWtoCBHW, ConvertBHWCtoBCHW,
        GroupScale, Stack, ToFloatTensorFormat)

    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(4, 16, 16, 3), dtype=np.uint8)

    assert GroupScale(16)(clip) is clip  # no-op fast path
    up = GroupScale(32)(clip)
    assert up.shape == (4, 32, 32, 3)

    # flip index 3 = both axes; applying twice restores the clip
    aug = Augmentation(3)
    np.testing.assert_array_equal(aug(aug(clip)), clip)
    # index 1 flips horizontally only
    np.testing.assert_array_equal(Augmentation(1)(clip), clip[:, :, ::-1])

    stacked = Stack()([clip[i] for i in range(4)])
    np.testing.assert_array_equal(stacked, clip)

    pipe = Compose([ToFloatTensorFormat(), ConvertBHWCtoBCHW(),
                    ConvertBCHWtoCBHW()])
    out = pipe(clip)
    assert out.shape == (3, 4, 16, 16) and out.dtype == np.float32
    assert out.max() <= 1.0


def test_presets_shapes():
    from pathtracker_tpu.data.presets import (
        VideoClassificationPresetEval, VideoClassificationPresetTrain)

    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(4, 16, 16, 3), dtype=np.uint8)
    for preset in (VideoClassificationPresetTrain(resize_size=32),
                   VideoClassificationPresetEval(resize_size=32)):
        out = preset(clip)
        assert out.shape == (3, 4, 32, 32)
        assert out.dtype == np.float32


def test_legacy_dataset(tmp_path):
    from pathtracker_tpu.data.legacy_dataset import DataSetPol

    rng = np.random.default_rng(0)
    vid = tmp_path / "vid0"
    vid.mkdir()
    frames = rng.integers(0, 255, size=(3, 8, 8, 3), dtype=np.uint8)
    for i in range(3):
        np.save(vid / f"{i + 1:05d}.png.npy", frames[i])
    listfile = tmp_path / "list.txt"
    listfile.write_text("vid0 3 1\n")

    ds = DataSetPol(str(tmp_path), str(listfile))
    assert len(ds) == 1
    clip, label = ds[0]
    assert label == 1
    np.testing.assert_array_equal(clip, frames)


def test_grad_tools():
    from pathtracker_tpu.utils.gradtools import (clip_grad_norm,
                                                 global_grad_norm,
                                                 grad_flow_stats)

    grads = {"layer_kernel": jnp.full((4,), 3.0), "layer_bias": jnp.ones((2,))}
    total = float(global_grad_norm(grads))
    np.testing.assert_allclose(total, np.sqrt(4 * 9 + 2), rtol=1e-6)

    # do=False reports without clipping (reference semantics)
    same, norm = clip_grad_norm(grads, max_norm=1.0, do=False)
    np.testing.assert_allclose(np.asarray(same["layer_kernel"]), 3.0)
    clipped, norm = clip_grad_norm(grads, max_norm=1.0, do=True)
    np.testing.assert_allclose(float(global_grad_norm(clipped)), 1.0, rtol=1e-4)

    rows = grad_flow_stats(grads)
    assert len(rows) == 1 and "kernel" in rows[0][0]  # bias filtered out


def test_metric_scores_and_topk():
    from pathtracker_tpu.utils.metrics import accuracy_topk, metric_scores

    target = jnp.asarray([1, 0, 1, 0], jnp.float32)
    preds = jnp.asarray([1, 0, 0, 1], jnp.float32)
    balacc, precision, recall, f1 = metric_scores(target, preds)
    np.testing.assert_allclose(float(balacc), 50.0)
    np.testing.assert_allclose(float(precision), 0.5)
    np.testing.assert_allclose(float(recall), 0.25)

    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.15, 0.1]])
    t = jnp.asarray([1, 2])
    top1, top2 = accuracy_topk(logits, t, topk=(1, 2))
    np.testing.assert_allclose(float(top1), 50.0)
    np.testing.assert_allclose(float(top2), 50.0)
    top3 = accuracy_topk(logits, t, topk=(3,))[0]
    np.testing.assert_allclose(float(top3), 100.0)


@pytest.mark.parametrize("clock_type", ["fixed", "dynamic"])
def test_clock_hgru(clock_type):
    from pathtracker_tpu.models.hgru import ClockHGRU

    model = ClockHGRU(dimensions=8, timesteps=8, kernel_size=3,
                      clock_type=clock_type)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 8, 16, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    logit, jv = model.apply(variables, x)
    assert logit.shape == (2, 1)
    assert np.isfinite(np.asarray(logit)).all()
    logit2, states, gates = model.apply(variables, x, testmode=True)
    np.testing.assert_allclose(np.asarray(logit), np.asarray(logit2), rtol=1e-5)
    assert states.shape == (2, 8, 1, 16, 16)


def test_clock_hgru_fixed_holds_slow_channels():
    """With the fixed clock, slow-group channels must hold state between
    their update steps — checked via the registry name."""
    from pathtracker_tpu.models.registry import model_selector

    model = model_selector("clock_hgru_fixed", timesteps=8, dimensions=8,
                           fb_kernel_size=3)
    assert model.clock_type == "fixed"


def test_vit_forward():
    from pathtracker_tpu.models.vit import ViT

    model = ViT(image_size=32, patch_size=8, dim=32, depth=1, heads=2,
                dim_head=16, mlp_dim=64)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), img)
    out = model.apply(variables, img)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_plot_results_panels_and_gifs(tmp_path):
    """plot_results writes the panel pdf and per-clip GIFs (reference
    utils/engine.py:272-340: Img/Attn/Activity panels + imageio GIF writer)."""
    from pathtracker_tpu.eval.plots import plot_results

    rng = np.random.default_rng(0)
    b, t, c, h, w = 2, 8, 4, 8, 8
    states = rng.normal(0, 1, (b, t, 1, h, w)).astype(np.float32)
    gates = rng.normal(0, 1, (b, t, c, h, w)).astype(np.float32)
    imgs = rng.uniform(0, 1, (b, 3, t, h, w)).astype(np.float32)
    target = np.array([1.0, 0.0])
    output = np.array([2.0, -1.0])
    plot_results(states, imgs, target, output, timesteps=t, gates=gates,
                 prep_gifs=1, results_folder=str(tmp_path))
    assert (tmp_path / "random_selection.pdf").exists()
    gif = tmp_path / "gif_0" / "0.gif"
    assert gif.exists() and gif.stat().st_size > 0
    # frame pngs are cleaned up after the gif is assembled
    assert not list((tmp_path / "gif_0").glob("*.png"))


def test_gabor_bank_matches_reference_asset():
    """ops/gabor.py regenerates the reference's frozen conv0 stem
    (reference utils/gabor_serre.npy, loaded at reference
    models/convlstm.py:104-106 and ffstlstm.py:29) from its recovered
    closed-form recipe — Serre-HMAX 7x7 S1 gabors (sigma 2.8, lambda 3.5,
    gamma 0.3, 29-px circular aperture, mean-sub, unit-norm) over
    orientations 90-15i deg in two phases, plus the unit-mean disk.
    A reference-trained ConvLSTM checkpoint therefore reproduces bit-near
    through this stem."""
    from pathtracker_tpu.ops.gabor import gabor_bank, gabor_serre_bank

    bank = gabor_serre_bank()
    assert bank.shape == (25, 1, 7, 7) and bank.dtype == np.float32

    ref_path = "/root/reference/utils/gabor_serre.npy"
    if os.path.exists(ref_path):
        ref = np.load(ref_path)
        np.testing.assert_allclose(bank, ref, atol=1e-6)
    else:  # structural invariants still pin the recipe
        flat = bank[:24, 0].reshape(24, -1)
        np.testing.assert_allclose(flat.sum(axis=1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(flat, axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(bank[24, 0].mean(), 1.0, atol=1e-6)

    # HWIO orientation used by the flax models matches the OIHW bank.
    hwio = gabor_bank(n_filters=25, size=7, in_channels=1)
    np.testing.assert_allclose(np.transpose(hwio[:, :, 0, :], (2, 0, 1)),
                               bank[:, 0], atol=0)


def test_opts_reference_flag_surface():
    """Reference flags parse, including the launcher-only spellings the
    reference never defined (--b in viz_InT.sh, --which_tests, --set_name)."""
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args(
        "--model InT --name x --length 64 --speed 1 --dist 14 -b 180 "
        "--parallel --lr 3e-04 --epochs 2000".split())
    assert args.batch_size == 180 and args.parallel and args.lr == 3e-4
    # --b must stay unambiguous against --bf16 (argparse prefix matching)
    assert build_parser().parse_args(["--b=40"]).batch_size == 40
    assert build_parser().parse_args(
        ["--which_tests=64", "--set_name=gen_1_25_64"]).set_name == "gen_1_25_64"
