"""End-to-end integration: train a tiny InT on synthetic TFRecords, verify
logging/checkpoint artifacts, then run the eval and viz flows on the result.
Exercises the full reference surface: mainclean -> test_model -> viz."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "24"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "24"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "e2e", "--length", "8", "--speed", "1",
        "--dist", "1", "-b", "8", "--lr", "3e-4", "--epochs", "2",
        "--print-freq", "2", "-d", "8", "-k", "3",
        "--results-dir", str(tmp / "results"),
    ])
    result = main(args, max_steps_per_epoch=3)
    return args, result


def test_train_artifacts(trained_run):
    args, result = trained_run
    folder = result["results_folder"]
    # npz/txt observability sinks (reference mainclean.py:224-234)
    assert os.path.exists(os.path.join(folder, "train.npz"))
    assert os.path.exists(os.path.join(folder, "val.npz"))
    assert os.path.exists(os.path.join(folder, "hp_dict.npz"))
    assert os.path.exists(os.path.join(folder, "e2e.txt"))
    val = np.load(os.path.join(folder, "val.npz"))
    assert set(val.files) == {"loss", "balacc", "precision", "recall", "f1score"}
    assert len(val["balacc"]) == 2  # one entry per epoch
    train = np.load(os.path.join(folder, "train.npz"))
    assert {"loss", "balacc", "jvpen", "scaled_loss"} <= set(train.files)
    # EarlyStopping checkpoint naming (reference utils/earlystopping.py:54)
    ckpts = glob.glob(os.path.join(folder, "saved_models", "*.pth.tar"))
    assert ckpts, "no checkpoints saved"
    names = {os.path.basename(c) for c in ckpts}
    assert any(n.startswith("model_val_acc_") for n in names), names
    # Rolling last-epoch snapshot (train/loop.py) exists alongside.
    assert "model_last_epoch_checkpoint.pth.tar" in names
    assert np.isfinite(train["loss"]).all()


def test_checkpoint_roundtrip(trained_run):
    import jax

    args, result = trained_run
    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from pathtracker_tpu.train.loop import init_model

    best = ckpt_lib.find_best_checkpoint(result["results_folder"])
    _, variables = init_model(args, timesteps=8)
    restored = ckpt_lib.load_params(best, template=variables["params"])
    trained = result["params"]
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(restored),
            jax.tree_util.tree_leaves_with_path(trained)):
        assert np.asarray(va).shape == np.asarray(vb).shape


def test_eval_flow(trained_run):
    args, result = trained_run
    from pathtracker_tpu.eval.test_model import evaluate_model
    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from types import SimpleNamespace

    eargs = SimpleNamespace(**vars(args))
    eargs.ckpt = ckpt_lib.find_best_checkpoint(result["results_folder"])
    acc, loss = evaluate_model(result["results_folder"], eargs, prep_gifs=0,
                               dist=1, speed=1, length=8)
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(loss)
    out = os.path.join(result["results_folder"], "test_perf_dist_1_speed_1_length_8.npz")
    assert os.path.exists(out)


def test_eval_flow_writes_gifs(trained_run):
    """prep_gifs > 0 on the eval flow must produce the per-clip GIF
    artifacts for recurrent models (reference utils/engine.py:305-340 via
    test_model.py:136-139), not just the npz."""
    args, result = trained_run
    from pathtracker_tpu.eval.test_model import evaluate_model
    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from types import SimpleNamespace

    eargs = SimpleNamespace(**vars(args))
    eargs.ckpt = ckpt_lib.find_best_checkpoint(result["results_folder"])
    evaluate_model(result["results_folder"], eargs, prep_gifs=2,
                   dist=1, speed=1, length=8)
    gifs = glob.glob(os.path.join(result["results_folder"],
                                  "test_dist_1_speed_1_length_8",
                                  "gif_*", "*.gif"))
    assert len(gifs) >= 2, f"expected >=2 eval GIFs, found {gifs}"
    assert all(os.path.getsize(g) > 0 for g in gifs)


def test_viz_flow(trained_run, monkeypatch):
    args, result = trained_run
    from pathtracker_tpu.data import registry
    from pathtracker_tpu.eval import viz
    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from types import SimpleNamespace

    # Point a human set at the tiny synthetic config.
    monkeypatch.setitem(registry.HUMAN_DATASETS, "gen_test",
                        {"dist": 1, "speed": 1, "length": 8})
    vargs = SimpleNamespace(**vars(args))
    vargs.ckpt = ckpt_lib.find_best_checkpoint(result["results_folder"])
    vargs.set_name = "gen_test"
    vargs.batch_size = 8
    model_acc, human_acc = viz.evaluate_model(vargs, result["results_folder"],
                                              batch_size=8)
    assert 0.0 <= model_acc <= 1.0
    npz = os.path.join(result["results_folder"], "mturk_visualizations_gen_test.npz")
    assert os.path.exists(npz)
    data = np.load(npz)
    assert "pos_grads" in data and "attention" in data


def test_device_resident_training(tmp_path):
    """--device-data: whole dataset in (virtual) device memory, batches
    gathered inside the jitted step; artifacts identical in shape to the
    streaming path."""
    import jax.numpy as jnp

    from pathtracker_tpu.data.resident import (ResidentBatches,
                                               make_resident_train_step)
    from pathtracker_tpu.models.int_circuit import InT
    from pathtracker_tpu.train.steps import make_optimizer

    import jax

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, size=(12, 4, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=(12,), dtype=np.uint8)
    model = InT(dimensions=8, timesteps=4, kernel_size=3)
    sample = jnp.zeros((4, 3, 4, 16, 16), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    opt = make_optimizer(1e-3)
    step = make_resident_train_step(model, "InT", opt, n_clips=12,
                                    batch_size=4, seed=0)
    assert step.steps_per_epoch == 3
    dc, dl = jax.device_put(clips), jax.device_put(labels)
    opt_state = opt.init(params)
    losses = []
    for _ in range(3):  # one epoch: every clip exactly once (permutation)
        params, opt_state, stats = step(params, opt_state, dc, dl)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses)

    batches = list(ResidentBatches(dc, dl, 5))
    assert len(batches) == 2  # 12 // 5, remainder dropped
    assert batches[0][0].shape == (5, 4, 16, 16, 3)


def test_fused_resident_steps_match_unfused():
    """--fused-steps k (k optimizer steps chained in one compiled program via
    lax.scan) must be numerically identical to k separate step dispatches:
    same per-step stats, same final params. Tail windows shorter than k
    (steps_per_epoch not divisible by fused_steps) must keep the epoch
    accounting exact."""
    import jax
    import jax.numpy as jnp

    from pathtracker_tpu.data.resident import make_resident_train_step
    from pathtracker_tpu.models.int_circuit import InT
    from pathtracker_tpu.train.steps import make_optimizer

    rng = np.random.default_rng(1)
    clips = rng.integers(0, 255, size=(12, 4, 16, 16, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=(12,), dtype=np.uint8)
    model = InT(dimensions=8, timesteps=4, kernel_size=3)
    sample = jnp.zeros((4, 3, 4, 16, 16), jnp.float32)
    params0 = model.init(jax.random.key(0), sample)["params"]
    opt = make_optimizer(1e-3)
    dc, dl = jax.device_put(clips), jax.device_put(labels)

    def run(fused):
        step = make_resident_train_step(model, "InT", opt, n_clips=12,
                                        batch_size=4, seed=0,
                                        fused_steps=fused)
        params = jax.tree.map(jnp.copy, params0)
        opt_state = opt.init(params)
        stats_all = []
        for _ in range(step.windows_per_epoch * 2):  # two epochs
            params, opt_state, stats = step(params, opt_state, dc, dl)
            stats_all.append(np.atleast_1d(stats["loss"]))
        return params, np.concatenate(stats_all)

    p1, l1 = run(1)
    # steps_per_epoch=3, fused=2 -> windows of 2 + tail of 1 per epoch
    p2, l2 = run(2)
    assert len(l1) == len(l2) == 6
    np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-7)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))


def test_clip_grad_bounds_update():
    """--clip-grad: global-norm clipping caps the effective gradient fed to
    Adam; with a tiny clip the applied update shrinks accordingly, and with
    clip=None the optimizer is plain Adam (reference parity — its
    clip_grad_norm_ is print-only, misc_functions.py:48-69)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pathtracker_tpu.train.steps import make_optimizer

    params = {"w": jnp.zeros((4,))}
    grads = {"w": jnp.asarray([3.0, -4.0, 0.0, 0.0])}  # global norm 5

    clipped = make_optimizer(1e-3, clip_grad=0.5)
    st = clipped.init(params)
    updates, _ = clipped.update(grads, st, params)
    # After clipping to norm 0.5 the gradient direction is preserved; Adam's
    # first-step update is -lr * sign-ish (m/sqrt(v) with eps), so compare
    # against plain Adam fed the pre-clipped gradient explicitly.
    ref = make_optimizer(1e-3)
    strf = ref.init(params)
    g_scaled = jax.tree.map(lambda g: g * (0.5 / 5.0), grads)
    ref_updates, _ = ref.update(g_scaled, strf, params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.asarray(ref_updates["w"]), rtol=1e-6)

    # clip above the true norm is a no-op: identical to unclipped Adam.
    loose = make_optimizer(1e-3, clip_grad=100.0)
    stl = loose.init(params)
    lupd, _ = loose.update(grads, stl, params)
    nupd, _ = ref.update(grads, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(lupd["w"]), np.asarray(nupd["w"]),
                               rtol=1e-6)


def test_accum_steps_averages_microbatch_gradients():
    """--accum-steps K: no update until the K-th micro-batch, then one Adam
    step on the MEAN of the K micro-gradients (K x effective batch)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pathtracker_tpu.train.steps import make_optimizer

    params = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0])}
    g1 = {"w": jnp.asarray([3.0, -4.0, 1.0, 0.0])}
    g2 = {"w": jnp.asarray([-1.0, 2.0, 1.0, 6.0])}

    acc = make_optimizer(1e-3, accum_steps=2)
    st = acc.init(params)
    upd1, st = acc.update(g1, st, params)
    # Mid-window: the emitted update must be exactly zero.
    np.testing.assert_array_equal(np.asarray(upd1["w"]), np.zeros(4))
    upd2, st = acc.update(g2, st, params)

    ref = make_optimizer(1e-3)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    ref_upd, _ = ref.update(g_mean, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(upd2["w"]),
                               np.asarray(ref_upd["w"]), rtol=1e-6)

    # Composes with clipping: the clip applies to the averaged gradient.
    accclip = make_optimizer(1e-3, clip_grad=0.5, accum_steps=2)
    stc = accclip.init(params)
    _, stc = accclip.update(g1, stc, params)
    updc, _ = accclip.update(g2, stc, params)
    refclip = make_optimizer(1e-3, clip_grad=0.5)
    refc_upd, _ = refclip.update(g_mean, refclip.init(params), params)
    np.testing.assert_allclose(np.asarray(updc["w"]),
                               np.asarray(refc_upd["w"]), rtol=1e-6)


def test_accum_steps_trains_e2e(tmp_path):
    """--accum-steps runs end-to-end through the train loop (opt-state
    pytree with MultiSteps wrapper survives the step/checkpoint path)."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "accum_e2e", "--length", "8",
        "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-3",
        "--epochs", "1", "-d", "4", "-k", "3", "--print-freq", "1",
        "--accum-steps", "2", "--results-dir", str(tmp_path / "results")])
    main(args, max_steps_per_epoch=2)
    res = tmp_path / "results" / "8_1_1" / "accum_e2e"
    assert (res / "train.npz").exists()
    hp = np.load(res / "hp_dict.npz", allow_pickle=True)
    assert int(hp["accum_steps"]) == 2


def test_ema_tracks_parameter_average():
    """--ema DECAY: optimizer state carries ema <- d*ema + (1-d)*params
    after every applied update; ema_params() reads it back."""
    import jax
    import jax.numpy as jnp
    import optax

    from pathtracker_tpu.train.steps import ema_params, make_optimizer

    d = 0.9
    tx = make_optimizer(1e-1, ema=d)
    p = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    st = tx.init(p)
    np.testing.assert_allclose(np.asarray(ema_params(st)["w"]),
                               np.asarray(p["w"]))
    expect = np.asarray(p["w"], dtype=np.float64)
    rng = np.random.default_rng(0)
    for _ in range(3):
        g = {"w": jnp.asarray(rng.normal(size=3), jnp.float32)}
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
        expect = d * expect + (1 - d) * np.asarray(p["w"], dtype=np.float64)
    np.testing.assert_allclose(np.asarray(ema_params(st)["w"]), expect,
                               rtol=1e-5)
    # Training params themselves are NOT averaged (trajectory untouched).
    assert not np.allclose(np.asarray(p["w"]), expect)

    # Composes with accumulation: mid-window (zero update) leaves the
    # trajectory alone while ema keeps decaying toward the held params.
    txa = make_optimizer(1e-1, accum_steps=2, ema=d)
    sta = txa.init(p)
    upd1, sta = txa.update({"w": jnp.zeros(3)}, sta, p)
    np.testing.assert_array_equal(np.asarray(upd1["w"]), np.zeros(3))


def test_ema_trains_e2e(tmp_path):
    """--ema runs end-to-end; best-val checkpoints hold the EMA weights."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    import jax

    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "ema_e2e", "--length", "8",
        "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-2",
        "--epochs", "1", "-d", "4", "-k", "3", "--print-freq", "1",
        "--ema", "0.5", "--results-dir", str(tmp_path / "results")])
    result = main(args, max_steps_per_epoch=2)
    res = tmp_path / "results" / "8_1_1" / "ema_e2e"
    hp = np.load(res / "hp_dict.npz", allow_pickle=True)
    assert str(hp["ema"]) == "0.5"
    # The best-val checkpoint holds the EMA weights — different from the
    # raw trajectory in the rolling last-epoch checkpoint.
    saved = sorted((res / "saved_models").glob("model_val_acc_*.tar"))
    assert saved, "no best-val checkpoint written"
    best = ckpt_lib.load_checkpoint(str(saved[-1]))["state_dict"]
    raw = ckpt_lib.load_checkpoint(
        str(res / "saved_models" / "model_last_epoch_checkpoint.pth.tar")
    )["state_dict"]
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for (_, a), (_, b) in zip(
                 jax.tree_util.tree_leaves_with_path(best),
                 jax.tree_util.tree_leaves_with_path(raw))]
    assert max(diffs) > 0, "EMA checkpoint identical to raw weights"


def test_ema_composes_with_fused_resident_windows(tmp_path):
    """--ema + --device-data --fused-steps: the EMA tree lives in optimizer
    state, so it must thread through the fused lax.scan window and end up
    a real average (not aliased to the raw weights)."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "ema_fused", "--length", "8",
        "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-2",
        "--epochs", "1", "-d", "4", "-k", "3", "--print-freq", "1",
        "--ema", "0.5", "--device-data", "--fused-steps", "2",
        "--results-dir", str(tmp_path / "results")])
    main(args, max_steps_per_epoch=2)
    res = tmp_path / "results" / "8_1_1" / "ema_fused"
    saved = sorted((res / "saved_models").glob("model_val_acc_*.tar"))
    assert saved, "no best-val checkpoint written"
    best = ckpt_lib.load_checkpoint(str(saved[-1]))["state_dict"]
    raw = ckpt_lib.load_checkpoint(
        str(res / "saved_models" / "model_last_epoch_checkpoint.pth.tar")
    )["state_dict"]
    import jax

    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for (_, a), (_, b) in zip(
                 jax.tree_util.tree_leaves_with_path(best),
                 jax.tree_util.tree_leaves_with_path(raw))]
    assert max(diffs) > 0, "EMA checkpoint identical to raw weights"


def test_auto_resume_continues_from_rolling_checkpoint(tmp_path):
    """--auto-resume: a relaunched run finds the rolling last-epoch
    checkpoint in its run dir and continues (params + epoch) without any
    --ckpt/--start-epoch wiring."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    argv = ["--model", "InT", "--name", "ar", "--length", "8",
            "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-3",
            "-d", "4", "-k", "3", "--print-freq", "1",
            "--results-dir", str(tmp_path / "results"), "--auto-resume"]
    # First launch: nothing to resume, trains epoch 0.
    main(build_parser().parse_args(argv + ["--epochs", "1"]),
         max_steps_per_epoch=2)
    res = tmp_path / "results" / "8_1_1" / "ar"
    assert (res / "saved_models" /
            "model_last_epoch_checkpoint.pth.tar").exists()
    txt0 = (res / "ar.txt").read_text()
    assert "Epoch: [0]" in txt0 and "Epoch: [1]" not in txt0

    # Relaunch (same command, higher budget): must start at epoch 1.
    main(build_parser().parse_args(argv + ["--epochs", "2"]),
         max_steps_per_epoch=2)
    txt1 = (res / "ar.txt").read_text()
    assert "Epoch: [1]" in txt1
    # Sliced campaigns must leave ONE cumulative curve: the relaunch
    # preloads the previous slice's npz before appending, so val.npz holds
    # one entry per completed epoch across both launches (round-4 advisor
    # finding: overwriting with the latest slice stalls any driver that
    # reads len(val.npz) as campaign progress).
    val = np.load(res / "val.npz")
    assert len(val["balacc"]) == 2, val["balacc"]
    train = np.load(res / "train.npz")
    # 2 capped steps per epoch x 2 epochs, preserved across the relaunch.
    assert len(train["loss"]) == 4, train["loss"]


def test_max_steps_counts_optimizer_steps_under_fusion(tmp_path):
    """max_steps_per_epoch is an OPTIMIZER-step budget: with --fused-steps k
    each loop iteration runs a k-step window, and the cap must not multiply
    by k (regression: the break compared the window index, allowing k x the
    requested steps)."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "24"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "24"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "cap", "--length", "8", "--speed", "1",
        "--dist", "1", "-b", "4", "--lr", "3e-4", "--epochs", "1",
        "--print-freq", "100", "-d", "8", "-k", "3",
        "--device-data", "--fused-steps", "2",
        "--results-dir", str(tmp_path / "results"),
    ])
    result = main(args, max_steps_per_epoch=2)
    train = np.load(os.path.join(result["results_folder"], "train.npz"))
    # one fused window of 2 steps, then the budget is exhausted
    assert len(train["loss"]) == 2, len(train["loss"])


def test_sigterm_saves_rolling_checkpoint(tmp_path):
    """Bounded runs die by SIGTERM (`timeout N python mainclean.py ...`);
    the loop must catch the first one, save the rolling last-epoch
    checkpoint + npz logs, and exit cleanly (rc=0) so nothing since the
    last val improvement is lost."""
    import signal
    import subprocess
    import sys
    import time

    env = dict(os.environ)
    env["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    env["PATHTRACKER_SYNTH_TRAIN"] = "24"
    env["PATHTRACKER_SYNTH_TEST"] = "24"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.join(repo, "mainclean.py"),
         "--model", "InT", "--name", "sig", "--length", "8", "--speed", "1",
         "--dist", "1", "-b", "4", "--lr", "3e-4", "--epochs", "500",
         "--print-freq", "1", "-d", "8", "-k", "3",
         "--results-dir", str(tmp_path / "results")],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    # Wait for the first logged step (compile done, training under way).
    deadline = time.time() + 300
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("Epoch: [0]"):
            break
        assert time.time() < deadline, "".join(lines)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    lines.append(out)
    text = "".join(lines)
    assert proc.returncode == 0, text
    assert "terminated: logs + rolling checkpoint saved" in text, text
    folder = os.path.join(str(tmp_path / "results"), "8_1_1", "sig")
    assert os.path.exists(os.path.join(
        folder, "saved_models", "model_last_epoch_checkpoint.pth.tar"))
    assert os.path.exists(os.path.join(folder, "train.npz"))


def test_build_lr_schedule_kinds():
    """Schedule values at epoch boundaries: step decays by gamma at each
    --lr_steps epoch, cosine ends near 0, warmup ramps from 0, and
    start_step offsets a resumed run into the decayed region."""
    from pathtracker_tpu.train.steps import build_lr_schedule

    assert build_lr_schedule("none", 1e-3, 10, 100) is None

    step = build_lr_schedule("step", 1e-3, 10, 100, lr_steps=[2, 5],
                             gamma=0.1)
    assert float(step(0)) == pytest.approx(1e-3)
    assert float(step(20)) == pytest.approx(1e-4)   # after epoch 2
    assert float(step(50)) == pytest.approx(1e-5)   # after epoch 5

    cos = build_lr_schedule("cosine", 1e-3, 10, 100)
    assert float(cos(0)) == pytest.approx(1e-3)
    assert float(cos(1000)) == pytest.approx(0.0, abs=1e-9)

    warm = build_lr_schedule("warmup_cosine", 1e-3, 10, 100,
                             warmup_epochs=2.0)
    assert float(warm(0)) == pytest.approx(0.0, abs=1e-12)
    assert float(warm(20)) == pytest.approx(1e-3, rel=1e-3)
    assert float(warm(1000)) < 1e-6

    resumed = build_lr_schedule("step", 1e-3, 10, 100, lr_steps=[2],
                                gamma=0.1, start_step=30)
    assert float(resumed(0)) == pytest.approx(1e-4)  # already past epoch 2

    with pytest.raises(ValueError):
        build_lr_schedule("exotic", 1e-3, 10, 100)


def test_lr_schedule_changes_adam_update_size():
    """A piecewise schedule passed to make_optimizer really drives the Adam
    step size: for a constant gradient the bias-corrected update magnitude
    equals the lr, so across a x0.1 boundary the deltas shrink x0.1."""
    import jax.numpy as jnp
    import optax

    from pathtracker_tpu.train.steps import make_optimizer

    sched = optax.piecewise_constant_schedule(1e-3, {1: 0.1})
    tx = make_optimizer(1e-3, schedule=sched)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    state = tx.init(params)
    u0, state = tx.update(grads, state, params)
    u1, state = tx.update(grads, state, params)
    d0 = float(jnp.abs(u0["w"]).mean())
    d1 = float(jnp.abs(u1["w"]).mean())
    assert d0 == pytest.approx(1e-3, rel=1e-3)
    assert d1 == pytest.approx(1e-4, rel=1e-3)


def test_lr_schedule_trains_e2e(tmp_path):
    """--lr-schedule plumbs through the CLI into the jitted step and the
    hp_dict snapshot records it."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    args = build_parser().parse_args([
        "--model", "InT", "--name", "sched_e2e", "--length", "8",
        "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-3",
        "--epochs", "1", "-d", "4", "-k", "3", "--print-freq", "1",
        "--lr-schedule", "warmup_cosine", "--warmup-epochs", "0.5",
        "--results-dir", str(tmp_path / "results")])
    main(args, max_steps_per_epoch=2)
    res = tmp_path / "results" / "8_1_1" / "sched_e2e"
    hp = np.load(res / "hp_dict.npz", allow_pickle=True)
    assert str(hp["lr_schedule"]) == "warmup_cosine"


def test_rolling_checkpoint_carries_optimizer_state(tmp_path):
    """The rolling last-epoch checkpoint roundtrips the optimizer state:
    Adam moments/count (and EMA when present) restore exactly through the
    msgpack extra payload."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from pathtracker_tpu.train import checkpoint as ckpt_lib
    from pathtracker_tpu.train.loop import _opt_state_extra
    from pathtracker_tpu.train.steps import make_optimizer

    tx = make_optimizer(1e-3, ema=0.99)
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    state = tx.init(params)
    for _ in range(3):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)

    path = str(tmp_path / "roll.pth.tar")
    ckpt_lib.save_checkpoint(path, params, epoch=2,
                             extra=_opt_state_extra(state))
    loaded = ckpt_lib.load_checkpoint(path)
    assert "opt_state" in loaded["extra"]
    restored = serialization.from_state_dict(tx.init(params),
                                             loaded["extra"]["opt_state"])
    flat_a = jax.tree.leaves(state)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # the Adam count really advanced and survived
    counts = [np.asarray(l) for l in flat_b
              if np.asarray(l).dtype == np.int32 and np.asarray(l).ndim == 0]
    assert any(int(c) == 3 for c in counts)


def test_auto_resume_restores_optimizer_state_e2e(tmp_path, capsys):
    """A relaunched --auto-resume run restores Adam moments/count from the
    rolling checkpoint (and falls back to fresh moments when the optimizer
    flags changed shape)."""
    os.environ["PATHTRACKER_DATA_ROOT"] = str(tmp_path / "data")
    os.environ["PATHTRACKER_SYNTH_TRAIN"] = "16"
    os.environ["PATHTRACKER_SYNTH_TEST"] = "16"

    from pathtracker_tpu.train.loop import main
    from pathtracker_tpu.utils.opts import build_parser

    argv = ["--model", "InT", "--name", "optresume", "--length", "8",
            "--speed", "1", "--dist", "1", "-b", "4", "--lr", "1e-3",
            "-d", "4", "-k", "3", "--print-freq", "1", "--auto-resume",
            "--results-dir", str(tmp_path / "results")]
    main(build_parser().parse_args(argv + ["--epochs", "1"]),
         max_steps_per_epoch=2)
    capsys.readouterr()
    main(build_parser().parse_args(argv + ["--epochs", "2"]),
         max_steps_per_epoch=2)
    out = capsys.readouterr().out
    assert "optimizer state restored" in out

    # Changed optimizer shape (--ema adds a wrapper state): graceful fresh
    # init instead of a crash.
    main(build_parser().parse_args(argv + ["--epochs", "3", "--ema", "0.9"]),
         max_steps_per_epoch=2)
    out = capsys.readouterr().out
    assert "incompatible with the current flags" in out
