"""bench.py protocol functions run end-to-end at tiny shapes.

bench.py is the driver-graded artifact: a silent import error or a broken
measurement path costs a whole round's perf record, so the suite pins that
every measurement mode builds its model, steps it, and returns finite
numbers. Values are meaningless on CPU at these shapes — only the contract
is asserted.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root module


def test_measure_streamed_tiny():
    res = bench.measure(batch=2, timesteps=4, iters=1, warmup=1)
    assert np.isfinite(res["clips_per_sec"]) and res["clips_per_sec"] > 0
    assert res["batch"] == 2 and res["timesteps"] == 4
    assert np.isfinite(res["p50_batch_latency_s"])


def test_measure_fused_tiny():
    res = bench.measure_fused(batch=2, timesteps=4, iters=1, warmup=1,
                              fused_steps=2)
    assert np.isfinite(res["clips_per_sec"]) and res["clips_per_sec"] > 0
    assert res["fused_steps"] == 2


def test_measure_infer_tiny():
    res = bench.measure_infer(batch=2, timesteps=4, iters=2, warmup=1)
    assert np.isfinite(res["clips_per_sec"]) and res["clips_per_sec"] > 0
    assert np.isfinite(res["p50_batch_latency_s"])


def test_measure_data_tiny(tmp_path, monkeypatch):
    from pathtracker_tpu.data.pathtracker import make_synthetic_dataset

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_train=12, n_test=2, timesteps=4, shards=2)
    monkeypatch.setenv("BENCH_DATA_GLOB", os.path.join(root, "train-*"))
    res = bench.measure_data(batch=4, timesteps=4, iters=1)
    assert np.isfinite(res["clips_per_sec"]) and res["clips_per_sec"] > 0
    assert res["epoch_clips"] == 12
    res_py = bench.measure_data(batch=4, timesteps=4, iters=1,
                                pure_python=True)
    assert res_py["decoder"] == "pure_python"
    assert np.isfinite(res_py["clips_per_sec"]) and res_py["clips_per_sec"] > 0


def test_yield_device_guards(tmp_path, monkeypatch):
    """bench._yield_device must only signal a live pid whose cmdline looks
    like one of our training CLIs — never a stale pid, never an unrelated
    process — and must return promptly once the target exits (zombie
    counts as released). The post-yield settle (BENCH_SETTLE_S, default
    10 s — a chip-quiescence pause, not guard logic) is pinned to 0 so the
    promptness bound measures exit detection alone."""
    import subprocess

    monkeypatch.setenv("BENCH_SETTLE_S", "0")
    import sys
    import time

    pidfile = tmp_path / "run.pid"

    # Missing / stale pidfiles are no-ops.
    bench._yield_device(str(pidfile))
    pidfile.write_text("999999")
    bench._yield_device(str(pidfile))

    # An unrelated live process is left alone.
    bystander = subprocess.Popen([sys.executable, "-c",
                                  "import time; time.sleep(30)"])
    try:
        pidfile.write_text(str(bystander.pid))
        bench._yield_device(str(pidfile), wait_s=2)
        assert bystander.poll() is None, "killed an unrelated process"
    finally:
        bystander.kill()
        bystander.wait()

    # A matching training process is SIGTERMed; the wait returns as soon
    # as it dies (the zombie state before reaping counts as exited).
    trainer = subprocess.Popen([sys.executable, "-c",
                                "import time; time.sleep(30)",
                                "mainclean-marker"])
    pidfile.write_text(str(trainer.pid))
    t0 = time.perf_counter()
    bench._yield_device(str(pidfile), wait_s=20)
    assert time.perf_counter() - t0 < 10
    assert trainer.wait(timeout=5) != 0  # died by signal, not the sleep
