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
