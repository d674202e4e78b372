#!/usr/bin/env python3
"""Same-host head-to-head: the reference's torch InT vs this framework.

The reference publishes no performance numbers (BASELINE.json "published": {}),
so this harness produces a directly comparable pair on identical hardware
(CPU, same process count): full train step — forward + BCEWithLogits +
backward + Adam — on the canonical InT circuit (dimensions=32, kernel=7),
reference code vs pathtracker_tpu's jitted step.

The reference snapshot cannot run unmodified (SURVEY.md header): models/InT.py
calls `super(hConvGRUCell, self)` / `super(FFhGRU, self)` with names undefined
in the module (InT.py:64,:187) and hardcodes `.cuda()` on the jv_penalty
placeholder (InT.py:243). This harness patches exactly those accidents at
runtime — aliasing the undefined names to the classes they were copy-pasted
from and making `.cuda()` a no-op on a CPU host — and nothing else.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench_cpu_vs_reference.py
Prints one JSON line with both clips/sec numbers and the speedup ratio.

CAVEAT (measured, see BASELINE.md "CPU backend note"): on this VM the
XLA:CPU side is dominated by an allocation/page-fault artifact (~100x the
op-level cost; per-op timings match torch within 1.2x), so the ratio says
nothing about the framework's TPU performance — treat this harness as a
parity/regression driver, not a benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
T = int(os.environ.get("BENCH_T", 16))
ITERS = int(os.environ.get("BENCH_ITERS", 3))


def measure_reference() -> float:
    import torch

    sys.path.insert(0, "/root/reference")
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU host
    from models import InT as ref_int

    # Alias the stale copy-paste names to their intended classes so the
    # snapshot's __init__ methods resolve (reference InT.py:64,:187).
    ref_int.hConvGRUCell = ref_int.rCell
    ref_int.FFhGRU = ref_int.InT

    torch.manual_seed(0)
    model = ref_int.InT(dimensions=32, timesteps=T, kernel_size=7,
                        jacobian_penalty=False, grad_method="bptt")
    model.train()
    criterion = torch.nn.BCEWithLogitsLoss()
    optimizer = torch.optim.Adam(model.parameters(), lr=3e-4)

    rng = np.random.default_rng(0)
    imgs = torch.from_numpy(
        rng.integers(0, 255, size=(BATCH, 3, T, 32, 32)).astype(np.float32) / 255.0)
    target = torch.from_numpy(
        rng.integers(0, 2, size=(BATCH, 1)).astype(np.float32))

    def step():
        output, jv = model.forward(imgs)
        loss = criterion(output, target)
        loss.backward()
        optimizer.step()
        optimizer.zero_grad()
        return float(loss.detach())

    step()  # warmup
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        step()
        lat.append(time.perf_counter() - t0)
    return BATCH / float(np.median(lat))


def measure_ours() -> float:
    # One timing harness for both benchmarks: bench.measure, run here on the
    # f32 parity path. The torch side reports median per-step latency with a
    # sync every step, so use the like-for-like per-step-fetch number (one
    # host fetch per step), NOT the pipelined window throughput — the two
    # protocols must match for the printed speedup to mean anything.
    from bench import measure

    res = measure(batch=BATCH, timesteps=T, iters=ITERS, warmup=1, bf16=False)
    return float(res["per_step_fetch_clips_per_sec"])


def main():
    assert (os.environ.get("JAX_PLATFORMS") == "cpu"
            and not os.environ.get("PALLAS_AXON_POOL_IPS")), \
        "run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu for a fair CPU " \
        "pair (JAX_PLATFORMS alone does not stop the axon TPU plugin)"
    ours = measure_ours()
    ref = measure_reference()
    print(json.dumps({
        "metric": f"InT fwd+bwd clips/sec, CPU head-to-head (batch {BATCH}, T {T})",
        "reference_torch_clips_per_sec": round(ref, 2),
        "pathtracker_tpu_clips_per_sec": round(ours, 2),
        "speedup": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
