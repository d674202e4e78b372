#!/usr/bin/env python3
"""Benchmark: InT fwd+bwd throughput on 64-frame PathTracker clips.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Measures the full jitted training step (uint8 batch in, prep + forward +
BCE + backward + Adam update) on the flagship InT config (dimensions=32,
kernel=7, T=64, 32x32 clips) — the reference's canonical train config
(reference train_InT.sh:3) — at the largest batch that fits comfortably.
vs_baseline compares against the measured PyTorch-reference number when
BASELINE.json carries one; the reference publishes none ("published": {}),
so it reports the ratio to the recorded value or 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# The axon TPU backend registers through sitecustomize on PYTHONPATH
# (/root/.axon_site — see CLAUDE.md). If this process was started without
# that path (e.g. a bare `python bench.py`), register it here BEFORE jax
# imports so the benchmark cannot silently fall back to CPU.
_AXON_SITE = "/root/.axon_site"
if (os.environ.get("PALLAS_AXON_POOL_IPS") and os.path.isdir(_AXON_SITE)
        and _AXON_SITE not in sys.path):
    try:
        import axon  # noqa: F401  (already registered)
    except ImportError:
        sys.path.insert(0, _AXON_SITE)
        import sitecustomize  # noqa: F401


def _require_backend(timeout_s: float) -> None:
    """Fail fast when the device backend is unreachable.

    jax.devices() BLOCKS (not raises) while a stale axon pool grant drains
    after an abruptly-killed client, which would hang the benchmark (and
    whatever harness invoked it) indefinitely. Probe device enumeration in
    a daemon thread with a deadline and abort with rc=2 and a diagnostic
    instead. $BENCH_BACKEND_TIMEOUT_S tunes the deadline (enumeration is
    seconds when healthy; compile time is not charged against this)."""
    import threading

    out: dict = {}

    def probe():
        try:
            import jax

            out["devices"] = jax.devices()
        except Exception as e:  # surfaced below on the main thread
            out["error"] = e

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        print(f"bench: backend init did not respond within {timeout_s:.0f}s "
              "(axon tunnel wedged?) — aborting instead of hanging",
              file=sys.stderr, flush=True)
        os._exit(2)
    if "error" in out:
        raise RuntimeError(f"bench: no usable backend: {out['error']}")


def _timed_protocol(step, sync, batch: int, iters: int, warmup: int) -> dict:
    """One timing protocol for every benchmark: warmup + one true sync
    (a host fetch — block_until_ready returns early on the axon backend),
    a per-call-fetch p50 loop, then the pipelined window (N chained calls,
    one sync) that a real loop actually sustains — the per-call loop
    charges the ~27 ms tunnel round trip of its fetch to every call, a
    tunnel artifact, not a framework cost.

    step() advances one iteration and returns a sync token; sync(token)
    forces completion (a scalar host fetch)."""
    for _ in range(max(warmup, 1)):  # >=1: compile must not land in the timed loop
        tok = step()
    sync(tok)

    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        tok = step()
        sync(tok)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.asarray(lat), 50))

    t0 = time.perf_counter()
    for _ in range(iters):
        tok = step()
    sync(tok)
    pipelined = batch * iters / (time.perf_counter() - t0)
    return {
        "clips_per_sec": pipelined,
        "p50_batch_latency_s": p50,
        "per_step_fetch_clips_per_sec": batch / p50,
    }


def _time_train_step(train_step, params, opt_state, imgs, labels,
                     iters: int, warmup: int) -> dict:
    state = [params, opt_state]

    def step():
        p, o, stats = train_step(state[0], state[1], imgs, labels)
        state[0], state[1] = p, o
        return stats

    return _timed_protocol(step, lambda s: float(s["loss"]),
                           imgs.shape[0], iters, warmup)


def measure(batch: int = 128, timesteps: int = 64, iters: int = 20,
            warmup: int = 3, bf16: bool = True,
            remat_policy: str = "conv") -> dict:
    import jax
    import jax.numpy as jnp

    from pathtracker_tpu.models.int_circuit import InT
    from pathtracker_tpu.train.steps import make_optimizer, make_train_step

    # The bf16 fast path (f32 masters, bf16 activations/MXU inputs, f32 BN
    # stats + loss) is the production training configuration; BENCH_F32=1
    # measures the f32 reference-parity path instead. BENCH_REMAT picks the
    # rematerialization policy ('conv' | 'conv_gates' | 'full').
    model = InT(dimensions=32, timesteps=timesteps, kernel_size=7,
                dtype="bfloat16" if bf16 else "float32",
                remat_policy=remat_policy)
    sample = jnp.zeros((batch, 3, timesteps, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, "InT", optimizer)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(batch, timesteps, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=(batch,), dtype=np.uint8)
    imgs = jax.device_put(imgs)
    labels = jax.device_put(labels)

    res = _time_train_step(train_step, params, opt_state, imgs, labels,
                           iters, warmup)
    return {
        **res,
        "batch": batch,
        "timesteps": timesteps,
        "device": str(jax.devices()[0]),
    }


def measure_fused(batch: int = 128, timesteps: int = 64, iters: int = 10,
                  warmup: int = 2, bf16: bool = True, fused_steps: int = 12,
                  remat_policy: str = "conv") -> dict:
    """Sustained training throughput through the PRODUCTION path: a
    device-resident dataset (data/resident.py) with `fused_steps` optimizer
    steps chained inside one compiled program — exactly what
    `mainclean.py --device-data --fused-steps K` runs. Each timed window is
    one dispatch + one packed-stats fetch amortized over K steps, so this
    includes everything a real training step pays (device-side batch
    gather, per-window host fetch) and nothing it doesn't (no per-step
    dispatch gap)."""
    import jax
    import jax.numpy as jnp

    from pathtracker_tpu.data.resident import make_resident_train_step
    from pathtracker_tpu.models.int_circuit import InT
    from pathtracker_tpu.train.steps import make_optimizer

    model = InT(dimensions=32, timesteps=timesteps, kernel_size=7,
                dtype="bfloat16" if bf16 else "float32",
                remat_policy=remat_policy)
    sample = jnp.zeros((batch, 3, timesteps, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)

    # Resident set sized to an exact number of windows per epoch so every
    # timed window is the full K steps (epoch-tail windows would otherwise
    # mix shorter compiles into the timing).
    n_clips = batch * fused_steps
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, size=(n_clips, timesteps, 32, 32, 3),
                         dtype=np.uint8)
    labels = rng.integers(0, 2, size=(n_clips,), dtype=np.uint8)
    data = jax.device_put(clips)
    lbl = jax.device_put(labels)

    train_step = make_resident_train_step(
        model, "InT", optimizer, n_clips=n_clips, batch_size=batch,
        fused_steps=fused_steps)

    for _ in range(max(warmup, 1)):  # compile + steady-state warmup
        params, opt_state, stats = train_step(params, opt_state, data, lbl)

    t0 = time.perf_counter()
    steps = 0
    for _ in range(iters):
        params, opt_state, stats = train_step(params, opt_state, data, lbl)
        steps += len(np.atleast_1d(stats["loss"]))
    dt = time.perf_counter() - t0
    return {
        "clips_per_sec": batch * steps / dt,
        # MEAN per-step wall time over the whole run (not a p50: the unit
        # of dispatch is the K-step window, so per-step percentiles don't
        # exist in this protocol) — keyed distinctly so it is never
        # compared against the streamed protocols' p50.
        "amortized_step_latency_s": dt / steps,
        "fused_steps": fused_steps,
        "batch": batch,
        "timesteps": timesteps,
        "device": str(jax.devices()[0]),
    }


def measure_infer(batch: int = 128, timesteps: int = 64, iters: int = 20,
                  warmup: int = 3, bf16: bool = True) -> dict:
    """Serving throughput: the jitted inference program from
    pathtracker_tpu/eval/serve.py (wire-format uint8 frames in, prep +
    forward + sigmoid fused; no grads, no optimizer). Same pipelined-window
    protocol as measure(): N chained calls, one sync."""
    import jax
    import jax.numpy as jnp

    from pathtracker_tpu.eval.serve import make_inference_fn
    from pathtracker_tpu.models.int_circuit import InT

    model = InT(dimensions=32, timesteps=timesteps, kernel_size=7,
                dtype="bfloat16" if bf16 else "float32")
    sample = jnp.zeros((batch, 3, timesteps, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    infer = make_inference_fn(model, "InT", params)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(
        0, 255, size=(batch, timesteps, 32, 32, 3), dtype=np.uint8))

    res = _timed_protocol(lambda: infer(imgs), lambda out: float(out[0]),
                          batch, iters, warmup)
    return {
        "clips_per_sec": res["clips_per_sec"],
        "p50_batch_latency_s": res["p50_batch_latency_s"],
        "batch": batch,
        "timesteps": timesteps,
        "device": str(jax.devices()[0]),
    }


def measure_data(batch: int = 128, timesteps: int = 64, iters: int = 2,
                 pure_python: bool = False) -> dict:
    """HOST input-pipeline throughput (no device work): the TFRecord
    pipeline — GZIP inflate + proto parse (native C++ decoder unless
    pure_python) + shuffle + index-gather batching + prefetch thread —
    over the canonical on-disk shards. The pipeline must outpace the chip
    (headline 671 clips/s consumed) for the streamed path to never stall;
    this measures by how much. Runs on any backend (pure host code)."""
    import glob as _g

    from pathtracker_tpu.data import native as _native
    from pathtracker_tpu.data.pipeline import tfr_data_loader
    from pathtracker_tpu.data.registry import dataset_selector

    pattern = os.environ.get("BENCH_DATA_GLOB")
    t = timesteps
    if not pattern:
        os.environ.setdefault(
            "PATHTRACKER_DATA_ROOT",
            os.path.join(os.path.dirname(__file__), "datasets"))
        root, t, _, _ = dataset_selector(dist=14, speed=1, length=timesteps)
        pattern = root + "train-*"
    if not _g.glob(pattern):
        raise FileNotFoundError(f"no shards match {pattern}")

    restore = None
    if pure_python and _native.available():
        restore, _native.available = _native.available, lambda: False
    try:
        loader = tfr_data_loader(pattern, batch_size=batch, timesteps=t,
                                 shuffle_buffer=1000, seed=0)
        n_warm = sum(b.shape[0] for b, _ in loader)  # warm page cache + pools
        t0 = time.perf_counter()
        clips = 0
        for _ in range(iters):
            for b, lbl in loader:
                clips += b.shape[0]
        dt = time.perf_counter() - t0
    finally:
        if restore is not None:
            _native.available = restore
    return {
        "clips_per_sec": clips / dt,
        "decoder": "pure_python" if pure_python else (
            "native_cc" if _native.available() else "pure_python"),
        "batch": batch,
        "timesteps": t,
        "epoch_clips": n_warm,
    }


def measure_model(model_name: str, batch: int, timesteps: int = 64,
                  iters: int = 10, warmup: int = 3, bf16: bool = True) -> dict:
    """Full jitted train step (uint8 in, prep + forward + BCE + backward +
    Adam) for any registry model name — the zoo benchmark path. Same
    pipelined-window protocol as measure()."""
    from types import SimpleNamespace

    import jax

    from pathtracker_tpu.train.loop import init_model
    from pathtracker_tpu.train.steps import make_optimizer, make_train_step

    args = SimpleNamespace(model=model_name, bf16=bf16, seed=0,
                           dimensions=32, fb_kernel_size=7, pretrained=False,
                           algo="bptt", penalty=False, slowfast_cfg=None,
                           remat_blocks=bool(int(
                               os.environ.get("BENCH_REMAT_BLOCKS", 0))))
    model, variables = init_model(args, timesteps)
    params = variables["params"]
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)
    # Coordinate-channel models init with 5 input channels; the step's
    # prepare must append the meshgrid channels to match (loop.py does the
    # same for training runs).
    from pathtracker_tpu.models.registry import needs_coord_channels

    coord = needs_coord_channels(model_name)
    train_step = make_train_step(model, model_name, optimizer,
                                 prepare_kwargs={"coord_channels": coord})

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(batch, timesteps, 32, 32, 3),
                        dtype=np.uint8)
    labels = rng.integers(0, 2, size=(batch,), dtype=np.uint8)
    imgs = jax.device_put(imgs)
    labels = jax.device_put(labels)

    res = _time_train_step(train_step, params, opt_state, imgs, labels,
                           iters, warmup)
    return {
        "model": model_name,
        "clips_per_sec": round(res["clips_per_sec"], 2),
        "p50_batch_latency_s": round(res["p50_batch_latency_s"], 4),
        "batch": batch,
        "timesteps": timesteps,
    }


def _yield_device(pidfile: str, wait_s: float = 120.0) -> None:
    """Ask a long-running training job to yield the single-client TPU.

    The chip admits one client at a time (CLAUDE.md): if a background
    fine-tune is mid-flight when the benchmark starts, both would serialize
    and look hung. Training runs record their pid in a pidfile and install a
    graceful SIGTERM handler (finish the step, save the rolling checkpoint,
    exit 0 — train/loop.py), so the benchmark can safely ask it to stop.
    Only a live pid whose cmdline looks like one of our training CLIs is
    signalled — never a pattern match, never this process."""
    import signal

    # Settle after a successful yield: round 3 measured 660 clips/s (-3.2%)
    # with the pre-flight SIGTERM landing seconds before timing, and a quiet
    # chip measured 689 (+1.1%) at the same commit — the gap was contention /
    # post-yield settle, not a code regression (results/tpu_experiments.md,
    # round 4). Give the backend a beat after the trainer exits before the
    # first timed dispatch.
    settle_s = float(os.environ.get("BENCH_SETTLE_S", 10.0))
    try:
        pid = int(open(pidfile).read().strip())
    except (OSError, ValueError):
        return
    if pid == os.getpid():
        return
    try:
        cmdline = open(f"/proc/{pid}/cmdline", "rb").read().decode(
            errors="replace")
    except OSError:
        return  # not running
    if "mainclean" not in cmdline and "pathtracker" not in cmdline:
        return  # pid reused by something else — leave it alone
    print(f"bench: asking training pid {pid} to yield the device "
          f"(SIGTERM, graceful checkpoint+exit)", file=sys.stderr, flush=True)
    try:
        os.kill(pid, signal.SIGTERM)
    except OSError:
        return
    deadline = time.perf_counter() + wait_s
    while time.perf_counter() < deadline:
        try:
            with open(f"/proc/{pid}/stat") as f:
                state = f.read().rsplit(")", 1)[1].split()[0]
        except OSError:
            time.sleep(settle_s)
            return  # exited
        if state == "Z":
            time.sleep(settle_s)
            return  # exited, awaiting reap — the device is released
        time.sleep(1.0)
    print(f"bench: pid {pid} still alive after {wait_s:.0f}s — proceeding "
          "anyway (backend probe below will abort if the chip stays held)",
          file=sys.stderr, flush=True)


def main():
    # BENCH_DATA=1: host-only pipeline throughput — no device backend needed.
    if int(os.environ.get("BENCH_DATA", 0)):
        res = measure_data(
            batch=int(os.environ.get("BENCH_BATCH", 128)),
            timesteps=int(os.environ.get("BENCH_T", 64)),
            iters=int(os.environ.get("BENCH_ITERS", 2)),
            pure_python=bool(int(os.environ.get("BENCH_DATA_PURE", 0))))
        print(json.dumps({
            "metric": f"host TFRecord pipeline clips/sec "
                      f"({res['decoder']}), {res['timesteps']}-frame clips",
            "value": round(res["clips_per_sec"], 2),
            "unit": "clips/sec", "vs_baseline": 1.0,
            "protocol": "host_pipeline_epochs", **res}))
        return

    _yield_device(os.environ.get("BENCH_YIELD_PIDFILE", "/tmp/convrun.pid"))
    _require_backend(float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", 240)))
    # Batch 128 sits at the measured latency cliff: step latency is flat
    # (~0.19 s) for batch <= 128 and doubles above it (measured 64/96/128 ->
    # 0.205/0.190/0.189 s; 160/192/256 -> 0.398/0.396/0.391 s), so 128 is
    # the throughput optimum (671 vs 653 clips/s at 256).
    # BENCH_MODEL sweeps a non-InT zoo model instead of the headline
    # (one JSON line, same pipelined-window protocol).
    zoo_model = os.environ.get("BENCH_MODEL")
    if zoo_model:
        res = measure_model(
            zoo_model,
            batch=int(os.environ.get("BENCH_BATCH", 64)),
            timesteps=int(os.environ.get("BENCH_T", 64)),
            iters=int(os.environ.get("BENCH_ITERS", 10)),
            bf16=not int(os.environ.get("BENCH_F32", 0)))
        print(json.dumps({
            "metric": f"{zoo_model} fwd+bwd clips/sec/chip, "
                      f"{res['timesteps']}-frame PathTracker",
            "value": res["clips_per_sec"], "unit": "clips/sec/chip",
            "vs_baseline": 1.0, "protocol": "pipelined_window", **res}))
        return

    batch = int(os.environ.get("BENCH_BATCH", 128))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    # BENCH_INFER=1 measures the serving path (jitted inference program,
    # eval/serve.py) instead of the train step.
    if int(os.environ.get("BENCH_INFER", 0)):
        t = int(os.environ.get("BENCH_T", 64))
        res = measure_infer(batch=batch, timesteps=t, iters=iters,
                            bf16=not int(os.environ.get("BENCH_F32", 0)))
        print(json.dumps({
            "metric": f"InT inference clips/sec/chip, {t}-frame PathTracker",
            "value": round(res["clips_per_sec"], 2),
            "unit": "clips/sec/chip",
            "vs_baseline": 1.0,
            "protocol": "pipelined_window_inference",
            "p50_batch_latency_s": round(res["p50_batch_latency_s"], 4),
            "batch": res["batch"], "device": res["device"],
        }))
        return

    # BENCH_FUSED=K measures the production resident fused-window path
    # (mainclean.py --device-data --fused-steps K) instead of the
    # single-step streamed path. Distinct protocol, labeled as such.
    fused = int(os.environ.get("BENCH_FUSED", 0))
    if fused >= 1:  # =1 is the resident path with unfused windows
        t = int(os.environ.get("BENCH_T", 64))
        res = measure_fused(batch=batch, timesteps=t, iters=iters,
                            fused_steps=fused,
                            bf16=not int(os.environ.get("BENCH_F32", 0)),
                            remat_policy=os.environ.get("BENCH_REMAT", "conv"))
        print(json.dumps({
            "metric": "InT training clips/sec/chip (resident fused windows), "
                      f"{t}-frame PathTracker",
            "value": round(res["clips_per_sec"], 2),
            "unit": "clips/sec/chip",
            "vs_baseline": 1.0,
            "protocol": "fused_window_resident",
            **{k: res[k] for k in ("fused_steps", "batch", "timesteps",
                                   "device")},
            "amortized_step_latency_s": round(
                res["amortized_step_latency_s"], 4),
        }))
        return

    res = measure(batch=batch, iters=iters,
                  bf16=not int(os.environ.get("BENCH_F32", 0)),
                  remat_policy=os.environ.get("BENCH_REMAT", "conv"))

    # Compare like-for-like only: the headline clips_per_sec is the
    # PIPELINED-window protocol (N chained steps, one sync). A baseline
    # recorded under a different protocol (e.g. p50 per-step-with-fetch)
    # would inflate vs_baseline, so BASELINE.json values must carry a
    # 'protocol' field and anything else is ignored.
    PROTOCOL = "pipelined_window"
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
        if pub.get("protocol", PROTOCOL) == PROTOCOL:
            baseline = pub.get("clips_per_sec_chip")
    except Exception:
        pass
    vs = res["clips_per_sec"] / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "InT fwd+bwd clips/sec/chip, 64-frame PathTracker",
        "value": round(res["clips_per_sec"], 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs, 3),
        "protocol": PROTOCOL,
        "p50_batch_latency_s": round(res["p50_batch_latency_s"], 4),
        "per_step_fetch_clips_per_sec": round(res["per_step_fetch_clips_per_sec"], 2),
        "batch": res["batch"],
        "device": res["device"],
    }))


if __name__ == "__main__":
    main()
