"""Real multi-process (multi-host) SPMD test over jax.distributed.

The rest of the suite simulates 8 devices in ONE process; this spawns TWO
processes of 4 virtual CPU devices each, joined through the jax.distributed
coordination service (`parallel/distributed.py`), and runs one full InT
train step with the global batch assembled from disjoint per-process slices
(`parallel/mesh.py::put_global_batch`). This is the code path a TPU pod
slice runs over DCN — the reference has nothing equivalent (DataParallel is
single-process, reference mainclean.py:132-134).

Pinned here:
- both processes compute the SAME replicated loss and post-update params
  (SPMD consistency through the grad all-reduce);
- that loss matches a single-process 8-device control on the same global
  batch (put_global_batch assembles slices in the right order — a plain
  device_put of the local slice would silently feed different "global"
  batches per process).
"""

import os
import re
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pathtracker_tpu.utils.cache import machine_keyed_dir  # noqa: E402

# Machine-keyed cache (utils/cache.py): a stale cross-machine .cache/jax
# gives some ranks instant hits while others compile fresh — the exact
# compile skew these tests exist to catch.
CACHE_DIR = machine_keyed_dir(os.path.join(REPO, ".cache", "jax"))
_OUT_RE = re.compile(r"RANK(\d) LOSS ([\d.eE+-]+) FP ([\d.eE+-]+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_ranks(launches, out_dir, timeout=1500):
    """Spawn one process per (cmd, env), stdout+stderr to FILES, not pipes.

    PIPE + sequential communicate() deadlocks multi-rank SPMD runs: the
    un-drained ranks block on write once XLA's (multi-KB) log lines overflow
    the 64 KB pipe buffer, which stalls their collectives, which stalls the
    rank being drained — measured live as the round-4 "4-rank test hangs
    25 min in futex" incident. Files never block writers, survive the test
    process dying, and leave per-rank logs for post-mortem. Any rank still
    alive after `timeout` (or after a sibling fails) is killed so no orphan
    keeps the coordination port."""
    procs, paths = [], []
    for i, (cmd, env) in enumerate(launches):
        path = os.path.join(str(out_dir), f"rank{i}.out")
        paths.append(path)
        with open(path, "w") as f:
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=REPO, stdout=f,
                stderr=subprocess.STDOUT, text=True))
    try:
        deadline = time.time() + timeout
        for p in procs:
            p.wait(timeout=max(1.0, deadline - time.time()))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait()
    outs = []
    for path in paths:
        with open(path) as f:
            outs.append(f.read())
    return procs, outs


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO + (os.pathsep + env["PYTHONPATH"]
                              if env.get("PYTHONPATH") else ""),
        "JAX_COMPILATION_CACHE_DIR": CACHE_DIR,
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2",
    })
    script = os.path.join(REPO, "tests", "_multihost_rank.py")
    procs, outs = _run_ranks(
        [([sys.executable, script, str(rank), str(port)], env)
         for rank in (0, 1)], tmp_path)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed (rc={p.returncode}):\n{out}"

    results = {}
    for out in outs:
        m = _OUT_RE.search(out)
        assert m, f"no result line in output:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}, results

    # SPMD consistency: identical replicated loss + updated-param
    # fingerprint on both processes.
    (l0, f0), (l1, f1) = results[0], results[1]
    assert l0 == pytest.approx(l1, abs=1e-9), results
    assert f0 == pytest.approx(f1, rel=1e-7), results

    # Single-process 8-device control on the same global batch (the
    # conftest already forces 8 virtual CPU devices in this process).
    import jax
    import jax.numpy as jnp

    from pathtracker_tpu.models.int_circuit import InT
    from pathtracker_tpu.parallel import mesh as mesh_lib
    from pathtracker_tpu.train.steps import make_optimizer, make_train_step

    mesh = mesh_lib.make_mesh(8)
    model = InT(dimensions=8, timesteps=4, kernel_size=3)
    sample = jnp.zeros((16, 3, 4, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    optimizer = make_optimizer(3e-4)
    opt_state = optimizer.init(params)
    params = mesh_lib.replicate_tree(mesh, params)
    opt_state = mesh_lib.replicate_tree(mesh, opt_state)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(16, 4, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=(16,), dtype=np.uint8)
    sh = mesh_lib.batch_sharding(mesh)
    step = make_train_step(model, "InT", optimizer)
    params, opt_state, stats = step(
        params, opt_state,
        mesh_lib.put_global_batch(imgs, sh),
        mesh_lib.put_global_batch(labels, sh))
    loss_ctrl = float(stats["loss"])
    fp_ctrl = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(params))

    assert l0 == pytest.approx(loss_ctrl, abs=2e-6), (l0, loss_ctrl)
    assert f0 == pytest.approx(fp_ctrl, rel=1e-5), (f0, fp_ctrl)


def test_two_process_mainclean_cli(tmp_path):
    """The actual train CLI spans two processes: every host runs the same
    `mainclean.py` command with COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    set (train/loop.py initializes jax.distributed from those), loads its
    disjoint TFRecord slice at global_batch/nprocs, and only the coordinator
    writes real artifacts."""
    port = _free_port()
    data_root = tmp_path / "data"
    results = {0: tmp_path / "results0", 1: tmp_path / "results1"}
    procs = []
    for rank in (0, 1):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": REPO + (os.pathsep + env["PYTHONPATH"]
                                  if env.get("PYTHONPATH") else ""),
            "JAX_COMPILATION_CACHE_DIR": CACHE_DIR,
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2",
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "PATHTRACKER_DATA_ROOT": str(data_root),
            "PATHTRACKER_SYNTH_TRAIN": "32",
            "PATHTRACKER_SYNTH_TEST": "32",
        })
        procs.append((
            [sys.executable, "mainclean.py", "--model", "InT", "--name",
             "mh", "--length", "8", "--speed", "1", "--dist", "5",
             "-b", "8", "-d", "8", "-k", "3", "--epochs", "1",
             "--print-freq", "1", "--parallel",
             "--results-dir", str(results[rank])], env))
    procs, outs = _run_ranks(procs, tmp_path)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed (rc={p.returncode}):\n{out}"
    assert "device count: 8" in outs[0], outs[0]

    # Coordinator-only artifacts: rank 0 writes the run dir (train/val npz +
    # a checkpoint); rank 1's results dir stays unused (it diverts to a
    # throwaway tempdir).
    run0 = results[0] / "8_1_5" / "mh"
    assert (run0 / "train.npz").exists() and (run0 / "val.npz").exists()
    assert list((run0 / "saved_models").glob("*.tar")), "no checkpoint saved"
    assert not (results[1] / "8_1_5" / "mh" / "train.npz").exists()

    # Identical replicated metrics on both ranks: the final val log line
    # (printed by every process) must agree.
    val0 = [ln for ln in outs[0].splitlines() if ln.startswith("val f")]
    val1 = [ln for ln in outs[1].splitlines() if ln.startswith("val f")]
    assert val0 and val0 == val1, (val0, val1)


def test_four_process_cli_record_striding(tmp_path):
    """4 ranks through the real CLI with FEWER FILES THAN PROCESSES: the
    synthesizer writes 2 shards per split, so at NUM_PROCESSES=4 every rank
    keeps all files and strides records (data/pipeline.py::ClipDataset,
    files<processes path — unit-tested in test_tfrecord.py, exercised here
    end-to-end). Asserts each rank logs its stride slot, only the
    coordinator writes artifacts, and the replicated val metrics agree on
    all four ranks (uneven per-rank record counts must not desync SPMD)."""
    port = _free_port()
    data_root = tmp_path / "data"
    results = {r: tmp_path / f"results{r}" for r in range(4)}
    procs = []
    for rank in range(4):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": REPO + (os.pathsep + env["PYTHONPATH"]
                                  if env.get("PYTHONPATH") else ""),
            "JAX_COMPILATION_CACHE_DIR": CACHE_DIR,
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2",
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "4",
            "PROCESS_ID": str(rank),
            "PATHTRACKER_DATA_ROOT": str(data_root),
            # 34 train records over 2 files: the global-index stride
            # equalizes ranks at floor(34/4)=8 records each (the incomplete
            # final stride block is dropped) — 34 is deliberately not a
            # multiple of 4 so that equalization is exercised; a naive
            # per-file stride would hand rank 0 ten records and desync the
            # train-step collective count across ranks.
            "PATHTRACKER_SYNTH_TRAIN": "34",
            "PATHTRACKER_SYNTH_TEST": "32",
        })
        procs.append((
            [sys.executable, "mainclean.py", "--model", "InT", "--name",
             "mh4", "--length", "8", "--speed", "1", "--dist", "5",
             "-b", "8", "-d", "8", "-k", "3", "--epochs", "1",
             "--print-freq", "1", "--parallel",
             "--results-dir", str(results[rank])], env))
    procs, outs = _run_ranks(procs, tmp_path)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {rank} failed (rc={p.returncode}):\n{out[-4000:]}")
    assert "device count: 8" in outs[0], outs[0]

    # Every rank kept BOTH files and took its own record-stride slot —
    # the files<processes path, not the file-slice path.
    for rank, out in enumerate(outs):
        lines = [ln for ln in out.splitlines() if ln.startswith("input shard:")]
        assert lines == [
            f"input shard: rank {rank}/4 files=2 "
            f"record_stride=({rank}, 4)"], (rank, lines or out)

    # Coordinator-only artifacts.
    run0 = results[0] / "8_1_5" / "mh4"
    assert (run0 / "train.npz").exists() and (run0 / "val.npz").exists()
    for rank in (1, 2, 3):
        assert not (results[rank] / "8_1_5" / "mh4" / "train.npz").exists()

    # Identical replicated metrics across all four ranks.
    vals = [[ln for ln in out.splitlines() if ln.startswith("val f")]
            for out in outs]
    assert vals[0] and all(v == vals[0] for v in vals[1:]), vals
