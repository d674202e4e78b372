"""Training entry point — the reference mainclean.py flow, TPU-native.

Flow parity (reference mainclean.py:107-256): dataset_selector -> two
tfr_data_loaders -> model_selector -> (optional) data-parallel mesh ->
hp_dict.npz snapshot -> BCEWithLogits + Adam -> epoch loop with per-batch
train_step + meters + txt/npz sinks -> per-epoch validate(logiters=3) ->
EarlyStopping(patience=200) checkpointing.

TPU-native differences: the batch stays uint8 until inside the jitted step;
--parallel shards the batch over a Mesh(('data',)) instead of DataParallel;
early stop returns instead of os._exit(1).
"""

from __future__ import annotations

import os
import time
import zipfile
from statistics import mean

import jax
import numpy as np

from pathtracker_tpu import engine
from pathtracker_tpu.data.pipeline import tfr_data_loader
from pathtracker_tpu.parallel import mesh as mesh_lib
from pathtracker_tpu.train import checkpoint as ckpt_lib
from pathtracker_tpu.train.steps import (build_lr_schedule, make_eval_step,
                                         make_optimizer, make_train_step)
from pathtracker_tpu.utils.earlystopping import EarlyStopping
from pathtracker_tpu.utils.meters import AverageMeter
from pathtracker_tpu.utils.opts import parser


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Yield batches already device_put, `depth` transfers ahead.

    jax transfers are async: issuing the put for batch i+1 before blocking on
    step i's stats overlaps the H2D copy with device compute. Without this
    the loop serializes transfer -> step -> fetch every iteration (on a
    tunneled chip the transfer alone can rival the step time)."""
    from collections import deque

    buf = deque()
    for item in iterator:
        if sharding is not None:
            # Multi-host safe: each process feeds its DISJOINT slice of the
            # global batch (mesh_lib.put_global_batch assembles the global
            # array; single-process it is a plain device_put).
            item = tuple(mesh_lib.put_global_batch(x, sharding) for x in item)
        else:
            item = tuple(jax.device_put(x) for x in item)
        buf.append(item)
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _opt_state_extra(opt_state) -> dict:
    """Optimizer state as a checkpoint `extra` payload: flax state_dict
    (plain nested dicts of host arrays — optax NamedTuples don't survive
    msgpack directly). The rolling checkpoint carries it so --auto-resume
    continues Adam moments/count and any EMA average exactly; best-val
    checkpoints stay params-only (the downstream eval/export format)."""
    from flax import serialization

    return {"opt_state": serialization.to_state_dict(jax.device_get(opt_state))}


def save_npz(log_dict: dict, results_folder: str, savename: str = "train") -> None:
    """train.npz / val.npz observability sinks (reference mainclean.py:101-104)."""
    with open(os.path.join(results_folder, savename + ".npz"), "wb") as f:
        np.savez(f, **{k: np.asarray(v) for k, v in log_dict.items()})


def _load_npz_logs(log_dict: dict, results_folder: str, savename: str,
                   max_entries: int | None = None) -> None:
    """Preload a previous run's train/val npz into the in-memory log dict
    (auto-resume path) so sliced campaigns accumulate one continuous curve
    instead of overwriting with the latest slice only."""
    path = os.path.join(results_folder, savename + ".npz")
    if not os.path.exists(path):
        return
    try:
        with np.load(path) as prior:
            for k in log_dict:
                if k in prior.files:
                    vals = prior[k].tolist()
                    if max_entries is not None:
                        vals = vals[:max_entries]
                    log_dict[k].extend(vals)
    except (OSError, ValueError, zipfile.BadZipFile) as e:
        print(f"auto-resume: could not preload {savename}.npz ({e}); "
              f"curves restart from this slice")


def results_folder_for(args) -> str:
    stem = f"{args.length}_{args.speed}_{args.dist}"
    if args.optical_flow:
        stem = f"{stem}_flow"
    return os.path.join(args.results_dir, stem, str(args.name))


def init_model(args, timesteps: int, in_channels: int = 3):
    """Build the model and init params with the run seed."""
    import jax.numpy as jnp

    model = engine.model_selector(args, timesteps=timesteps)
    coord = engine.needs_coord_channels(args.model)
    c = in_channels + (2 if coord else 0)
    sample = jnp.zeros((2, c, timesteps, 32, 32), jnp.float32)
    if engine.family(args.model) == "slowfast":
        sample = engine.slowfast_pathways(
            sample, getattr(model, "alpha", engine.SLOWFAST_ALPHA))
    variables = model.init(jax.random.key(args.seed), sample)
    if getattr(args, "pretrained", False):
        variables = dict(variables)
        variables["params"] = load_pretrained(variables["params"], args.model)
    return model, variables


# --model name -> torchvision checkpoint filename (reference
# nostridetv.py:12-16 model_urls; the reference downloads these, we accept a
# locally provided copy under $PATHTRACKER_PRETRAINED_DIR).
_PRETRAINED_FILES = {
    "r3d": "r3d_18_fc_rm1.pth",
    "mc3": "mc3_18_fc_rm1.pth",
    "r2plus1": "r2plus1d_18_fc_rm1.pth",
}
_PRETRAINED_ALIASES = {
    "r3d": ("r3d_18.pth",),
    "mc3": ("mc3_18.pth",),
    "r2plus1": ("r2plus1d_18.pth",),
}


def load_pretrained(params, model_name: str):
    """--pretrained with no network egress: look for a locally provided
    torchvision video checkpoint under $PATHTRACKER_PRETRAINED_DIR (default
    ./pretrained) and import it via train/torch_import.py (Kinetics
    400-class head skipped, reference utils/engine.py:188-190 replaced it
    too). Falls back to initialized weights with a warning — matching
    round-1 behavior — when no file is present. The fac-narrowed no-stride
    forks cannot take Kinetics weights (channel widths differ; the
    reference's own strict load_state_dict would fail there as well)."""
    import warnings

    names = _PRETRAINED_FILES.get(model_name)
    if names is None:
        warnings.warn(
            f"--pretrained: {model_name!r} has no torchvision checkpoint "
            "counterpart (narrowed trunks); using the pretrained input "
            "normalization only.", stacklevel=2)
        return params
    root = os.environ.get("PATHTRACKER_PRETRAINED_DIR",
                          os.path.abspath("pretrained"))
    candidates = [os.path.join(root, names)] + [
        os.path.join(root, a) for a in _PRETRAINED_ALIASES.get(model_name, ())]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        warnings.warn(
            "--pretrained: no local torchvision checkpoint found (looked for "
            f"{candidates}); using the pretrained input normalization only. "
            "Place the torchvision .pth there to load real weights.",
            stacklevel=2)
        return params
    from pathtracker_tpu.train import torch_import

    state = torch_import.load_torch_checkpoint(path)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    print(f"Loading pretrained torchvision weights from {path}")
    return torch_import.import_video_resnet_state_dict(state, params,
                                                       strict=False)


def validate(val_loader, eval_step, params, args, results_folder,
             len_val_loader, logiters=None, disentangle_channels=False,
             sharding=None):
    """Validation loop (reference mainclean.py:54-98).

    `sharding` (a batch NamedSharding) makes the host-streamed path
    multi-host correct: each process's disjoint val slice is assembled into
    the global batch before the jitted eval step (put_global_batch). Pass
    None when the loader already yields device-resident arrays."""
    meters = {k: AverageMeter() for k in
              ("loss", "balacc", "precision", "recall", "f1score", "batch_time")}
    batches = (device_prefetch(iter(val_loader), sharding)
               if sharding is not None else val_loader)
    end = time.time()
    for i, (imgs, target) in enumerate(batches):
        stats = eval_step(params, imgs, target)
        meters["loss"].update(float(stats["loss"]), 1)
        meters["balacc"].update(float(stats["balacc"]), 1)
        meters["precision"].update(float(stats["precision"]), 1)
        meters["recall"].update(float(stats["recall"]), 1)
        meters["f1score"].update(float(stats["f1score"]), 1)
        meters["batch_time"].update(time.time() - end)
        end = time.time()
        if logiters is None:
            if i % args.print_freq == 0:
                line = (f"Test: [{i * args.batch_size}/{len_val_loader}]\t "
                        f"Time: {meters['batch_time'].avg:.3f}\t "
                        f"Loss: {meters['loss'].val:.8f} ({meters['loss'].avg:.8f})\t "
                        f"Bal_acc: {meters['balacc'].avg:.8f} "
                        f"preci: {meters['precision'].avg:.5f} "
                        f"rec: {meters['recall'].avg:.5f} f1: {meters['f1score'].avg:.5f}")
                print(line)
                with open(os.path.join(results_folder, args.name + ".txt"), "a+") as f:
                    f.write(line + "\n")
        elif i > logiters:
            break
    m = meters
    return (m["balacc"].avg, m["precision"].avg, m["recall"].avg,
            m["f1score"].avg, m["loss"].avg)


def main(args=None, max_steps_per_epoch: int | None = None):
    if args is None:
        args = parser.parse_args()
    if os.environ.get("COORDINATOR_ADDRESS"):
        # Multi-host launch: every host runs this same CLI with
        # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID set (on TPU pods the
        # runtime auto-detects instead). Must happen before any device use.
        from pathtracker_tpu.parallel import distributed

        distributed.initialize()
    assert args.dist is not None, "You must pass a PT distance."
    assert args.speed is not None, "You must pass a PT speed."
    assert args.length is not None, "You must pass a PT length."
    disentangle_channels = False

    pf_root, timesteps, len_train_loader, len_val_loader = engine.dataset_selector(
        dist=args.dist, speed=args.speed, length=args.length,
        optical_flow=args.optical_flow,
        synth_train=args.synth_train, synth_test=args.synth_test)

    device_data = getattr(args, "device_data", False)
    if device_data:
        from pathtracker_tpu.data.resident import load_resident

        print("Loading training dataset (device-resident)")
        train_clips, train_labels = load_resident(
            pf_root + "train-*", timesteps=args.length)
        print("Loading validation dataset (device-resident)")
        val_clips, val_labels = load_resident(
            pf_root + "test-*", timesteps=args.length)
        from pathtracker_tpu.data.resident import ResidentBatches

        train_loader = None
        val_loader = ResidentBatches(val_clips, val_labels, args.batch_size,
                                     shuffle=True, seed=args.seed)
        len_train_loader = int(train_labels.shape[0])
        len_val_loader = int(val_labels.shape[0])
    else:
        # Multi-host: each process loads a disjoint slice and its
        # per-process batch is the global batch / process_count (standard
        # SPMD input feeding; single-host this is a no-op).
        nproc, pidx = jax.process_count(), jax.process_index()
        per_proc_batch = (max(1, args.batch_size // nproc) if nproc > 1
                          else args.batch_size)
        print("Loading training dataset")
        train_loader = tfr_data_loader(
            data_dir=pf_root + "train-*", batch_size=per_proc_batch,
            drop_remainder=True, timesteps=args.length, seed=args.seed,
            shard_index=pidx, shard_count=nproc)
        print("Loading validation dataset")
        val_loader = tfr_data_loader(
            data_dir=pf_root + "test-*", batch_size=per_proc_batch,
            drop_remainder=True, timesteps=args.length, seed=args.seed,
            shard_index=pidx, shard_count=nproc)
        if nproc > 1:
            # Make the input-sharding decision auditable per rank: with
            # files >= processes each rank takes a disjoint file slice;
            # with files < processes ranks share all files and stride
            # records (data/pipeline.py::ClipDataset). Multi-host e2e
            # tests assert on this line.
            stride = getattr(train_loader, "_record_stride", None)
            print(f"input shard: rank {pidx}/{nproc} "
                  f"files={len(train_loader.files)} "
                  f"record_stride={stride}")

    results_folder = results_folder_for(args)
    if jax.process_count() > 1 and jax.process_index() != 0:
        # Multi-host: only the coordinator writes real artifacts (all
        # processes compute identical global metrics, so concurrent writes
        # to a shared results FS would race for no information). The flow
        # is unchanged — non-coordinators divert into a throwaway dir.
        import tempfile

        results_folder = os.path.join(
            tempfile.mkdtemp(prefix="pt_noncoord_"), "results")
    os.makedirs(results_folder, exist_ok=True)
    ES = EarlyStopping(patience=200, results_folder=results_folder)

    model, variables = init_model(args, timesteps)
    params = variables["params"]
    n_params = sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(params))
    print(n_params)

    mesh = None
    if args.parallel:
        mesh = mesh_lib.make_mesh()
        params = mesh_lib.replicate_tree(mesh, params)
        if device_data:
            # Resident shards live distributed over the data axis; the step
            # gathers per device via shard_map. Trim to a device multiple.
            n_dev = len(jax.devices())
            keep = (len_train_loader // n_dev) * n_dev
            train_clips, train_labels = train_clips[:keep], train_labels[:keep]
            len_train_loader = keep
            sh = mesh_lib.batch_sharding(mesh)
            train_clips = jax.device_put(train_clips, sh)
            train_labels = jax.device_put(train_labels, sh)
            vkeep = (len_val_loader // n_dev) * n_dev
            val_loader.clips = jax.device_put(val_loader.clips[:vkeep], sh)
            val_loader.labels = jax.device_put(val_loader.labels[:vkeep], sh)
        print("Loading parallel finished on device count:", len(jax.devices()))
    else:
        print("Loading finished")

    # hp_dict.npz snapshot (reference mainclean.py:140-155)
    hp_dict = {
        "penalty": args.penalty,
        "start_epoch": args.start_epoch,
        "epochs": args.epochs,
        "lr": args.lr,
        "lr_schedule": getattr(args, "lr_schedule", "none"),
        "clip_grad": str(getattr(args, "clip_grad", None)),
        "accum_steps": getattr(args, "accum_steps", 1),
        "ema": str(getattr(args, "ema", None)),
        "loaded_ckpt": str(args.ckpt),
        "results_dir": results_folder,
        "exp_name": args.name,
        "algo": args.algo,
        "dimensions": args.dimensions,
        "fb_kernel_size": args.fb_kernel_size,
        "timesteps": timesteps,
        "param_names_shapes": np.asarray(
            [f"{jax.tree_util.keystr(k)}:{np.shape(v)}"
             for k, v in jax.tree_util.tree_leaves_with_path(params)]),
    }
    np.savez(os.path.join(results_folder, "hp_dict"), **hp_dict)

    ema_decay = getattr(args, "ema", None)
    if args.ckpt is not None:
        params = engine.load_ckpt(params, args.ckpt)
    resume_opt_sd = None
    if getattr(args, "auto_resume", False):
        # Self-healing restarts for bounded runs (`timeout N mainclean.py`):
        # if this run dir already has the rolling last-epoch checkpoint
        # (written every epoch and on SIGTERM), continue from it — params,
        # start epoch, AND optimizer state (Adam moments/count + EMA, saved
        # in the checkpoint's `extra`) — so a relauncher needs no
        # --ckpt/--start-epoch wiring and the trajectory continues exactly.
        # An explicit --ckpt still applies first (warm start), then any
        # rolling state supersedes it.
        rolling = os.path.join(results_folder, "saved_models",
                               "model_last_epoch_checkpoint.pth.tar")
        if os.path.exists(rolling):
            from pathtracker_tpu.train import checkpoint as _ckpt_lib

            state = _ckpt_lib.load_checkpoint(rolling)
            params = engine.load_ckpt(params, rolling)
            resume_epoch = int(state.get("epoch", 0)) + 1
            if resume_epoch > args.start_epoch:
                args.start_epoch = resume_epoch
            resume_opt_sd = (state.get("extra") or {}).get("opt_state")
            print(f"auto-resume: rolling checkpoint found, continuing from "
                  f"epoch {args.start_epoch}")
    # Optimizer after resume: an lr schedule is indexed by Adam's step
    # count. When the optimizer state is restored, that count continues and
    # already indexes the schedule correctly; when it is fresh (reference
    # --ckpt restart flow, or an old rolling checkpoint without opt state),
    # offset the schedule by the resumed epoch so the decay continues where
    # the previous run stopped.
    accum = max(1, getattr(args, "accum_steps", 1))
    opt_steps_per_epoch = max(1, (len_train_loader // args.batch_size) // accum)
    resume_offset = args.start_epoch * opt_steps_per_epoch

    def _make_opt(start_step: int):
        sched = build_lr_schedule(
            getattr(args, "lr_schedule", "none"), args.lr, opt_steps_per_epoch,
            args.epochs, lr_steps=args.lr_steps,
            warmup_epochs=getattr(args, "warmup_epochs", 0.0),
            start_step=start_step)
        return sched, make_optimizer(args.lr,
                                     clip_grad=getattr(args, "clip_grad", None),
                                     accum_steps=accum,
                                     ema=ema_decay,
                                     schedule=sched)

    schedule, optimizer = _make_opt(0 if resume_opt_sd is not None
                                    else resume_offset)
    opt_state = optimizer.init(params)
    opt_restored = False
    if resume_opt_sd is not None:
        from flax import serialization as _ser

        try:
            restored = _ser.from_state_dict(opt_state, resume_opt_sd)
            # Restored leaves are host numpy arrays; put each back with the
            # sharding the freshly-initialized state had (replicated under
            # --parallel) so the jitted step sees identical layouts.
            opt_state = jax.tree.map(
                lambda fresh, r: (jax.device_put(r, fresh.sharding)
                                  if hasattr(fresh, "sharding") else r),
                opt_state, restored)
            opt_restored = True
            print("auto-resume: optimizer state restored "
                  "(Adam moments/count continue)")
        except (ValueError, KeyError, TypeError) as e:
            # Optimizer config changed between runs (different --clip-grad/
            # --accum-steps/--ema flags reshape the state pytree): fall back
            # to a fresh init with the epoch-offset schedule.
            print(f"auto-resume: saved optimizer state incompatible with the "
                  f"current flags ({e}); starting with fresh moments")
            schedule, optimizer = _make_opt(resume_offset)
            opt_state = optimizer.init(params)

    prep = {"disentangle_channels": disentangle_channels,
            "pretrained_norm": args.pretrained,
            "coord_channels": engine.needs_coord_channels(args.model)}
    if device_data:
        from pathtracker_tpu.data.resident import make_resident_train_step

        train_step = make_resident_train_step(
            model, args.model, optimizer, n_clips=len_train_loader,
            batch_size=args.batch_size, penalty=args.penalty,
            prepare_kwargs=prep, seed=args.seed, mesh=mesh,
            fused_steps=getattr(args, "fused_steps", 1))
    else:
        train_step = make_train_step(model, args.model, optimizer,
                                     penalty=args.penalty, prepare_kwargs=prep,
                                     seed=args.seed)
    eval_step = make_eval_step(model, args.model, prepare_kwargs=prep)

    val_log_dict = {"loss": [], "balacc": [], "precision": [], "recall": [],
                    "f1score": []}
    train_log_dict = {"loss": [], "balacc": [], "precision": [], "recall": [],
                      "f1score": [], "jvpen": [], "scaled_loss": []}
    if args.start_epoch > 0 and getattr(args, "auto_resume", False):
        # Sliced campaigns relaunch with --auto-resume and a growing --epochs
        # budget; save_npz overwrites, so without preloading, each slice's
        # npz holds only its own epochs and any driver that reads
        # len(val.npz) to measure progress stalls forever (round-4 advisor
        # finding). Preload the previous run's logs so the curves stay
        # cumulative across slices; val entries are truncated to one per
        # completed epoch so epoch indexing stays exact.
        _load_npz_logs(train_log_dict, results_folder, "train")
        _load_npz_logs(val_log_dict, results_folder, "val",
                       max_entries=args.start_epoch)

    vopt = opt_state
    stop = False
    # Optimizer steps for the log-line lr display. With restored optimizer
    # state Adam's count continues from the previous run, so start the
    # display counter there too; otherwise the schedule itself carries the
    # resume offset and the counter starts at 0.
    opt_steps_done = float(resume_offset) if opt_restored else 0.0
    trace_active = False

    # Graceful shutdown: runs here are routinely bounded by `timeout`
    # (SIGTERM), and the reference's only recovery is --ckpt/--start-epoch
    # resume — dying mid-epoch loses everything since the last val
    # improvement. Catch the first SIGTERM, finish the current step, save
    # the rolling last-epoch checkpoint + npz logs, and return cleanly; a
    # second SIGTERM falls through to the default kill.
    import signal

    terminated = {"flag": False}

    def _on_sigterm(signum, frame):
        terminated["flag"] = True
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        print("SIGTERM: finishing step, checkpointing, exiting cleanly "
              "(send again to kill)", flush=True)

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. driven from a test runner)
        prev_sigterm = None

    # Multi-host: align every rank before the first collective. Dataset
    # loading/synthesis skews ranks by far more than the 30 s rendezvous
    # window XLA's Gloo CPU collectives allow (see parallel.distributed.
    # barrier); on TPU pods the same alignment avoids burning the NCCL-style
    # init window on stragglers. The barrier alone is not enough: the jit
    # compile of the first train step happens AFTER it, and per-rank compile
    # skew (persistent-cache hit on one rank, fresh compile on another) can
    # exceed the 30 s window all over again — so every rank AOT-compiles the
    # train/eval steps BEFORE the barrier. The post-barrier dispatch then
    # recompiles through the (machine-keyed) persistent cache, a fast load
    # with near-zero skew. docs/SCALING.md, tests/test_multihost.py.
    if getattr(args, "parallel", False):
        from pathtracker_tpu.parallel import distributed as _distributed

        if jax.process_count() > 1:
            from pathtracker_tpu.utils import cache as _cache

            cache_dir = _cache.enable()
            if not device_data:
                gbatch = train_loader.batch_size * jax.process_count()
                imgs_sds = jax.ShapeDtypeStruct(
                    (gbatch, train_loader.timesteps, train_loader.height,
                     train_loader.width, 3), np.uint8,
                    sharding=mesh_lib.batch_sharding(mesh))
                labels_sds = jax.ShapeDtypeStruct(
                    (gbatch,), np.uint8,
                    sharding=mesh_lib.batch_sharding(mesh))
                t0 = time.perf_counter()
                train_step.precompile(params, opt_state, imgs_sds, labels_sds)
                eval_step.precompile(params, imgs_sds, labels_sds)
                print(f"pre-barrier AOT compile done in "
                      f"{time.perf_counter() - t0:.1f}s "
                      f"(persistent cache: {cache_dir})")
        _distributed.barrier("pre-train-loop")

    for epoch in range(args.start_epoch, args.epochs):
        meters = {k: AverageMeter() for k in
                  ("batch_time", "data_time", "loss", "balacc", "precision",
                   "recall", "f1score")}
        time_since_last = time.time()
        end = time.perf_counter()

        sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None
        if device_data:
            # Resident mode: the step gathers its own batch on device; with
            # --fused-steps each iteration runs a whole k-step window in one
            # compiled program (one dispatch + one stats fetch per window).
            batches = ((train_clips, train_labels)
                       for _ in range(train_step.windows_per_epoch))
        else:
            batches = device_prefetch(iter(train_loader), sharding)
        steps_done = 0  # optimizer steps (a fused window advances by k)
        for idx, (imgs, target) in enumerate(batches):
            meters["data_time"].update(time.perf_counter() - end)
            # Profiler hook (reference had only wall-clock meters; SURVEY §5):
            # trace steps 1-4 of the first epoch — step 0 is the compile.
            if (getattr(args, "profile", None)
                    and epoch == args.start_epoch and idx == 1):
                jax.profiler.start_trace(args.profile)
                trace_active = True
            params, vopt, stats = train_step(params, vopt, imgs, target)
            # Fused windows return [k] per-step stats; plain steps scalars.
            sub = {k_: np.atleast_1d(v) for k_, v in stats.items()}
            n_sub = len(sub["loss"])
            if trace_active and idx >= 4:
                jax.profiler.stop_trace()
                trace_active = False
                print(f"profiler trace written to {args.profile}")
            for s in range(n_sub):
                meters["loss"].update(float(sub["loss"][s]), 1)
                train_log_dict["jvpen"].append(float(sub["jvpen"][s]))
                train_log_dict["scaled_loss"].append(float(sub["scaled_loss"][s]))
                meters["balacc"].update(float(sub["balacc"][s]), 1)
                meters["precision"].update(float(sub["precision"][s]), 1)
                meters["recall"].update(float(sub["recall"][s]), 1)
                meters["f1score"].update(float(sub["f1score"][s]), 1)
            # batch_time keeps per-STEP semantics under fusion.
            meters["batch_time"].update((time.perf_counter() - end) / n_sub)
            end = time.perf_counter()
            opt_steps_done += n_sub / accum

            if idx % args.print_freq == 0:
                time_now = time.time()
                pf = max(args.print_freq, 1)
                # Under --lr-schedule the log line shows the lr actually
                # applied at the most recent optimizer step (Adam's count
                # was opt_steps_done-1 when it applied), not the base lr.
                lr_now = (args.lr if schedule is None
                          else float(schedule(max(0, int(opt_steps_done) - 1))))
                line = (
                    f"Epoch: [{epoch}][{idx}/{len_train_loader}]  lr: {lr_now:g}  "
                    f"Time: {meters['batch_time'].val:.3f} "
                    f"(itavg:{mean(meters['batch_time'].history[-pf:]):.3f}) "
                    f"({meters['batch_time'].avg:.3f})  "
                    f"Data: {meters['data_time'].val:.3f} ({meters['data_time'].avg:.3f}) "
                    f"Loss: {meters['loss'].val:.8f} "
                    f"({mean(meters['loss'].history[-pf:]):.8f}) "
                    f"({meters['loss'].avg:.8f})  "
                    f"bal_acc: {meters['balacc'].val:.5f} ({meters['balacc'].avg:.5f}) "
                    f"preci: {meters['precision'].val:.5f} ({meters['precision'].avg:.5f}) "
                    f"rec: {meters['recall'].val:.5f} ({meters['recall'].avg:.5f})  "
                    f"f1: {meters['f1score'].val:.5f} ({meters['f1score'].avg:.5f}) "
                    f"jvpen: {train_log_dict['jvpen'][-1]:.12f} "
                    f"{time_now - time_since_last:.3f}")
                print(line)
                time_since_last = time_now
                with open(os.path.join(results_folder, args.name + ".txt"), "a+") as f:
                    f.write(line + "\n")
            # Count OPTIMIZER steps, not loop iterations: under
            # --fused-steps each iteration is a k-step window, and the cap
            # is a step budget (tests rely on it meaning steps).
            steps_done += n_sub
            if max_steps_per_epoch is not None and steps_done >= max_steps_per_epoch:
                break
            if terminated["flag"]:
                break

        if trace_active:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            trace_active = False
            print(f"profiler trace written to {args.profile}")

        train_log_dict["loss"].extend(meters["loss"].history)
        train_log_dict["balacc"].extend(meters["balacc"].history)
        train_log_dict["precision"].extend(meters["precision"].history)
        train_log_dict["recall"].extend(meters["recall"].history)
        train_log_dict["f1score"].extend(meters["f1score"].history)
        save_npz(train_log_dict, results_folder, "train")
        save_npz(val_log_dict, results_folder, "val")

        if terminated["flag"]:
            os.makedirs(os.path.join(results_folder, "saved_models"),
                        exist_ok=True)
            last = os.path.join(results_folder, "saved_models",
                                "model_last_epoch_checkpoint.pth.tar")
            ckpt_lib.save_checkpoint(last, params, epoch=epoch,
                                     extra=_opt_state_extra(vopt))
            print(f"terminated: logs + rolling checkpoint saved mid-epoch "
                  f"{epoch}; resume with --ckpt {last} --start-epoch {epoch}",
                  flush=True)
            stop = True
            break

        # With --ema, validation and best-val checkpoints use the averaged
        # weights (what you would deploy); the rolling checkpoint below
        # keeps the raw weights so resume continues the exact trajectory.
        from pathtracker_tpu.train.steps import ema_params as _ema_params

        eval_params = _ema_params(vopt) if ema_decay is not None else params
        accv, precv, recv, f1sv, losv = validate(
            val_loader, eval_step, eval_params, args, results_folder,
            len_val_loader, logiters=3,
            disentangle_channels=disentangle_channels,
            # device_data loaders already yield device-resident sharded
            # arrays; only the host-streamed path needs assembly.
            sharding=None if device_data else sharding)
        line = f"val f {f1sv} val loss {losv}"
        print(line)
        val_log_dict["loss"].append(losv)
        val_log_dict["balacc"].append(accv)
        val_log_dict["precision"].append(precv)
        val_log_dict["recall"].append(recv)
        val_log_dict["f1score"].append(f1sv)
        with open(os.path.join(results_folder, args.name + ".txt"), "a+") as f:
            f.write(line + "\n")
        save_npz(val_log_dict, results_folder, "val")
        # Rolling last-epoch checkpoint (one file, overwritten): the
        # reference saves ONLY on val-acc improvement, so a long climb that
        # never re-beats an early warm-start artifact peak leaves nothing
        # recoverable when training later destabilizes (measured: the
        # dist=14/T=64 run collapsed at epoch ~95 with best-at-epoch-1 and
        # lost its 66%-val state). The best-ckpt convention is untouched;
        # eval's best-ckpt selection ignores this file by name.
        os.makedirs(os.path.join(results_folder, "saved_models"),
                    exist_ok=True)
        ckpt_lib.save_checkpoint(
            os.path.join(results_folder, "saved_models",
                         "model_last_epoch_checkpoint.pth.tar"),
            params, epoch=epoch, extra=_opt_state_extra(vopt))
        ES(accv, eval_params, epoch)
        if ES.early_stop:
            print("Early stopping triggered. Quitting.")
            stop = True
            break
    if prev_sigterm is not None:
        try:
            signal.signal(signal.SIGTERM, prev_sigterm)
        except (ValueError, TypeError):
            pass
    # Multi-host: align ranks before interpreter exit. The coordination
    # service's atexit Shutdown barrier has a short fixed window, and
    # end-of-run skew is unbounded (the coordinator writes checkpoints/npz
    # after the last collective while other ranks head straight for exit;
    # on oversubscribed hosts compile/e2e skew adds more). Parking everyone
    # here (long, configurable window) makes the Shutdown barrier a no-op.
    if getattr(args, "parallel", False):
        from pathtracker_tpu.parallel import distributed as _distributed

        try:
            _distributed.barrier("post-train-loop", timeout_s=120)
        except Exception as e:  # noqa: BLE001 — any barrier failure
            # A rank that died mid-loop (exception, hard kill) never reaches
            # this barrier; don't make the survivors stall the full default
            # window and surface a bare timeout — say what it means.
            print(f"post-train-loop barrier failed ({e}); a peer rank "
                  f"likely exited abnormally — shutting down anyway",
                  flush=True)
    return {"params": params, "results_folder": results_folder,
            "val_log": val_log_dict, "train_log": train_log_dict,
            "early_stopped": stop}


if __name__ == "__main__":
    main()
