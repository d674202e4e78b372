"""Device-resident datasets: keep the WHOLE dataset in HBM, sample batches
on device inside the jitted train step.

The reference streams TFRecords from disk every batch (tf.data); on TPU the
full PathTracker dataset fits in HBM (20k clips x 64 frames x 32x32x3 uint8
= 3.9 GB against 16 GB/chip), so the host input pipeline — decode, shuffle,
batch, and the host->device copy — can disappear from the steady state
entirely: one upload at startup, then every batch is a device-side gather.
On a host with slow H2D this is the difference between transfer-bound and
compute-bound training; on production hosts it still removes the input
pipeline as a moving part.

Shuffle semantics: a fresh permutation per epoch derived on device from
(seed, epoch) — same coverage guarantee as the reference's reshuffling
loader (every clip exactly once per epoch).
"""

from __future__ import annotations

import glob as _glob

import numpy as np


def load_resident(data_dir: str, timesteps: int, height: int = 32,
                  width: int = 32, limit: int | None = None):
    """Load every shard matching the glob into one (clips, labels) pair and
    device_put them. Returns (clips [N,T,H,W,3] uint8 on device, labels [N])."""
    import jax

    from pathtracker_tpu.data import native as _native
    from pathtracker_tpu.data.tfrecord import read_clip_records as py_read

    files = sorted(_glob.glob(data_dir))
    if not files:
        raise FileNotFoundError(f"no shards match {data_dir}")
    all_clips, all_labels = [], []
    n = 0
    for path in files:
        if _native.available():
            with _native.ShardView(path, timesteps, height, width) as shard:
                take = len(shard)
                if limit is not None:
                    take = min(take, limit - n)
                # MUST be real copies: basic slicing returns a VIEW into the
                # C++ handle's buffer, and close() releases the handle to a
                # pool whose next acquisition decodes the NEXT shard into the
                # same memory — a view kept here silently becomes that
                # shard's clips (measured: with 2 shards, half the resident
                # dataset was duplicated shard-2 clips under shard-1 labels,
                # i.e. 50% label noise; tests/test_tfrecord.py pins this).
                all_clips.append(shard.clips[:take].copy())
                all_labels.append(shard.labels[:take].copy())
        else:
            clips = []
            labels = []
            for clip, label in py_read(path, timesteps, height, width):
                clips.append(clip)
                labels.append(label)
                if limit is not None and n + len(clips) >= limit:
                    break
            take = len(clips)
            all_clips.append(np.stack(clips))
            all_labels.append(np.asarray(labels, np.uint8))
        n += take
        if limit is not None and n >= limit:
            break
    clips = np.concatenate(all_clips)
    labels = np.concatenate(all_labels)
    return jax.device_put(clips), jax.device_put(labels)


class ResidentBatches:
    """Re-iterable batch view over device-resident arrays (used for
    validation; gathers stay on device).

    shuffle=True reshuffles every iteration — matching the reference's val
    loader (tf.data shuffle(1000) with reshuffle_each_iteration, reference
    utils/TFRDataset.py:43-47). This matters beyond statistics: validation
    runs `logiters` batches per epoch, and EarlyStopping's patience counter
    only resets on val-metric improvement — with a FIXED val slice the
    metric is constant through the task's long chance-level plateau and
    early stopping fires deterministically mid-plateau."""

    def __init__(self, clips, labels, batch_size: int, shuffle: bool = True,
                 seed: int = 0):
        self.clips = clips
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        import jax.numpy as jnp

        n = int(self.labels.shape[0])
        b = self.batch_size
        order = (self._rng.permutation(n) if self.shuffle else np.arange(n))
        for i in range(0, n - b + 1, b):
            idx = jnp.asarray(order[i:i + b])
            yield (jnp.take(self.clips, idx, axis=0),
                   jnp.take(self.labels, idx, axis=0))


def make_resident_train_step(model, model_name: str, optimizer,
                             n_clips: int, batch_size: int,
                             penalty: bool = False,
                             prepare_kwargs: dict | None = None,
                             seed: int = 0, mesh=None,
                             fused_steps: int = 1):
    """Jitted step over a device-resident dataset.

    step(params, opt_state, data, labels, step_idx) gathers batch
    `step_idx % steps_per_epoch` of the epoch `step_idx // steps_per_epoch`
    permutation on device — zero host involvement besides the scalar index.
    Returns (params, opt_state, stats dict) like train.steps.make_train_step.

    With a mesh, `data`/`labels` arrive sharded over the 'data' axis and the
    gather runs per device via shard_map: each shard permutes ITS resident
    slice per epoch (rng folded with the device index), so the global batch
    is the concatenation of local gathers — no cross-device index traffic;
    the usual data-parallel gradient all-reduce follows.

    fused_steps > 1 chains that many optimizer steps inside ONE compiled
    program (`lax.scan` over the step body; the whole dataset is already on
    device, so nothing needs the host between steps) and returns per-step
    stats stacked [k]. One dispatch + one host fetch then amortizes over k
    steps — on a tunneled backend where each fetch costs ~27 ms this is the
    difference between ~0.18 s and ~0.12 s per 32-frame step. Stats dict
    values are scalars when fused_steps == 1 (drop-in) and [k] arrays
    otherwise; epoch-tail windows shorter than k compile once per distinct
    length."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    from pathtracker_tpu.data.prepare import prepare_batch
    from pathtracker_tpu.engine import model_step
    from pathtracker_tpu.utils.metrics import acc_scores, bce_with_logits

    prep = dict(prepare_kwargs or {})
    steps_per_epoch = max(n_clips // batch_size, 1)
    n_dev = len(mesh.devices.ravel()) if mesh is not None else 1
    assert batch_size % n_dev == 0 and n_clips % n_dev == 0, (
        "resident sharding needs batch and dataset divisible by the mesh")
    n_local = n_clips // n_dev
    b_local = batch_size // n_dev

    _KEYS = ("loss", "scaled_loss", "jvpen", "balacc", "precision", "recall",
             "f1score")

    def loss_fn(params, raw_imgs, raw_labels, rng):
        imgs, target = prepare_batch(raw_imgs, raw_labels, **prep)
        output, jv_penalty = model_step(model, {"params": params}, imgs,
                                        model_name, rngs={"dropout": rng})
        loss = bce_with_logits(output, target)
        jv = jnp.mean(jv_penalty)
        total = loss + jv * 1e1 if penalty else loss
        return total, (loss, jv, output)

    def _gather_local(data, labels, step_idx, dev, b):
        """Per-shard epoch permutation + slot gather over a local slice."""
        epoch = step_idx // steps_per_epoch
        slot = step_idx % steps_per_epoch
        n = data.shape[0]
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.key(seed), epoch), dev)
        perm = jax.random.permutation(key, n)
        # Batches tile the local permutation; wrap via mod so a
        # steps_per_epoch derived from the GLOBAL batch count stays valid.
        idx = (slot * b + jnp.arange(b)) % n
        idx = jnp.take(perm, idx, axis=0)
        return jnp.take(data, idx, axis=0), jnp.take(labels, idx, axis=0)

    def _step_core(params, opt_state, data, labels, step_idx):
        if mesh is None:
            raw_imgs, raw_labels = _gather_local(data, labels, step_idx, 0,
                                                 batch_size)
        else:
            from jax import shard_map

            def local(d, l, si):
                dev = jax.lax.axis_index("data")
                return _gather_local(d, l, si[0], dev, b_local)

            raw_imgs, raw_labels = shard_map(
                local, mesh=mesh,
                in_specs=(P("data"), P("data"), P()),
                out_specs=(P("data"), P("data")))(
                    data, labels, jnp.reshape(step_idx, (1,)))
        rng = jax.random.fold_in(jax.random.key(seed + 1), step_idx)
        (total, (loss, jv, output)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, raw_imgs, raw_labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target = raw_labels.astype(jnp.float32)
        balacc, precision, recall, f1s = acc_scores(target, output)
        packed = jnp.stack([loss.astype(jnp.float32), total, jv, balacc,
                            precision, recall, f1s])
        return params, opt_state, packed

    _step = functools.partial(jax.jit, donate_argnums=(0, 1))(_step_core)

    @functools.lru_cache(maxsize=None)
    def _fused(k: int):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(params, opt_state, data, labels, step_idx0):
            def body(carry, si):
                p, o = carry
                p, o, packed = _step_core(p, o, data, labels, si)
                return (p, o), packed

            (params, opt_state), packed = jax.lax.scan(
                body, (params, opt_state),
                step_idx0 + jnp.arange(k, dtype=jnp.uint32))
            return params, opt_state, packed  # packed: [k, 7]

        return f

    counter = [0]

    def train_step(params, opt_state, data, labels):
        step_idx = np.uint32(counter[0])
        if fused_steps <= 1:
            counter[0] += 1
            params, opt_state, packed = _step(params, opt_state, data, labels,
                                              step_idx)
            host = np.asarray(packed)  # single host fetch / sync point
            return params, opt_state, dict(zip(_KEYS, host))
        # Window size: fused_steps, clipped so a window never crosses the
        # epoch boundary (keeps epoch accounting exact; tail windows reuse a
        # once-compiled program per distinct length).
        slot = counter[0] % steps_per_epoch
        k = min(fused_steps, steps_per_epoch - slot)
        counter[0] += k
        params, opt_state, packed = _fused(k)(params, opt_state, data,
                                              labels, step_idx)
        host = np.asarray(packed)  # [k, 7], ONE host fetch for k steps
        return params, opt_state, dict(zip(_KEYS, host.T))

    train_step.steps_per_epoch = steps_per_epoch
    train_step.fused_steps = max(1, fused_steps)
    train_step.windows_per_epoch = -(-steps_per_epoch // max(1, fused_steps))
    return train_step
