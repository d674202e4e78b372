"""One rank of the 2-process multi-host test (tests/test_multihost.py).

Run as: python tests/_multihost_rank.py <rank> <port>
with JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4,
PALLAS_AXON_POOL_IPS= in the environment, so each process contributes 4
virtual CPU devices to an 8-device global mesh over jax.distributed — the
real multi-process code path (process_count()==2), not the single-process
8-device simulation the rest of the suite uses.

The reference has no multi-host anything (torch DataParallel is single
process, reference mainclean.py:132-134); this exercises the framework's
DCN story end-to-end: distributed.initialize -> global Mesh -> disjoint
per-process batch slices assembled via put_global_batch -> one jitted
train step with replicated params -> identical replicated loss/params on
every process.
"""

import sys

import numpy as np


def main(rank: int, port: int) -> None:
    from pathtracker_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

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

    # The same global batch on both processes, each feeding its own half —
    # the exact contract of the sharded TFRecord stream (pipeline.py
    # shard_index/shard_count) + put_global_batch assembly.
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(16, 4, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=(16,), dtype=np.uint8)
    lo, hi = rank * 8, (rank + 1) * 8
    sh = mesh_lib.batch_sharding(mesh)
    imgs_g = mesh_lib.put_global_batch(imgs[lo:hi], sh)
    labels_g = mesh_lib.put_global_batch(labels[lo:hi], sh)
    assert imgs_g.shape == (16, 4, 32, 32, 3), imgs_g.shape

    train_step = make_train_step(model, "InT", optimizer)
    params, opt_state, stats = train_step(params, opt_state, imgs_g, labels_g)
    loss = float(stats["loss"])
    fp = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(params))
    print(f"RANK{rank} LOSS {loss:.10f} FP {fp:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
