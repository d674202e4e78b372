"""Serving path: checkpoint -> jitted inference function -> portable
StableHLO artifact.

The reference has no deployment story beyond re-running test_model.py
inside the training repo. For production serving this module provides:

  * ``make_inference_fn``: one jitted, self-contained program that takes
    the WIRE format (uint8 [B,T,H,W,3] frames, exactly what the TFRecords
    carry) and returns per-clip scores — normalization/layout prep
    (data/prepare.py), the model forward, and the sigmoid all fused into a
    single XLA executable. No Python in the hot path.
  * ``export_stablehlo`` / ``load_exported``: `jax.export` serialization of
    that program with a SYMBOLIC batch dimension, so one artifact serves
    any batch size. The artifact is a versioned StableHLO payload — it can
    be shipped to a serving container and executed there (via
    jax.export.deserialize) with no model code, no checkpoint parsing, and
    no pathtracker_tpu dependency at all.

CLI:
  python -m pathtracker_tpu.eval.serve --model InT --length 64 \
      --ckpt results/.../model_*.tar --out /tmp/int64.stablehlo

Verification: tests/test_export.py round-trips artifacts and pins
deserialized outputs against the live model to zero ULP.
"""

from __future__ import annotations

import argparse

import numpy as np

from pathtracker_tpu import engine
from pathtracker_tpu.data.prepare import prepare_batch


def make_inference_fn(model, model_name: str, params, probs: bool = True,
                      pretrained_norm: bool = False):
    """uint8 [B,T,H,W,3] -> f32 [B] scores, one jitted program.

    probs=True applies the sigmoid (serving returns probabilities);
    probs=False returns raw logits (the eval scripts' convention,
    thresholded at 0 — reference test_model.py:127)."""
    import jax
    import jax.numpy as jnp

    coord = engine.needs_coord_channels(model_name)
    frozen = {"params": params}

    def infer(raw_imgs):
        imgs, _ = prepare_batch(
            raw_imgs, jnp.zeros((raw_imgs.shape[0],), jnp.uint8),
            pretrained_norm=pretrained_norm, coord_channels=coord)
        output = engine.model_step(model, frozen, imgs, model_name)[0]
        logit = output[:, 0]
        return jax.nn.sigmoid(logit) if probs else logit

    return jax.jit(infer)


def export_stablehlo(model, model_name: str, params, timesteps: int,
                     height: int = 32, width: int = 32, batch=None,
                     probs: bool = True, pretrained_norm: bool = False,
                     platforms=("cpu", "tpu")) -> bytes:
    """Serialize the inference program to a portable StableHLO artifact.

    batch=None exports a symbolic batch dimension ("b"): the single
    artifact runs at any batch size. Pass an int to pin a static batch
    (e.g. for compilers/runtimes that reject dynamic dims).

    platforms pins which backends the artifact may execute on; the default
    multi-platform export runs on both CPU and TPU serving hosts
    regardless of which backend performed the export. (Without it,
    jax.export lowers for the exporting process's default backend only.)

    Caveat inherited from the model class (document to integrators): the
    reference's `track_running_stats=False` BatchNorm means normalization
    uses CURRENT-BATCH statistics, so a clip's score depends on its
    co-batched clips. Serve with a fixed batching policy when bitwise
    reproducibility per clip matters."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    infer = make_inference_fn(model, model_name, params, probs=probs,
                              pretrained_norm=pretrained_norm)
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, timesteps, height, width, 3), jnp.uint8)
    return bytes(jexport.export(
        infer, platforms=list(platforms))(spec).serialize())


def load_exported(payload: bytes):
    """Deserialize a StableHLO artifact into a callable.

    This is all a serving process needs — no model code, no checkpoint."""
    from jax import export as jexport

    exported = jexport.deserialize(payload)
    return lambda raw_imgs: exported.call(raw_imgs)


def _build(args):
    from types import SimpleNamespace

    from pathtracker_tpu.train.checkpoint import load_params
    from pathtracker_tpu.train.loop import init_model

    margs = SimpleNamespace(
        model=args.model, seed=0, dimensions=args.dimensions,
        fb_kernel_size=args.fb_kernel_size,
        algo="bptt", penalty=False, optical_flow=False,
        pretrained=getattr(args, "pretrained", False),
        slowfast_cfg=args.slowfast_cfg, bf16=getattr(args, "bf16", False))
    model, variables = init_model(margs, args.length)
    params = variables["params"]
    if args.ckpt:
        params = load_params(args.ckpt, template=params)
    return model, params


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a checkpoint as a StableHLO serving artifact")
    p.add_argument("--model", default="InT")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint (native msgpack or reference torch .tar)")
    p.add_argument("--length", type=int, default=64, help="clip timesteps")
    p.add_argument("-d", "--dimensions", type=int, default=32)
    p.add_argument("-k", "--fb_kernel_size", type=int, default=7)
    p.add_argument("--slowfast_cfg", default=None)
    p.add_argument("--bf16", action="store_true",
                   help="export the mixed-precision fast path (bf16 MXU "
                        "inputs, f32 state — same policy as training)")
    p.add_argument("--pretrained", action="store_true",
                   help="checkpoint was trained with --pretrained: bake the "
                        "Kinetics mean/std input normalization into the "
                        "artifact (and load local pretrained weights when "
                        "no --ckpt is given)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated execution platforms baked into the "
                        "artifact (default: cpu,tpu — runs on either)")
    p.add_argument("--batch", type=int, default=None,
                   help="static batch size (default: symbolic 'b')")
    p.add_argument("--logits", action="store_true",
                   help="emit raw logits instead of sigmoid probabilities")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--selftest-batch", type=int, default=0,
                   help="after export, round-trip the artifact on random "
                        "frames at this batch size and verify against the "
                        "live model")
    args = p.parse_args(argv)

    model, params = _build(args)
    payload = export_stablehlo(
        model, args.model, params, args.length, batch=args.batch,
        probs=not args.logits, pretrained_norm=args.pretrained,
        platforms=tuple(s for s in args.platforms.split(",") if s))
    with open(args.out, "wb") as f:
        f.write(payload)
    print(f"exported {args.model} T={args.length} -> {args.out} "
          f"({len(payload)} bytes, batch="
          f"{'symbolic' if args.batch is None else args.batch})")

    if args.selftest_batch:
        b = args.selftest_batch
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (b, args.length, 32, 32, 3), dtype=np.uint8)
        with open(args.out, "rb") as f:
            served = load_exported(f.read())
        got = np.asarray(served(x))
        want = np.asarray(make_inference_fn(
            model, args.model, params, probs=not args.logits,
            pretrained_norm=args.pretrained)(x))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        print(f"selftest ok: artifact == live model at batch {b} "
              f"(scores {np.round(got[:4], 4)})")


if __name__ == "__main__":
    main()
