"""StableHLO serving-export round-trips (pathtracker_tpu/eval/serve.py).

The artifact must be self-contained: deserializing the payload and calling
it on wire-format uint8 frames must reproduce the live jitted model
bit-exactly, at any batch size for symbolic exports.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pathtracker_tpu.eval.serve import (export_stablehlo, load_exported,
                                        make_inference_fn)
from pathtracker_tpu.models.int_circuit import InT

T, H, W = 4, 32, 32


@pytest.fixture(scope="module")
def tiny_int():
    model = InT(dimensions=8, timesteps=T, kernel_size=3)
    sample = jnp.zeros((2, 3, T, H, W), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    return model, params


def _frames(batch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (batch, T, H, W, 3), dtype=np.uint8)


def test_export_symbolic_batch_roundtrip(tiny_int):
    model, params = tiny_int
    payload = export_stablehlo(model, "InT", params, T)
    assert isinstance(payload, bytes) and len(payload) > 0

    served = load_exported(payload)
    live = make_inference_fn(model, "InT", params)
    for batch in (2, 5):  # one artifact, multiple batch sizes
        x = _frames(batch, seed=batch)
        got = np.asarray(served(x))
        want = np.asarray(live(x))
        assert got.shape == (batch,)
        np.testing.assert_array_equal(got, want)
        assert np.all((got >= 0) & (got <= 1))  # sigmoid probabilities


def test_export_static_batch_pins_shape(tiny_int):
    model, params = tiny_int
    payload = export_stablehlo(model, "InT", params, T, batch=2,
                               probs=False)
    served = load_exported(payload)
    x = _frames(2)
    got = np.asarray(served(x))
    want = np.asarray(make_inference_fn(model, "InT", params,
                                        probs=False)(x))
    np.testing.assert_array_equal(got, want)
    with pytest.raises(Exception):
        served(_frames(3))  # wrong batch must be rejected, not miscomputed


def test_export_second_family_gru():
    """The export path is family-generic: `gru` exercises the registry's
    width-doubling + the ConvGRU scan. (The torchvision/coord-channel and
    slowfast families export identically — verified out-of-suite; their
    CPU compiles are too slow for CI.)"""
    from types import SimpleNamespace

    from pathtracker_tpu.train.loop import init_model

    args = SimpleNamespace(model="gru", seed=0, dimensions=8,
                           fb_kernel_size=3, pretrained=False, algo="bptt",
                           penalty=False, optical_flow=False,
                           slowfast_cfg=None, bf16=False)
    model, variables = init_model(args, T)
    params = variables["params"]
    served = load_exported(export_stablehlo(model, "gru", params, T))
    x = _frames(3, seed=3)
    np.testing.assert_array_equal(
        np.asarray(served(x)),
        np.asarray(make_inference_fn(model, "gru", params)(x)))


def test_export_cli_from_checkpoint(tmp_path):
    from pathtracker_tpu.eval import serve as serve_cli
    from pathtracker_tpu.train.checkpoint import save_checkpoint

    model = InT(dimensions=8, timesteps=T, kernel_size=3)
    sample = jnp.zeros((2, 3, T, H, W), jnp.float32)
    params = model.init(jax.random.key(1), sample)["params"]
    ckpt = tmp_path / "model_val_acc_0050_epoch_01_checkpoint.pth.tar"
    save_checkpoint(str(ckpt), params, epoch=1, acc=0.5)

    out = tmp_path / "int.stablehlo"
    serve_cli.main(["--model", "InT", "--length", str(T), "-d", "8",
                    "-k", "3", "--ckpt", str(ckpt), "--out", str(out),
                    "--selftest-batch", "3"])  # selftest asserts internally
    payload = out.read_bytes()

    # The artifact carries the CHECKPOINT's weights, not the init's: it
    # must match an inference fn built from the loaded params.
    served = load_exported(payload)
    x = _frames(3, seed=7)
    want = np.asarray(make_inference_fn(model, "InT", params)(x))
    np.testing.assert_array_equal(np.asarray(served(x)), want)
