"""SlowFast yaml config surface (models/slowfast_cfg.py).

The reference configured FAIR's SlowFast through fvcore yaml
(reference models/cfgs/slowfast.yaml + slowfast_utils.py:13-17); these
tests pin that a user-pointed yaml really drives the architecture: the
in-repo defaults reproduce the baked round-1 values, a modified cfg
changes the built model (incl. ALPHA driving the engine's slow-pathway
subsampling), and malformed cfgs fail loudly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracker_tpu.models.slowfast import SlowFast, build
from pathtracker_tpu.models.slowfast_cfg import DEFAULT_CFGS, load_slowfast_cfg


def test_default_cfgs_match_reference_values():
    cfg = load_slowfast_cfg(DEFAULT_CFGS["slowfast"])
    assert cfg == {
        "arch": "slowfast",
        "alpha": 4, "beta_inv": 8, "fusion_ratio": 2, "fusion_kernel": 7,
        "width": 64, "num_classes": 1, "dropout_rate": 0.5,
        "zero_init_final_bn": True, "stage_blocks": (3, 4, 6, 3),
        "stage_strides": (1, 2, 2, 2),
        "nonlocal_slow": ((), (), (), ()),
    }
    nl = load_slowfast_cfg(DEFAULT_CFGS["slowfast_nl"])
    assert nl["fusion_kernel"] == 5
    assert nl["nonlocal_slow"] == ((), (1, 3), (1, 3, 5), ())


def test_build_reads_default_yaml():
    m = build("slowfast")
    assert (m.alpha, m.beta_inv, m.fusion_kernel) == (4, 8, 7)
    m = build("slowfast_nl")
    assert m.fusion_kernel == 5
    assert m.nonlocal_slow == ((), (1, 3), (1, 3, 5), ())


def test_modified_cfg_drives_model(tmp_path):
    p = tmp_path / "custom.yaml"
    p.write_text(
        "SLOWFAST:\n"
        "  ALPHA: 8\n"
        "  BETA_INV: 4\n"
        "  FUSION_KERNEL_SZ: 5\n"
        "RESNET:\n"
        "  DEPTH: 101\n"
        "  WIDTH_PER_GROUP: 32\n"
        "MODEL:\n"
        "  DROPOUT_RATE: 0.0\n")
    m = build("slowfast", cfg_path=str(p))
    assert isinstance(m, SlowFast)
    assert (m.alpha, m.beta_inv, m.fusion_kernel) == (8, 4, 5)
    assert m.stage_blocks == (3, 4, 23, 3)
    assert (m.width, m.dropout_rate) == (32, 0.0)
    # Explicit kwargs still override the yaml (caller-last merge).
    assert build("slowfast", cfg_path=str(p), alpha=2).alpha == 2


def test_cfg_alpha_drives_pathway_split(tmp_path):
    from pathtracker_tpu import engine

    p = tmp_path / "a8.yaml"
    p.write_text("SLOWFAST:\n  ALPHA: 8\n")
    m = build("slowfast", cfg_path=str(p))
    imgs = jnp.zeros((1, 3, 16, 8, 8))
    slow, fast = engine.slowfast_pathways(imgs, m.alpha)
    assert slow.shape[2] == 2 and fast.shape[2] == 16


def test_custom_cfg_forward_runs(tmp_path):
    # A narrow custom architecture must init + forward through the engine's
    # family dispatch (alpha from the cfg, not the module default).
    from pathtracker_tpu import engine

    p = tmp_path / "tiny.yaml"
    p.write_text(
        "SLOWFAST:\n  ALPHA: 2\n  BETA_INV: 8\n  FUSION_KERNEL_SZ: 3\n"
        "RESNET:\n  WIDTH_PER_GROUP: 16\n")
    m = build("slowfast", cfg_path=str(p))
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 3, 4, 32, 32)), jnp.float32)
    pathways = engine.slowfast_pathways(imgs, m.alpha)
    params = m.init(jax.random.key(0), pathways)
    out, jv = engine.model_step(m, params, imgs, "slowfast")
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_malformed_cfgs_rejected(tmp_path):
    bad_depth = tmp_path / "d.yaml"
    bad_depth.write_text("RESNET:\n  DEPTH: 34\n")
    with pytest.raises(ValueError, match="DEPTH"):
        load_slowfast_cfg(str(bad_depth))

    bad_nl = tmp_path / "nl.yaml"
    bad_nl.write_text(
        "NONLOCAL:\n  LOCATION: [[[], [1]], [[], []], [[], []], [[], []]]\n")
    with pytest.raises(ValueError, match="fast-pathway"):
        load_slowfast_cfg(str(bad_nl))


def test_cli_flag_reaches_builder(tmp_path):
    from types import SimpleNamespace

    from pathtracker_tpu.engine import model_selector

    p = tmp_path / "c.yaml"
    p.write_text("SLOWFAST:\n  ALPHA: 8\n")
    args = SimpleNamespace(model="slowfast", algo="bptt", bf16=False,
                           pretrained=False, fb_kernel_size=7, dimensions=32,
                           slowfast_cfg=str(p))
    m = model_selector(args, timesteps=16)
    assert m.alpha == 8


def test_default_cfg_files_exist():
    for path in DEFAULT_CFGS.values():
        assert os.path.exists(path), path


def test_slow_cfg_parses_single_pathway_schema():
    # Counterpart of reference models/cfgs/slow.yaml (unreachable there:
    # no model_selector name builds it, reference utils/engine.py:75-217):
    # MODEL.ARCH slow, single-pathway NONLOCAL schema, Kinetics-400 head.
    cfg = load_slowfast_cfg(DEFAULT_CFGS["slow"])
    assert cfg["arch"] == "slow"
    assert cfg["num_classes"] == 400
    assert cfg["stage_blocks"] == (3, 4, 6, 3)
    assert cfg["nonlocal_slow"] == ((), (1, 3), (1, 3, 5), ())
    assert "alpha" not in cfg and "fusion_kernel" not in cfg


def test_slow_registry_builds_single_pathway_model():
    from pathtracker_tpu.models.registry import family, model_selector
    from pathtracker_tpu.models.slowfast import SlowOnly

    m = model_selector("slow", timesteps=8)
    assert isinstance(m, SlowOnly)
    assert m.num_classes == 1  # registry overrides the yaml's 400 head
    assert m.nonlocal_slow == ((), (1, 3), (1, 3, 5), ())
    assert family("slow") == "torchvision"


def test_slow_forward_contract(tmp_path):
    # Narrow custom slow cfg forwards through the TORCHVISION family
    # dispatch (plain clip in, logits out, no pathway split).
    from pathtracker_tpu import engine
    from pathtracker_tpu.models.slowfast import SlowOnly, build

    p = tmp_path / "slow_tiny.yaml"
    p.write_text(
        "MODEL:\n  ARCH: slow\n  NUM_CLASSES: 1\n  DROPOUT_RATE: 0.0\n"
        "RESNET:\n  WIDTH_PER_GROUP: 8\n"
        "NONLOCAL:\n  LOCATION: [[[]], [[1]], [[]], [[]]]\n")
    m = build("slow", cfg_path=str(p))
    assert isinstance(m, SlowOnly)
    assert m.nonlocal_slow == ((), (1,), (), ())
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 3, 4, 32, 32)), jnp.float32)
    params = m.init(jax.random.key(0), imgs)
    out, jv = engine.model_step(m, params, imgs, "slow")
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_structurally_malformed_cfgs_raise_valueerror(tmp_path):
    # Single-element NONLOCAL stages (missing the fast list) and scalar
    # SPATIAL_STRIDES must fail with a ValueError naming the file, not a
    # raw IndexError/TypeError from deep inside the parser.
    p = tmp_path / "nl_short.yaml"
    p.write_text("NONLOCAL:\n  LOCATION: [[[1, 3]], [[]], [[]], [[]]]\n")
    with pytest.raises(ValueError, match="NONLOCAL.LOCATION"):
        load_slowfast_cfg(str(p))

    p2 = tmp_path / "strides_scalar.yaml"
    p2.write_text("RESNET:\n  SPATIAL_STRIDES: [1, 2, 2, 2]\n")
    with pytest.raises(ValueError, match="SPATIAL_STRIDES"):
        load_slowfast_cfg(str(p2))
