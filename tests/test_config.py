"""Config system: presets, text-config overlay (reference format)."""

import numpy as np

from nerf_meets_mlx_tpu.config import (
    PRESETS,
    parse_text_config,
    config_from_text,
    lego_hierarchical,
)


def test_presets_exist_and_build():
    for name, fn in PRESETS.items():
        cfg = fn()
        assert cfg.pos_encoding.out_dim > 0, name


def test_lego_hierarchical_matches_reference_defaults():
    cfg = lego_hierarchical()
    # run-defining hyperparameters (BASELINE.md / config_parser.py:17-23,36-37)
    assert cfg.train.n_rand == 4096
    assert cfg.train.lrate == 5e-4
    assert cfg.train.lrate_decay == 250
    assert cfg.render.n_samples == 64
    assert cfg.render.n_importance == 128
    assert cfg.render.ray_chunk == 32768
    assert cfg.pos_encoding.out_dim == 63
    assert cfg.dir_encoding.out_dim == 27
    assert cfg.mlp.net_depth == 8 and cfg.mlp.net_width == 256
    assert cfg.mlp.skips == (4,)
    assert cfg.render.near == 2.0 and cfg.render.far == 6.0


def test_image2d_matches_reference():
    from nerf_meets_mlx_tpu.config import image2d

    cfg = image2d()
    # __viser_image_learning.py:197-227
    assert cfg.pos_encoding.out_dim == 40
    assert cfg.pos_encoding.max_freq_exp == 8.0
    assert cfg.train.lrate == 1e-3
    assert cfg.train.adam_b2 == 0.99
    assert not cfg.mlp.use_viewdirs


def test_parse_text_config_typed(tmp_path):
    p = tmp_path / "lego.txt"
    p.write_text(
        "expname = blender_paper_lego\n"
        "basedir = ./logs\n"
        "datadir = ./data/nerf_synthetic/lego\n"
        "dataset_type = blender\n"
        "\n"
        "no_batching = True\n"
        "use_viewdirs = True\n"
        "white_bkgd = True\n"
        "lrate_decay = 500\n"
        "N_samples = 64\n"
        "N_importance = 64\n"
        "N_rand = 1024\n"
        "precrop_iters = 500\n"
        "precrop_frac = 0.5\n"
        "half_res = True\n"
    )
    kv = parse_text_config(p)
    # values are typed, not strings (fixes config_parser.py:104-122)
    assert kv["lrate_decay"] == 500 and isinstance(kv["lrate_decay"], int)
    assert kv["precrop_frac"] == 0.5 and isinstance(kv["precrop_frac"], float)
    assert kv["half_res"] is True
    assert kv["expname"] == "blender_paper_lego"

    cfg = config_from_text(p)
    assert cfg.train.n_rand == 1024
    assert cfg.train.lrate_decay == 500
    assert cfg.render.n_importance == 64
    assert cfg.train.precrop_iters == 500
    assert cfg.data.half_res is True
    assert cfg.train.exp_name == "blender_paper_lego"


def test_config_replace_immutability():
    cfg = lego_hierarchical()
    cfg2 = cfg.replace(train=cfg.train)
    assert cfg2 is not cfg
    assert hash(cfg) == hash(cfg)  # hashable (jit static arg requirement)
