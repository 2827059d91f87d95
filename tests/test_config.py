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


def test_config_from_text_full_flag_coverage(tmp_path):
    """Every reference flag that maps to a config field round-trips from the
    text format (config_parser.py:3-80): sampling/render, llff, deepvoxels,
    encoding, viewdirs, cadence keys."""
    p = tmp_path / "fern.txt"
    p.write_text(
        "dataset_type = llff\n"
        "factor = 4\n"
        "llffhold = 10\n"
        "spherify = True\n"
        "no_ndc = True\n"
        "lindisp = True\n"
        "perturb = 0.0\n"
        "raw_noise_std = 1.0\n"
        "n_depth_samples = 32\n"   # the reference's rename of N_samples
        "chunk = 16384\n"
        "multires = 6\n"
        "multires_views = 2\n"
        "use_viewdirs = False\n"
        "shape = vase\n"
        "i_print = 50\n"
        "i_img = 250\n"
        "i_weights = 5000\n"
        "i_testset = 25000\n"
        "i_video = 25000\n"
    )
    cfg = config_from_text(p)
    assert cfg.data.dataset_type == "llff"
    assert cfg.data.llff_factor == 4
    assert cfg.data.llffhold == 10
    assert cfg.data.spherify is True
    assert cfg.data.dv_shape == "vase"
    assert cfg.render.ndc is False
    assert cfg.render.lindisp is True
    assert cfg.render.perturb == 0.0
    assert cfg.render.raw_noise_std == 1.0
    assert cfg.render.n_samples == 32
    assert cfg.render.ray_chunk == 16384
    assert cfg.pos_encoding.n_freqs == 6
    assert cfg.dir_encoding.n_freqs == 2
    assert cfg.mlp.use_viewdirs is False
    assert cfg.mlp_fine.use_viewdirs is False
    assert cfg.train.i_print == 50 and cfg.train.i_img == 250
    assert cfg.train.i_weights == 5000
    assert cfg.train.i_testset == 25000 and cfg.train.i_video == 25000


def test_config_from_text_i_embed_identity(tmp_path):
    p = tmp_path / "ident.txt"
    p.write_text("i_embed = -1\n")
    cfg = config_from_text(p)
    assert cfg.pos_encoding.kind == "identity"
