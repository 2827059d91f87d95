"""NeRF MLP + NeRFModel pipeline (vs /root/reference/mlx_nerf/models/NeRF.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import (
    MLPConfig,
    lego_hierarchical,
    lego_coarse,
    image2d,
)
from nerf_meets_mlx_tpu.models import init_nerf_mlp, nerf_mlp_apply, create_nerf


def test_mlp_param_shapes_viewdirs():
    cfg = MLPConfig()
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg, in_dim=63, in_dim_views=27)
    assert len(p["pos_linears"]) == 8
    assert p["pos_linears"][0]["w"].shape == (63, 256)
    # layer 5 takes the skip-concat (W + in_dim) input — skip after idx 4
    assert p["pos_linears"][5]["w"].shape == (256 + 63, 256)
    assert p["pos_linears"][4]["w"].shape == (256, 256)
    assert p["alpha_linear"]["w"].shape == (256, 1)
    assert p["feature_linear"]["w"].shape == (256, 256)
    assert p["dir_linear"]["w"].shape == (256 + 27, 128)
    assert p["rgb_linear"]["w"].shape == (128, 3)


def test_mlp_forward_shapes_and_determinism():
    cfg = MLPConfig()
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg, 63, 27)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 63))
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 27))
    out = nerf_mlp_apply(p, cfg, x, d)
    assert out.shape == (4, 16, 4)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(nerf_mlp_apply(p, cfg, x, d))
    )


def test_mlp_no_viewdirs_head():
    cfg = MLPConfig(use_viewdirs=False, out_channels=3)
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg, 40)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 40))
    assert nerf_mlp_apply(p, cfg, x).shape == (10, 3)
    assert "output_linear" in p and "alpha_linear" not in p


def test_mlp_alpha_ignores_viewdir():
    """Density must not depend on view direction (alpha head branches off
    before dir concat, NeRF.py:229-232)."""
    cfg = MLPConfig()
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg, 63, 27)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 63))
    d1 = jax.random.normal(jax.random.PRNGKey(2), (8, 27))
    d2 = jax.random.normal(jax.random.PRNGKey(3), (8, 27))
    a1 = np.asarray(nerf_mlp_apply(p, cfg, x, d1))[..., 3]
    a2 = np.asarray(nerf_mlp_apply(p, cfg, x, d2))[..., 3]
    np.testing.assert_array_equal(a1, a2)
    # but rgb does depend on it
    r1 = np.asarray(nerf_mlp_apply(p, cfg, x, d1))[..., :3]
    r2 = np.asarray(nerf_mlp_apply(p, cfg, x, d2))[..., :3]
    assert not np.allclose(r1, r2)


def test_mlp_skip_connection_matters():
    """Zeroing the skip-carried input slice changes post-skip layers' input."""
    cfg = MLPConfig(net_depth=8, net_width=32, skips=(4,))
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 4))
    out = nerf_mlp_apply(p, cfg, x, d)
    # perturb only the skip-input weights of layer 5 (first in_dim rows)
    p2 = jax.tree_util.tree_map(lambda a: a, p)
    w5 = np.asarray(p2["pos_linears"][5]["w"]).copy()
    w5[32:, :] += 1.0  # rows corresponding to... input-first layout -> first 8 rows are x
    p2["pos_linears"][5]["w"] = jnp.asarray(w5)
    out2 = nerf_mlp_apply(p2, cfg, x, d)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_mlp_bfloat16_close_to_fp32():
    cfg32 = MLPConfig(net_width=64, net_depth=4, skips=())
    cfg16 = MLPConfig(net_width=64, net_depth=4, skips=(), compute_dtype="bfloat16")
    p = init_nerf_mlp(jax.random.PRNGKey(0), cfg32, 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 8))
    o32 = np.asarray(nerf_mlp_apply(p, cfg32, x, d))
    o16 = np.asarray(nerf_mlp_apply(p, cfg16, x, d))
    assert np.abs(o32 - o16).max() < 0.05


# -- NeRFModel pipeline -----------------------------------------------------


def test_render_rays_hierarchical_shapes():
    cfg = lego_hierarchical()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "fine" in params
    B = 16
    rays_o = jnp.zeros((B, 3)) + jnp.asarray([0.0, 0.0, 4.0])
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (B, 2)) * 0.1, -jnp.ones((B, 1))],
        axis=-1,
    )
    out = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(2), train=True)
    assert out["rgb_coarse"].shape == (B, 3)
    assert out["rgb_fine"].shape == (B, 3)
    assert out["weights"].shape == (B, cfg.render.n_samples)
    assert out["z_vals"].shape == (B, cfg.render.n_samples)
    # rgb_map aliases fine
    np.testing.assert_array_equal(
        np.asarray(out["rgb_map"]), np.asarray(out["rgb_fine"])
    )


def test_render_rays_coarse_only():
    cfg = lego_coarse()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "fine" not in params
    B = 8
    rays_o = jnp.zeros((B, 3))
    rays_d = -jnp.ones((B, 3))
    out = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1))
    assert "rgb_fine" not in out
    np.testing.assert_array_equal(
        np.asarray(out["rgb_map"]), np.asarray(out["rgb_coarse"])
    )


def test_render_rays_eval_deterministic():
    cfg = lego_hierarchical()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B = 4
    rays_o = jnp.zeros((B, 3))
    rays_d = -jnp.ones((B, 3))
    a = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), train=False)
    b = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(99), train=False)
    np.testing.assert_array_equal(np.asarray(a["rgb_map"]), np.asarray(b["rgb_map"]))


def test_render_rays_grads_flow_to_both_nets():
    cfg = lego_hierarchical()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B = 4
    rays_o = jnp.zeros((B, 3))
    rays_d = -jnp.ones((B, 3))
    target = jnp.ones((B, 3)) * 0.5

    def loss_fn(p):
        out = model.render_rays(p, rays_o, rays_d, jax.random.PRNGKey(1), train=True)
        return (
            jnp.mean((out["rgb_coarse"] - target) ** 2)
            + jnp.mean((out["rgb_fine"] - target) ** 2)
        )

    g = jax.grad(loss_fn)(params)
    gc = np.abs(np.asarray(g["coarse"]["pos_linears"][0]["w"])).sum()
    gf = np.abs(np.asarray(g["fine"]["pos_linears"][0]["w"])).sum()
    assert gc > 0 and gf > 0
    # fine loss must NOT leak into coarse through the sampler (stop_gradient)
    def loss_fine_only(p):
        out = model.render_rays(p, rays_o, rays_d, jax.random.PRNGKey(1), train=True)
        return jnp.mean((out["rgb_fine"] - target) ** 2)

    g2 = jax.grad(loss_fine_only)(params)
    gc2 = np.abs(np.asarray(g2["coarse"]["pos_linears"][0]["w"])).sum()
    assert gc2 == 0.0


def test_image2d_model():
    cfg = image2d()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 1, 2))
    out = model.query(params, "coarse", x, None)
    assert out.shape == (100, 1, 3)


def test_aabb_huge_box_matches_no_aabb():
    """An AABB enclosing the whole [near, far] frustum must not change the
    render; a tight AABB must (samples concentrate inside the box)."""
    import dataclasses

    from nerf_meets_mlx_tpu.config import lego_hierarchical

    cfg = lego_hierarchical()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        mlp_fine=None,
        render=dataclasses.replace(cfg.render, n_samples=16, n_importance=0),
    )
    big = cfg.replace(render=dataclasses.replace(cfg.render, n_samples=16,
                                                 n_importance=0,
                                                 aabb=(-100.0,) * 3 + (100.0,) * 3))
    tight = cfg.replace(render=dataclasses.replace(cfg.render, n_samples=16,
                                                   n_importance=0,
                                                   aabb=(-1.0,) * 3 + (1.0,) * 3))
    m0, mb, mt = create_nerf(cfg), create_nerf(big), create_nerf(tight)
    params = m0.init(jax.random.PRNGKey(0))
    rays_o = jnp.array([[0.0, 0.0, 4.0]] * 8)
    rays_d = jnp.array([[0.05, -0.02, -1.0]] * 8)
    a = m0.render_rays(params, rays_o, rays_d, train=False)
    b = mb.render_rays(params, rays_o, rays_d, train=False)
    c = mt.render_rays(params, rays_o, rays_d, train=False)
    np.testing.assert_allclose(
        np.asarray(a["rgb_map"]), np.asarray(b["rgb_map"]), rtol=1e-5, atol=1e-6
    )
    # tight box: all z_vals inside the slab span [3, 5]
    z = np.asarray(c["z_vals"])
    assert z.min() >= 3.0 - 1e-4 and z.max() <= 5.0 + 1e-4
    assert np.asarray(a["z_vals"]).min() < 2.5  # untightened spans from near=2
