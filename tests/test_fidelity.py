"""Fidelity harness: the reference-semantics path end-to-end.

Runs the hierarchical pipeline with compositing="reference" and
frequency_bands="reference_squared" and checks outputs AND parameter
gradients against an independent numpy transcription of the reference math
(render_rays -> embed -> MLP -> raw2outputs,
/root/reference/mlx_nerf/rendering/render.py:112-162 + models/NeRF.py +
models/embedding.py). This is the "match rendered images and pixel
gradients" gate from BASELINE.md, executed on the deterministic
(perturb=0, noise=0) path so no RNG-stream alignment is needed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import (
    EncodingConfig,
    MLPConfig,
    RenderConfig,
    lego_hierarchical,
)
from nerf_meets_mlx_tpu.models import create_nerf


def _np_linear(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def _np_encode(x, n_freqs, max_exp, include_input, squared):
    """numpy twin of sinusoidal_encode with reference_squared bands."""
    lin = np.linspace(0.0, max_exp, n_freqs, dtype=np.float32)
    bands = lin**2 if squared else 2.0**lin
    scaled = (x[..., None] * bands).reshape(*x.shape[:-1], -1)
    out = np.concatenate([np.sin(scaled), np.sin(scaled + np.pi / 2)], axis=-1)
    if include_input:
        out = np.concatenate([out, x], axis=-1)
    return out.astype(np.float32)


def _np_mlp(params, cfg, x_pos, x_dir):
    h = x_pos
    for idx, p in enumerate(params["pos_linears"]):
        h = np.maximum(_np_linear(p, h), 0.0)
        if idx in cfg.skips:
            h = np.concatenate([x_pos, h], axis=-1)
    alpha = _np_linear(params["alpha_linear"], h)
    feat = _np_linear(params["feature_linear"], h)
    h = np.concatenate([feat, x_dir], axis=-1)
    h = np.maximum(_np_linear(params["dir_linear"], h), 0.0)
    rgb = _np_linear(params["rgb_linear"], h)
    return np.concatenate([rgb, alpha], axis=-1)


def _np_raw2outputs_reference(raw, z, rays_d):
    sigma = raw[..., 3]
    deltas = np.diff(z, axis=-1)
    deltas = np.concatenate([deltas, np.full_like(deltas[..., :1], 1e10)], -1)
    deltas = deltas * np.linalg.norm(rays_d[..., None, :], axis=-1)
    dd = deltas * sigma
    alphas = 1.0 - np.exp(-np.maximum(dd, 0.0))
    T = np.exp(-np.concatenate([np.zeros_like(dd[..., :1]), np.cumsum(dd[..., :-1], -1)], -1))
    w = alphas * T
    rgb = (w[..., None] * raw[..., :3]).sum(-2)
    return rgb, w


def _reference_cfg():
    cfg = lego_hierarchical()
    return cfg.replace(
        pos_encoding=EncodingConfig(
            kind="sinusoidal", in_dim=3, n_freqs=6,
            frequency_bands="reference_squared", include_input=True,
        ),
        dir_encoding=EncodingConfig(
            kind="sinusoidal", in_dim=3, n_freqs=3,
            frequency_bands="reference_squared", include_input=True,
        ),
        mlp=MLPConfig(net_depth=4, net_width=32, skips=(2,)),
        mlp_fine=MLPConfig(net_depth=4, net_width=32, skips=(2,)),
        render=RenderConfig(
            n_samples=8, n_importance=0, perturb=0.0, raw_noise_std=0.0,
            white_bkgd=False, compositing="reference",
        ),
    )


def _rays(B=6):
    rng = np.random.default_rng(0)
    rays_o = np.zeros((B, 3), np.float32) + np.array([0, 0, 4], np.float32)
    rays_d = rng.normal(size=(B, 3)).astype(np.float32) * 0.2
    rays_d[:, 2] = -1.0
    return jnp.asarray(rays_o), jnp.asarray(rays_d)


def _np_pipeline(params_np, cfg, rays_o, rays_d):
    B = rays_o.shape[0]
    n = cfg.render.n_samples
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    z = cfg.render.near * (1 - t) + cfg.render.far * t
    z = np.broadcast_to(z, (B, n)).astype(np.float32)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    enc_p = _np_encode(pts, 6, 5.0, True, True)
    dirs = np.broadcast_to(viewdirs[:, None, :], pts.shape)
    enc_d = _np_encode(dirs, 3, 2.0, True, True)
    raw = _np_mlp(params_np, cfg.mlp, enc_p, enc_d)
    return _np_raw2outputs_reference(raw, z, rays_d)


def test_reference_semantics_pipeline_allclose():
    cfg = _reference_cfg()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rays_o, rays_d = _rays()

    out = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), train=True)

    params_np = jax.tree_util.tree_map(np.asarray, params["coarse"])
    rgb_np, w_np = _np_pipeline(params_np, cfg, np.asarray(rays_o), np.asarray(rays_d))

    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]), rgb_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), w_np, rtol=1e-4, atol=1e-5)


def test_reference_semantics_pixel_gradients_allclose():
    """Pixel-gradient parity: d MSE / d first-layer weights matches finite
    differences of the numpy transcription."""
    cfg = _reference_cfg()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rays_o, rays_d = _rays(B=3)
    target = jnp.full((3, 3), 0.3)

    def loss_fn(p):
        out = model.render_rays(p, rays_o, rays_d, jax.random.PRNGKey(1), train=True)
        return jnp.mean((out["rgb_coarse"] - target) ** 2)

    g = jax.grad(loss_fn)(params)
    g00 = np.asarray(g["coarse"]["pos_linears"][0]["w"])

    # finite-difference the numpy pipeline at a few weight entries
    params_np = jax.tree_util.tree_map(np.asarray, params["coarse"])
    tgt = np.asarray(target)

    def np_loss(p_np):
        rgb, _ = _np_pipeline(p_np, cfg, np.asarray(rays_o), np.asarray(rays_d))
        return np.mean((rgb - tgt) ** 2)

    eps = 1e-3
    rng = np.random.default_rng(1)
    for _ in range(5):
        i = rng.integers(0, g00.shape[0])
        j = rng.integers(0, g00.shape[1])
        p_plus = jax.tree_util.tree_map(np.copy, params_np)
        p_plus["pos_linears"][0]["w"][i, j] += eps
        p_minus = jax.tree_util.tree_map(np.copy, params_np)
        p_minus["pos_linears"][0]["w"][i, j] -= eps
        fd = (np_loss(p_plus) - np_loss(p_minus)) / (2 * eps)
        np.testing.assert_allclose(g00[i, j], fd, rtol=5e-2, atol=1e-5)


def test_reference_vs_canonical_differ():
    """The two compositing modes are genuinely different programs."""
    cfg_ref = _reference_cfg()
    cfg_can = cfg_ref.replace(
        render=dataclasses.replace(cfg_ref.render, compositing="canonical")
    )
    m1, m2 = create_nerf(cfg_ref), create_nerf(cfg_can)
    params = m1.init(jax.random.PRNGKey(0))
    rays_o, rays_d = _rays(B=4)
    o1 = m1.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), train=False)
    o2 = m2.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), train=False)
    assert not np.allclose(np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]))


def _np_sample_pdf_det(z, w, n_imp, eps=1e-5):
    """numpy twin of sample_pdf(deterministic=True) — torch-variant math."""
    B, n = w.shape
    w = w + 0.01
    s = w.sum(-1, keepdims=True)
    pad = np.maximum(eps - s, 0.0)
    w = w + pad / n
    s = s + pad
    cdf = np.minimum(1.0, np.cumsum(w / s, -1))
    cdf = np.concatenate([np.zeros((B, 1), np.float32), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_imp, dtype=np.float32), (B, n_imp))
    zm = 0.5 * (z[:, 1:] + z[:, :-1])
    zm = np.concatenate([zm[:, :1], zm, zm[:, -1:]], -1)
    out = np.zeros((B, n_imp), np.float32)
    for b in range(B):
        inds = np.searchsorted(cdf[b], u[b], side="right")
        lo = np.clip(inds - 1, 0, n)
        hi = np.clip(inds, 0, n)
        den = cdf[b][hi] - cdf[b][lo]
        den = np.where(den < eps, 1.0, den)
        t = np.clip(np.nan_to_num((u[b] - cdf[b][lo]) / den), 0, 1)
        out[b] = zm[b][lo] + t * (zm[b][hi] - zm[b][lo])
    return out


def test_reference_semantics_hierarchical_eval_allclose():
    """Full eval pipeline (coarse -> deterministic inverse-CDF -> fine) in
    reference mode vs an independent numpy transcription — the render_rays_eval
    counterpart (render.py:164-241) without the torch round-trip."""
    cfg = _reference_cfg()
    cfg = cfg.replace(render=dataclasses.replace(cfg.render, n_importance=4))
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rays_o, rays_d = _rays(B=4)

    out = model.render_rays(params, rays_o, rays_d, key=None, train=False)

    # numpy transcription
    p_c = jax.tree_util.tree_map(np.asarray, params["coarse"])
    p_f = jax.tree_util.tree_map(np.asarray, params["fine"])
    ro, rd = np.asarray(rays_o), np.asarray(rays_d)
    B, n = ro.shape[0], cfg.render.n_samples
    viewdirs = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    t = np.linspace(0, 1, n, dtype=np.float32)
    z = np.broadcast_to(cfg.render.near * (1 - t) + cfg.render.far * t, (B, n)).astype(np.float32)

    def run(p_mlp, zv):
        pts = ro[:, None, :] + zv[..., None] * rd[:, None, :]
        ep = _np_encode(pts, 6, 5.0, True, True)
        ed = _np_encode(np.broadcast_to(viewdirs[:, None, :], pts.shape), 3, 2.0, True, True)
        raw = _np_mlp(p_mlp, cfg.mlp, ep, ed)
        return _np_raw2outputs_reference(raw, zv, rd)

    _, w_c = run(p_c, z)
    z_imp = _np_sample_pdf_det(z, w_c, 4)
    z_all = np.sort(np.concatenate([z, z_imp], -1), -1)
    rgb_f, _ = run(p_f, z_all)

    np.testing.assert_allclose(np.asarray(out["rgb_fine"]), rgb_f, rtol=2e-4, atol=2e-5)
