"""Fused train kernel (kernels/fused_train.py): one launch per level doing
forward → compositing → MSE cotangent → backward, with v3's ray-major
dense IO (rays/z/deltas in, rgb_map/weights out; points built in-kernel).

Off-TPU the pallas_call runs in interpreter mode, so the actual kernel logic
executes. Three layers of checks:

1. kernel vs its differentiable jnp twin (values AND parameter grads),
   across compositing modes / density activations / white_bkgd / noise /
   ray counts that don't divide the block, and with group > 1;
2. twin vs the standard rendering pipeline (raw2outputs semantics);
3. a full train step with fused_train on vs off: identical losses and
   updated parameters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.config import lego_hierarchical
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
from nerf_meets_mlx_tpu.kernels.fused_mlp import FusedMLPSpec, pack_params
from nerf_meets_mlx_tpu.kernels.fused_train import (
    TrainSpec,
    _reference_from_x,
    fused_train_apply,
    fused_train_reference,
    pack_inputs_train,
)
from nerf_meets_mlx_tpu.models import create_nerf
from nerf_meets_mlx_tpu.rendering.volume import raw2outputs


def _setup(R=10, S=16, noise=0.0, seed=0):
    """Ray-based inputs for the v3 API: (rays_o, rays_d, viewdirs, z,
    deltas, noise, target)."""
    cfg = lego_hierarchical()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    spec = FusedMLPSpec.from_configs(
        cfg.mlp, cfg.pos_encoding, cfg.dir_encoding, compute_dx=False
    )
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    rays_d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.sort(
        jnp.asarray(rng.uniform(0.5, 4.0, size=(R, S)), jnp.float32), axis=-1
    )
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, size=(R, S)), jnp.float32)
    nz = jnp.asarray(rng.normal(size=(R, S)) * noise, jnp.float32)
    target = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    return cfg, model, params, spec, (rays_o, rays_d, viewdirs, z, deltas, nz, target)


def _compare_kernel_twin(spec, params, tspec, args, R):
    def loss_k(p):
        sse, rgb, wts = fused_train_apply(spec, tspec, pack_params(spec, p), *args)
        return sse / (R * 3), (rgb, wts)

    def loss_t(p):
        sse, rgb, wts = fused_train_reference(
            spec, dataclasses.replace(tspec, group=1),
            pack_params(spec, p), *args
        )
        return sse / (R * 3), (rgb, wts)

    (lk, (rgbk, wtsk)), gk = jax.value_and_grad(loss_k, has_aux=True)(
        params["coarse"]
    )
    (lt, (rgbt, wtst)), gt = jax.value_and_grad(loss_t, has_aux=True)(
        params["coarse"]
    )
    np.testing.assert_allclose(lk, lt, rtol=1e-5)
    np.testing.assert_allclose(rgbk, rgbt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(wtsk, wtst, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gt)):
        # atol 5e-6: per-sub-block dW accumulation orders the float adds
        # differently from the twin's whole-batch GEMM
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize(
    "mode,act,white",
    [
        ("canonical", "softplus", True),
        ("canonical", "relu", False),
        ("reference", "softplus", False),
        ("reference", "softplus", True),
    ],
)
def test_kernel_matches_twin_values_and_grads(mode, act, white):
    R, S = 10, 16  # R=10 with rays_block=8: exercises the padded-ray mask
    cfg, model, params, spec, args = _setup(R=R, S=S, noise=0.01)
    tspec = TrainSpec(
        n_samples=S, rays_block=8, n_rays=R, mode=mode,
        density_activation=act, white_bkgd=white,
    )
    _compare_kernel_twin(spec, params, tspec, args, R)


@pytest.mark.parametrize("group,rays_block,R", [(2, 8, 10), (3, 8, 25)])
def test_kernel_grouped_matches_twin(group, rays_block, R):
    """group > 1 (G sub-blocks per grid step via in-body fori_loop) must be
    semantics-invariant: values and grads identical to the twin, including
    padded-ray masking when R doesn't divide rays_block*group and the
    traced-first dW/sse accumulation."""
    S = 16
    cfg, model, params, spec, args = _setup(R=R, S=S, noise=0.01)
    tspec = TrainSpec(
        n_samples=S, rays_block=rays_block, n_rays=R, mode="canonical",
        density_activation="softplus", white_bkgd=True, group=group,
    )
    _compare_kernel_twin(spec, params, tspec, args, R)


@pytest.mark.parametrize("mode", ["canonical", "reference"])
def test_twin_matches_raw2outputs(mode):
    """The twin's compositing == rendering/volume.py's raw2outputs."""
    R, S = 6, 12
    cfg, model, params, spec, args = _setup(R=R, S=S)
    rays_o, rays_d, viewdirs, z, deltas, nz, target = args
    # align the terminal bin with raw2outputs' 1e10 delta (render.py:46-59)
    deltas = deltas.at[:, -1].set(1e10)
    tspec = TrainSpec(
        n_samples=S, rays_block=8, n_rays=R, mode=mode,
        density_activation="softplus", white_bkgd=True,
    )
    packed = pack_params(spec, params["coarse"])
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    x = pack_inputs_train(pts, viewdirs, deltas, nz)
    sse, rgb, wts = _reference_from_x(spec, tspec, packed, x, target)
    # and the ray-based twin entrypoint agrees with the x-based body
    sse2, rgb2, wts2 = fused_train_reference(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z, deltas, nz, target
    )
    np.testing.assert_allclose(rgb2, rgb, rtol=1e-6)
    np.testing.assert_allclose(wts2, wts, rtol=1e-6)

    # reconstruct the standard path from the same raw outputs: the twin's
    # delta already includes ||rays_d||, so feed unit rays_d and z = cumsum
    from nerf_meets_mlx_tpu.kernels.fused_mlp import fused_apply_reference

    raw = fused_apply_reference(spec, packed, x)[:, :4].reshape(R, S, 4)
    raw = raw.at[..., 3].add(x[:, 7].reshape(R, S))  # noise column
    zc = jnp.cumsum(jnp.concatenate([jnp.zeros((R, 1)), deltas[:, :-1]], 1), 1)
    out = raw2outputs(
        raw, zc, jnp.tile(jnp.array([[1.0, 0, 0]]), (R, 1)), mode=mode,
        white_bkgd=True, density_activation="softplus",
    )
    np.testing.assert_allclose(wts, out["weights"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rgb, out["rgb_map"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        sse, jnp.sum((out["rgb_map"] - target) ** 2), rtol=1e-5
    )


def test_train_step_fused_vs_standard():
    """End-to-end: one optimizer step, fused-train path vs value_and_grad
    through render_rays — same losses, same updated parameters."""
    H = W = 32
    focal = 30.0
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)

    def one_step(use_ft):
        cfg = lego_hierarchical()
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, n_rand=37, precrop_iters=0),
            render=dataclasses.replace(cfg.render, n_samples=16, n_importance=16),
            use_fused_kernel=True,
            use_fused_train=use_ft,
        )
        model = create_nerf(cfg)
        assert model.supports_fused_train == use_ft
        state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
        step = make_nerf_train_step(model, H, W, focal)
        state, aux = step(state, images, poses, jax.random.PRNGKey(7))
        return state, {k: float(v) for k, v in aux.items()}

    s1, a1 = one_step(True)
    s0, a0 = one_step(False)
    for k in a0:
        np.testing.assert_allclose(a1[k], a0[k], rtol=5e-4, atol=1e-6)
    for x, y in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s0.params)
    ):
        # Adam divides by sqrt(v): float-level grad differences on
        # near-zero moments show up scaled — tolerate 1e-4 absolute
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=1e-4)


def test_fused_train_gate():
    """supports_fused_train routes sinusoidal presets to the big kernel,
    hash presets to the feats kernel, and honors the flags."""
    cfg = lego_hierarchical().replace(use_fused_kernel=True, use_fused_train=True)
    model = create_nerf(cfg)
    assert model.supports_fused_train and model._fused_train_mode == "sinusoidal"
    assert not create_nerf(cfg.replace(use_fused_train=False)).supports_fused_train
    assert not create_nerf(cfg.replace(use_fused_kernel=False)).supports_fused_train
    from nerf_meets_mlx_tpu.config import lego_ingp

    # VMEM-resident hash+SH presets route to the fully-fused ingp kernel
    # (r5, kernels/fused_ingp_train.py); big-table hash and CP configs to
    # the feat-train kernel — covered in test_fused_ingp_train.py
    assert (
        create_nerf(lego_ingp().replace(use_fused_kernel=True))._fused_train_mode
        == "ingp"
    )


def test_default_blocks_alignment_and_bounds():
    """v3 invariants: rays_block is always a multiple of 8, group >= 1,
    and the sample bound routes big-S configs to the unfused path."""
    import pytest as _pytest

    from nerf_meets_mlx_tpu.kernels.fused_train import (
        default_group,
        default_rays_block,
        max_fused_samples,
    )

    for s in (8, 16, 32, 48, 64, 96, 128, 192, 256):
        rb = default_rays_block(s)
        assert rb % 8 == 0 and rb >= 8
        assert default_group(s, rb) >= 1
    assert default_rays_block(192) == 8   # fine level floors at 8
    assert default_rays_block(64) == 32   # coarse level: 2048-pt sub-blocks
    with _pytest.raises(ValueError):
        default_rays_block(max_fused_samples() + 1)


def test_ingp_mode_routing_real_preset():
    """The real lego_ingp preset (T=2^14, L=8, F=2) routes to the
    fully-fused 'ingp' mode; the big-table variant falls back to 'feats'."""
    import dataclasses as _dc

    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_ingp().replace(use_fused_kernel=True, use_fused_train=True)
    assert create_nerf(cfg)._fused_train_mode == "ingp"
    big = cfg.replace(
        pos_encoding=_dc.replace(cfg.pos_encoding, hash_log2_table_size=19)
    )
    assert create_nerf(big)._fused_train_mode == "feats"


@pytest.mark.parametrize("n_importance", [0, 16])
def test_eval_fused_matches_standard_path(n_importance):
    """render_rays(train=False) through the dense eval kernel
    (_eval_kernel, forward+composite one launch per level) matches the
    standard query+raw2outputs eval path on every map, including the
    deterministic importance stage riding the kernel's weights."""
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        render=dataclasses.replace(
            cfg.render, n_samples=16, n_importance=n_importance
        ),
        use_fused_kernel=True,
        use_fused_train=True,
    )
    model = create_nerf(cfg)
    assert model._fused_train_mode == "sinusoidal"
    params = model.init(jax.random.PRNGKey(0))
    B = 37  # not a block multiple: exercises the pad/slice
    ro = jax.random.normal(jax.random.PRNGKey(2), (B, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(3), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True) * 1.3

    out_fused = model.render_rays(params, ro, rd, train=False)
    std = create_nerf(cfg.replace(use_fused_kernel=False, use_fused_train=False))
    out_std = std.render_rays(params, ro, rd, train=False)

    assert set(out_fused) == set(out_std)
    for k in out_std:
        np.testing.assert_allclose(
            out_fused[k], out_std[k], rtol=2e-4, atol=2e-5, err_msg=k
        )


def test_eval_fused_is_grad_safe():
    """The eval op is stop-gradient by construction: differentiating a
    scalar of its outputs w.r.t. params yields structural zeros, not a
    missing-VJP error from inside Pallas."""
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        render=dataclasses.replace(cfg.render, n_samples=16, n_importance=0),
        use_fused_kernel=True,
        use_fused_train=True,
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))

    def f(p):
        return jnp.sum(model.render_rays(p, ro, rd, train=False)["rgb_map"])

    grads = jax.grad(f)(params)
    assert all(
        float(jnp.max(jnp.abs(g))) == 0.0
        for g in jax.tree_util.tree_leaves(grads)
    )
