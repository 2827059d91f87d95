from nerf_meets_mlx_tpu.kernels.fused_mlp import (
    FusedMLPSpec,
    pack_inputs,
    pack_params,
    fused_apply,
    fused_apply_reference,
)

__all__ = [
    "FusedMLPSpec",
    "pack_inputs",
    "pack_params",
    "fused_apply",
    "fused_apply_reference",
]
