"""Native ops layer: the TPU-kernel equivalents of lagomorph's CUDA surface
(SURVEY.md section 2.12)."""

from cardiax.ops.fluid_metric import FluidMetric, flat, sharp
from cardiax.ops.shooting import (
    ad_star,
    deform_image,
    expmap_shooting,
    expmap_svf,
)
from cardiax.ops.strain import (
    circumferential_strain,
    sector_matrix,
    strain_matrix_from_displacements,
)
from cardiax.ops.svd_smooth import subspace_denoise, svd_denoise
from cardiax.ops.warp import bilinear_warp, compose_displacements, warp_vector_field

__all__ = [
    "FluidMetric", "flat", "sharp",
    "ad_star", "deform_image", "expmap_shooting", "expmap_svf",
    "circumferential_strain", "sector_matrix", "strain_matrix_from_displacements",
    "subspace_denoise", "svd_denoise",
    "bilinear_warp", "compose_displacements", "warp_vector_field",
]
