"""Core TPU-native operators: sampling, warping, correlation, norms."""

from .correlation import (
    all_pairs_correlation,
    alt_corr_features,
    alt_corr_features_sorted,
    channel_norm,
    corr_lookup,
    corr_lookup_padded,
    corr_pyramid,
    spatial_correlation,
)
from .kernel_gate import no_pallas_kernels, pallas_disabled
from .interp import (
    apply_pad,
    avg_pool2,
    bilinear_sample,
    compute_pad,
    coords_grid,
    grid_sample,
    nearest_sample,
    remove_pad,
    resize_bilinear,
    unnormalize_coords,
    upsample_nearest,
    warp_backward,
)

__all__ = [
    "all_pairs_correlation",
    "alt_corr_features",
    "alt_corr_features_sorted",
    "apply_pad",
    "avg_pool2",
    "bilinear_sample",
    "channel_norm",
    "compute_pad",
    "coords_grid",
    "corr_lookup",
    "corr_lookup_padded",
    "corr_pyramid",
    "grid_sample",
    "nearest_sample",
    "no_pallas_kernels",
    "pallas_disabled",
    "remove_pad",
    "resize_bilinear",
    "spatial_correlation",
    "unnormalize_coords",
    "upsample_nearest",
    "warp_backward",
]
