"""Flow I/O, visualization and numpy-side metrics."""

from .flowlib import (
    UNKNOWN_FLOW_THRESH,
    compute_color,
    evaluate_flow,
    flow_error,
    flow_to_image,
    interp_gt_flow,
    make_color_wheel,
)
from .io import (
    read_disparity_png,
    read_flo,
    read_flow_png,
    read_gen,
    read_image,
    read_paths,
    read_pfm,
    write_flo,
    write_flow_png,
    write_paths,
    write_pfm,
)

__all__ = [
    "UNKNOWN_FLOW_THRESH",
    "compute_color",
    "evaluate_flow",
    "flow_error",
    "flow_to_image",
    "interp_gt_flow",
    "make_color_wheel",
    "read_disparity_png",
    "read_flo",
    "read_flow_png",
    "read_gen",
    "read_image",
    "read_paths",
    "read_pfm",
    "write_flo",
    "write_flow_png",
    "write_paths",
    "write_pfm",
]
