"""Spatial (height) sharding on a 2-D ``data x spatial`` mesh.

The reference has no analog of this (its only parallelism is
``torch.nn.DataParallel`` over the batch, SURVEY §2.9); this module is the
TPU-native scaling headroom the SURVEY identifies for the "long context"
axis of flow models — image RESOLUTION (§5): the cost drivers grow with
H·W (and the all-pairs correlation with (H/8·W/8)²), so past a point a
frame pair no longer fits one chip.

Design (XLA SPMD, not manual halos): build a ``Mesh`` with axes
``("data", "spatial")``, annotate NHWC image inputs/outputs with
``PartitionSpec("data", "spatial")`` (batch over data, HEIGHT over
spatial), replicate parameters, and jit.  XLA's SPMD partitioner inserts
the conv halo exchanges (``collective_permute`` of boundary rows over
ICI) and any gather/rebalance the non-conv ops need — the same compiler
machinery the scaling playbook prescribes, with zero per-model code.
Convolutional models (the FlowNet/SPyNet/PWC families) partition cleanly
because every op is local-in-H modulo a small halo.  RAFT partitions too:
the trace-time kernel gate swaps its fused on-demand Pallas lookup (which
cannot be auto-partitioned) for the pure-XLA volume path — all-pairs
einsum + selector-matmul lookup, which SPMD shards over query rows — at
the volume path's cost; RAFT's production single-chip/data-parallel mode
is unaffected.

``spatial_predict`` is exact: SPMD partitioning is semantics-preserving,
so outputs match the single-device program bit-for-bit modulo float
reassociation (tested in tests/test_spatial_shard.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"


def make_2d_mesh(n_data: int, n_spatial: int,
                 devices: Optional[list] = None) -> Mesh:
    """A ``(data, spatial)`` mesh over the first ``n_data * n_spatial``
    devices.  The spatial axis should map to the faster (ICI-adjacent)
    dimension on a real slice; on a virtual CPU mesh the order is moot."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_spatial
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC: batch over ``data``, height over ``spatial``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def check_spatial_shapes(mesh: Mesh, img: "jax.Array", stride: int = 64):
    """Fail fast (at trace time, with the actual rule named) when image
    height cannot shard evenly over the mesh's spatial axis — otherwise
    the violation surfaces as an opaque pjit divisibility error, or as a
    stride-violating layout for H not divisible by n_spatial*stride."""
    n_sp = mesh.shape[SPATIAL_AXIS]
    h = img.shape[1]
    if h % (n_sp * stride):
        raise ValueError(
            f"image height {h} must be divisible by the spatial axis size "
            f"({n_sp}) times the model stride ({stride}) for even height "
            f"sharding; reshape/pad the input or shrink the spatial axis"
        )


def spatial_predict(predict_fn, mesh: Mesh):
    """Spatially-sharded inference for conv flow models.

    ``predict_fn(variables, img1, img2) -> flow`` (FlowModel.predict_fn's
    contract).  Parameters are replicated; images and the output flow are
    sharded ``(batch -> data, H -> spatial)``.  XLA SPMD emits the conv
    halo exchanges.  H must be divisible by the spatial axis size times
    the model's total stride for even sharding — KITTI's 384 over 2 or 4
    shards satisfies every zoo model (stride 64).
    """
    from ..ops.kernel_gate import no_pallas_kernels
    from .mesh import replicated

    def body(variables, img1, img2):
        check_spatial_shapes(mesh, img1)
        # Trace-time gate: a pallas_call has no SPMD partitioning rule, so
        # the spatial program must select the exact pure-XLA formulations
        # of the warp/correlation fast paths (ops/kernel_gate.py).
        with no_pallas_kernels():
            return predict_fn(variables, img1, img2)

    rep = replicated(mesh)
    img = image_sharding(mesh)
    return jax.jit(body, in_shardings=(rep, img, img), out_shardings=img)
