"""Spatial (height) sharding on a 2-D data x spatial mesh.

parallel/spatial.py: XLA SPMD partitions the conv zoo along image height
with automatic halo exchange — the resolution-scaling axis the reference
cannot shard at all (SURVEY §5 "long context").  Conftest forces an
8-device CPU backend, so the mesh is 2 data x 4 spatial shards.
"""

import numpy as np
import pytest

import jax

from understanding_flow_robustness_tpu.models.registry import fetch_model
from understanding_flow_robustness_tpu.parallel import (
    image_sharding,
    make_2d_mesh,
    spatial_predict,
)


def _run(name, atol, rel=None):
    model = fetch_model(name, pretrained_path=None)
    rng = np.random.RandomState(0)
    img1 = rng.rand(2, 256, 128, 3).astype(np.float32)
    img2 = rng.rand(2, 256, 128, 3).astype(np.float32)
    ref = np.asarray(model.predict(img1, img2))

    mesh = make_2d_mesh(2, 4)
    fn = spatial_predict(model.predict_fn, mesh)
    with mesh:
        out = fn(model.variables, img1, img2)
        # the output really is laid out over the 2-D mesh
        assert out.sharding.is_equivalent_to(image_sharding(mesh), out.ndim)
        out = np.asarray(out)

    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    if rel is not None:
        assert err / (np.abs(ref).max() + 1e-9) < rel, err
    else:
        assert err < atol, err


def test_spatial_flownets():
    _run("FlowNetS", atol=1e-4)


def test_spatial_flownetc():
    """Banded-MXU correlation (einsum) partitions too — the vertical
    shifts become halo exchanges."""
    _run("FlowNetC", atol=1e-4)


def test_spatial_spynet():
    _run("SpyNet", atol=1e-3)


def test_spatial_pwcnet():
    """Coarse-to-fine warp chains amplify reassociation noise through
    leaky-relu gate flips (same mechanism as the documented bf16 drift),
    so PWC gets a relative bound rather than an absolute one."""
    _run("PWCNet", atol=None, rel=0.02)


def test_mesh_shape_validation():
    with pytest.raises(ValueError):
        make_2d_mesh(4, 4, devices=jax.devices())
