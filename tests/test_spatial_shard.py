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


def test_spatial_raft():
    """RAFT spatial-shards via the gated pure-XLA volume path (all-pairs
    einsum + selector lookup).  Random-init RAFT amplifies reassociation
    noise through its recurrent iterations (same mechanism as the
    documented bf16 drift at random weights), so the bound is relative."""
    model = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                        iters=3)
    rng = np.random.RandomState(0)
    img1 = rng.rand(2, 256, 128, 3).astype(np.float32)
    img2 = rng.rand(2, 256, 128, 3).astype(np.float32)
    ref = np.asarray(model.predict(img1, img2))

    mesh = make_2d_mesh(2, 4)
    fn = spatial_predict(model.predict_fn, mesh)
    with mesh:
        out = np.asarray(fn(model.variables, img1, img2))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, rel


def test_mesh_shape_validation():
    with pytest.raises(ValueError):
        make_2d_mesh(4, 4, devices=jax.devices())


def test_spatial_height_validation():
    """Uneven height sharding fails fast with the rule named, not with
    pjit's opaque divisibility error."""
    model = fetch_model("FlowNetS", pretrained_path=None)
    mesh = make_2d_mesh(2, 4)
    fn = spatial_predict(model.predict_fn, mesh)
    img = np.zeros((2, 192, 128, 3), np.float32)  # 192 % (4*64) != 0
    with mesh, pytest.raises(ValueError, match="spatial axis"):
        fn(model.variables, img, img)


def test_spatial_attack_ifgm():
    """make_spatial_attack: the white-box attack sharded over both batch
    and image height.  ifgm's L2-normalized updates are smooth in the
    gradient (unlike sign-based ifgsm), so the sharded adversarial images
    track the single-device ones closely; the epsilon-ball and image-range
    invariants must hold exactly."""
    import jax.numpy as jnp

    from understanding_flow_robustness_tpu.attacks import (
        PerturbConfig,
        make_spatial_attack,
        perturb,
    )

    model = fetch_model("FlowNetS", pretrained_path=None)
    cfg = PerturbConfig(perturb_method="ifgm", flow_loss="l2",
                        output_norm=0.02, n_step=2)
    rng = np.random.RandomState(1)
    img0 = jnp.asarray(rng.rand(2, 256, 128, 3).astype(np.float32))
    img1 = jnp.asarray(rng.rand(2, 256, 128, 3).astype(np.float32))
    gt = jnp.asarray(
        np.concatenate(
            [rng.randn(2, 256, 128, 2), np.ones((2, 256, 128, 1))], axis=-1
        ).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)

    predict = lambda a, b: model.predict_fn(model.variables, a, b)  # noqa: E731
    _, _, ref0, ref1 = perturb(predict, img0, img1, gt, cfg, key)

    mesh = make_2d_mesh(2, 4)
    attack = make_spatial_attack(model.predict_fn, cfg, mesh)
    with mesh:
        n0, n1, adv0, adv1 = attack(model.variables, img0, img1, gt, key)
        adv0, adv1 = np.asarray(adv0), np.asarray(adv1)
        n0 = np.asarray(n0)

    assert adv0.min() >= 0.0 and adv0.max() <= 1.0
    assert np.abs(n0).max() <= cfg.output_norm + 1e-6
    # reassociation noise only: the sharded attack lands within a tiny
    # fraction of the step budget of the single-device trajectory
    assert np.abs(adv0 - np.asarray(ref0)).mean() < 1e-4
    assert np.abs(adv1 - np.asarray(ref1)).mean() < 1e-4
