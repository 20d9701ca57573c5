"""Smoke tests for the model factory (the reference's utils_model.__main__
loop over all model IDs, models/utils_model.py:684-699)."""

import numpy as np
import pytest

import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import (
    fetch_model,
    get_flownet_choices,
)

RNG = np.random.RandomState(3)

# Representative subset for the full-forward smoke (all 12 IDs init in
# test_all_ids_init; forwards of the heavier duplicates are covered by
# the parity tests).
FORWARD_IDS = ["FlowNetS", "FlowNetC", "SpyNet", "PWCNet"]


def test_all_ids_init():
    for name in get_flownet_choices():
        model = fetch_model(name, pretrained_path=None)
        assert model.variables["params"]


@pytest.mark.parametrize("name", FORWARD_IDS)
def test_predict_flow_uniform_api(name):
    model = fetch_model(name, pretrained_path=None)
    m = model.size_multiple
    h = max(2 * m, 64)
    w = max(2 * m, 128)
    x1 = jnp.asarray(RNG.rand(1, h, w, 3).astype(np.float32))
    x2 = jnp.asarray(RNG.rand(1, h, w, 3).astype(np.float32))
    flow = model.predict(x1, x2)
    assert flow.shape[0] == 1 and flow.shape[-1] == 2
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_predict_full_res():
    model = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128))
    x1 = jnp.asarray(RNG.rand(1, 128, 128, 3).astype(np.float32))
    x2 = jnp.asarray(RNG.rand(1, 128, 128, 3).astype(np.float32))
    flow = model.predict(x1, x2)
    assert flow.shape == (1, 128, 128, 2)
    assert np.isfinite(np.asarray(flow)).all()

def test_predict_program_keeps_variables_as_arguments():
    """Guard against jit-closing over model.variables: parameters must be
    traced arguments, not inline HLO literals.  (FlowNet2's 162M params
    once produced 650 MB of inline constants and overflowed the remote
    TPU compiler's request limit — PERF.md 'Program size'.)"""
    import jax

    from understanding_flow_robustness_tpu.models import fetch_model

    m = fetch_model("FlowNetC", pretrained_path=None, init_size=(64, 64))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    lowered = jax.jit(m.predict_fn).lower(m.variables, img, img)
    text_mb = len(lowered.as_text()) / 1e6
    # 39M f32 params would be ~300 MB of hex literals if inlined
    assert text_mb < 10, f"predict program is {text_mb:.1f} MB of HLO"


def test_raft_batch_pad_encoders_value_identity():
    """The small-batch encoder tiling knob (raft_model.py::batched — pads
    batch < 8 to dodge XLA's slow small-batch conv strategy, measured 3x
    on v5e) must be value-identical to the plain path: instance/batch
    norms are per-sample, so tiling + slicing changes nothing."""
    import jax.numpy as jnp

    from understanding_flow_robustness_tpu.models import fetch_model

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    plain = fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                        iters=2, return_features=True)
    padded = fetch_model("RAFT", pretrained_path=None, init_size=(64, 64),
                         iters=2, batch_pad_encoders=True,
                         return_features=True)
    # compare the ENCODER outputs (the tiled computation): the end-to-end
    # flow of a random-weight RAFT chaotically amplifies the ~1e-6 conv
    # reassociation difference XLA's different batch tilings introduce
    _, _, fa = plain.module.apply(plain.variables, x1 * 255.0, x2 * 255.0,
                                  test_mode=True)
    _, _, fb = padded.module.apply(plain.variables, x1 * 255.0, x2 * 255.0,
                                   test_mode=True)
    for k in ("fmap1", "fmap2", "net", "inp"):
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=2e-5)


def test_adv_raft_mixed_precision_override():
    """Every spec accepts caller kwargs over its defaults — including the
    adversarial RAFT's pinned mixed_precision=False."""
    from understanding_flow_robustness_tpu.models import fetch_model

    m = fetch_model("RAFT_adv_kitti2012_ifgsm_l2_002", pretrained_path=None,
                    init_size=(64, 64), iters=1, mixed_precision=True)
    assert m.module.mixed_precision is True
