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
