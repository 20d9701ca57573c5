"""Reduced-precision flow drift guards (BASELINE "EPE within 1%").

The zoo-wide f32-vs-bf16 drift table in PERF.md is measured on the real
chip at 384x1280 by scripts/bf16_drift.py; these tests pin the same
comparison at a small geometry so a dtype-policy regression (e.g. an
accumulation accidentally cast to bf16, or a model silently switching its
production dtype) fails the suite on any backend.

Thresholds are set from the measured table with ~2x margin: models whose
production config is reduced precision must stay well under the 1% BASELINE
bar; FlowNet2 is pinned to f32 production precisely because its cascade
amplifies bf16 drift past the bar (measured 3.6% at full geometry), so it
has no bf16 guard here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from understanding_flow_robustness_tpu.models import fetch_model

H, W = 128, 256


def _drift(zoo_id, kw16, kw32=None):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    m32 = fetch_model(zoo_id, pretrained_path=None, init_size=(64, 64),
                      **(kw32 or {}))
    m16 = fetch_model(zoo_id, pretrained_path=None, init_size=(64, 64),
                      **kw16)
    f32 = np.asarray(jax.jit(m32.predict_fn)(m32.variables, a, b),
                     np.float32)
    f16 = np.asarray(jax.jit(m16.predict_fn)(m32.variables, a, b),
                     np.float32)
    d = np.sqrt(((f32 - f16) ** 2).sum(-1))
    mag = np.sqrt((f32 ** 2).sum(-1))
    return 100.0 * float(d.mean() / max(mag.mean(), 1e-9))


@pytest.mark.parametrize("zoo_id,limit_pct", [
    ("FlowNetS", 1.0),
    ("FlowNetC", 1.0),
    ("SpyNet", 1.5),
])
def test_bf16_drift_within_bar(zoo_id, limit_pct):
    assert _drift(zoo_id, {"dtype": jnp.bfloat16}) < limit_pct


def test_pwcnet_mixed_precision_drift():
    """PWC-Net's production (registry) config is mixed precision — bf16
    compute / f32 params with f32 flow heads (measured 0.87% rel drift at
    full geometry, random weights); guard with ~2x margin."""
    assert _drift(
        "PWCNet", {"mixed_precision": True}, {"mixed_precision": False}
    ) < 1.75


def test_raft_mixed_precision_drift():
    """RAFT's production bench config is mixed precision (bf16 compute /
    f32 params); random weights push flow magnitudes ~30x past real
    checkpoints, so the guard bound is looser than the measured-at-realistic
    -magnitude expectation (PERF.md drift table caveat)."""
    from understanding_flow_robustness_tpu.models.raft_model import RAFT

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    m32 = RAFT(mixed_precision=False)
    m16 = RAFT(mixed_precision=True)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 64, 64, 3)))

    def run(mod, vv):
        _, up = mod.apply(vv, a * 255.0, b * 255.0, test_mode=True)
        return np.asarray(up, np.float32)

    f32, f16 = run(m32, v), run(m16, v)
    d = np.sqrt(((f32 - f16) ** 2).sum(-1))
    mag = np.sqrt((f32 ** 2).sum(-1))
    assert 100.0 * float(d.mean() / max(mag.mean(), 1e-9)) < 5.0


def test_raft_mixed_precision_drift_checkpoint_magnitude():
    """The drift number that justifies shipping RAFT mixed precision: at
    CHECKPOINT-LIKE iterate magnitudes (FlowHead scaled so mean |flow|
    lands in the 5-40 px range trained checkpoints produce — see
    models.raft_model.scale_flow_head), mixed-vs-f32 drift must clear the
    1% BASELINE bar.  The full-geometry measurement lives in PERF.md
    (scripts/bf16_drift.py on-chip); this pins the policy cross-backend
    at small geometry."""
    from understanding_flow_robustness_tpu.models.raft_model import (
        RAFT,
        scale_flow_head,
    )

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    m32 = RAFT(mixed_precision=False)
    m16 = RAFT(mixed_precision=True)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 64, 64, 3)))
    v = scale_flow_head(v, 0.05)

    def run(mod, vv):
        _, up = mod.apply(vv, a * 255.0, b * 255.0, test_mode=True)
        return np.asarray(up, np.float32)

    f32, f16 = run(m32, v), run(m16, v)
    d = np.sqrt(((f32 - f16) ** 2).sum(-1))
    mag = np.sqrt((f32 ** 2).sum(-1))
    # calibration sanity: iterates actually live at checkpoint magnitudes
    assert 1.0 < float(mag.mean()) < 60.0
    assert 100.0 * float(d.mean() / max(mag.mean(), 1e-9)) < 1.0


def test_bf16_drift_smoke_small():
    """Fast-lane smoke for this module (every heavyweight drift test here
    is marked slow): FlowNetS f32-vs-bf16 at a tiny geometry must stay
    finite and within a loose drift bound."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from understanding_flow_robustness_tpu.models import fetch_model

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    m32 = fetch_model("FlowNetS", pretrained_path=None, init_size=(64, 128))
    m16 = fetch_model("FlowNetS", pretrained_path=None, init_size=(64, 128),
                      dtype=jnp.bfloat16)
    f32 = np.asarray(jax.jit(m32.predict_fn)(m32.variables, a, b),
                     np.float32)
    f16 = np.asarray(jax.jit(m16.predict_fn)(m32.variables, a, b),
                     np.float32)
    assert np.isfinite(f16).all()
    d = np.sqrt(((f32 - f16) ** 2).sum(-1)).mean()
    mag = np.sqrt((f32 ** 2).sum(-1)).mean()
    assert d / max(mag, 1e-9) < 0.05, (d, mag)
