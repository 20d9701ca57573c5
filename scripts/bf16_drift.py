"""Zoo-wide f32-vs-bf16 flow drift (PERF.md table; BASELINE 'EPE within
1%' ties to the dtype policy actually benched).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_drift.py
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache

enable_compilation_cache()
rng = np.random.RandomState(0)
H, W = 384, 1280
a = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))

# (zoo id, f32 build kwargs, bf16 build kwargs)
CASES = [
    ("FlowNetS", {}, {"dtype": jnp.bfloat16}),
    ("FlowNetC", {}, {"dtype": jnp.bfloat16}),
    ("FlowNetCFlexLarger_k3_reps3", {}, {"dtype": jnp.bfloat16}),
    ("FlowNet2", {}, {"dtype": jnp.bfloat16}),
    # PWCNet: fetch_model's default IS the mixed-precision production
    # policy (registry.py), so the f32 baseline must disable it
    # explicitly — a {} baseline silently measures mixed-vs-mixed
    # (drift 0.0 exactly, caught in round 4)
    ("PWCNet", {"mixed_precision": False}, {}),
    ("SpyNet", {}, {"dtype": jnp.bfloat16}),
]

RAFT_CASES = [
    ("RAFT", {}),
    ("RAFT_FlowNetCEncoder_WoContext",
     {"flownetc_encoder": True, "no_separate_context": True}),
]

for name, kw32, kw16 in CASES:
    try:
        m32 = fetch_model(name, pretrained_path=None, init_size=(128, 128),
                          **kw32)
        m16 = fetch_model(name, pretrained_path=None, init_size=(128, 128),
                          **kw16)
        f32 = np.asarray(
            jax.jit(m32.predict_fn)(m32.variables, a, b), np.float32
        )
        f16 = np.asarray(
            jax.jit(m16.predict_fn)(m32.variables, a, b), np.float32
        )
        d = np.sqrt(((f32 - f16) ** 2).sum(-1))
        mag = np.sqrt((f32 ** 2).sum(-1))
        print(json.dumps({
            "model": name,
            "epe_drift_mean": round(float(d.mean()), 5),
            "epe_drift_max": round(float(d.max()), 4),
            "rel_drift_mean_pct": round(
                100 * float(d.mean() / max(mag.mean(), 1e-9)), 3),
            "flow_mag_mean": round(float(mag.mean()), 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"model": name, "error": repr(e)[:200]}),
              flush=True)
from understanding_flow_robustness_tpu.models.raft_model import RAFT

from understanding_flow_robustness_tpu.models.raft_model import (
    scale_flow_head,
)


def _raft_drift_case(label, m32, m16, v, a, b):
    def run(mod, vv, x, y):
        _, up = mod.apply(vv, x * 255.0, y * 255.0, test_mode=True)
        return up

    f32 = np.asarray(jax.jit(lambda vv, x, y: run(m32, vv, x, y))(v, a, b),
                     np.float32)
    f16 = np.asarray(jax.jit(lambda vv, x, y: run(m16, vv, x, y))(v, a, b),
                     np.float32)
    d = np.sqrt(((f32 - f16) ** 2).sum(-1))
    mag = np.sqrt((f32 ** 2).sum(-1))
    print(json.dumps({
        "model": label,
        "epe_drift_mean": round(float(d.mean()), 5),
        "epe_drift_max": round(float(d.max()), 4),
        "rel_drift_mean_pct": round(
            100 * float(d.mean() / max(mag.mean(), 1e-9)), 3),
        "flow_mag_mean": round(float(mag.mean()), 3),
    }), flush=True)
    return float(mag.mean())


for name, kw in RAFT_CASES:
    try:
        m32 = RAFT(mixed_precision=False, **kw)
        m16 = RAFT(mixed_precision=True, **kw)
        v = jax.jit(m32.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)),
                              jnp.zeros((1, 64, 64, 3)))
        _raft_drift_case(name + " (mixed_precision)", m32, m16, v, a, b)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"model": name, "error": repr(e)[:200]}),
              flush=True)

# --- RAFT mixed precision at CHECKPOINT-LIKE flow magnitudes ---
# The random-init rows above operate at ~150 px mean flow, ~5-30x wilder
# than trained checkpoints (5-40 px on KITTI/Sintel).  FlowHead.conv2 is
# linear, so scaling it (models.raft_model.scale_flow_head) calibrates the
# recurrent iterates into that range — the drift number that corresponds
# to the BASELINE "EPE within 1%" bar for deployed checkpoints (VERDICT
# round-2 weak #2: the scaling claim was plausible but unmeasured).
try:
    m32 = RAFT(mixed_precision=False)
    m16 = RAFT(mixed_precision=True)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 64, 64, 3)))
    mag = float("nan")
    for s in (0.1, 0.05, 0.02):
        vs = scale_flow_head(v, s)
        mag = _raft_drift_case(
            f"RAFT (mixed, flow_head x{s})", m32, m16, vs, a, b)
        if 5.0 <= mag <= 40.0:
            break
    else:
        # explicit failure marker: without it the last row is
        # indistinguishable from a successful calibration and PERF.md
        # could quote an out-of-band operating point (ADVICE r3)
        print(json.dumps({"model": "RAFT calibrated",
                          "calibration_failed": True,
                          "flow_mag_mean": round(mag, 3),
                          "target_band_px": [5.0, 40.0]}), flush=True)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"model": "RAFT calibrated", "error": repr(e)[:200]}),
          flush=True)
print("done", flush=True)
