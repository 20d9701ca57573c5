"""FlowNet2 precision drift at CHECKPOINT-LIKE flow magnitudes (VERDICT
round-3 item #8).

The 3.57 % blanket-bf16 / 3.2 % staged-mixed drift numbers (PERF.md) were
measured at random init, where intermediate flows average ~hundreds of px
— far outside the 5-40 px regime trained checkpoints operate in, and the
regime the BASELINE "EPE within 1 %" bar refers to.  Every stage's
``predict_flow*`` head is a linear conv (flownet2.py), so scaling those
kernels+biases calibrates all intermediate and final flows into the
trained band (same trick as models.raft_model.scale_flow_head; the
learned ``upsampled_flow*`` deconvs are linear in their flow input, so
they scale along automatically).

Decision rule (VERDICT): if staged or blanket bf16 drops under 1 % at the
calibrated operating point, the bench config can leave f32 (66 pairs/s)
for the faster policy; either way the verdict is recorded in PERF.md.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fn2_calibrated_drift.py
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
H, W = 384, 1280
B = 8
a = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
b = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

BAND = (5.0, 40.0)


def scale_predict_heads(variables, scale):
    """Scale every predict_flow* conv (kernel+bias) in the param tree."""

    def rec(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if k.startswith("predict_flow") and "kernel" in v:
                    out[k] = {
                        kk: vv * scale if kk in ("kernel", "bias") else vv
                        for kk, vv in v.items()
                    }
                else:
                    out[k] = rec(v)
            else:
                out[k] = v
        return out

    return {**variables, "params": rec(dict(variables["params"]))}


# NOTE: round 3's staged C+S1-bf16 build (scripts/fn2_mixed_stage.py) no
# longer constructs — the experiment measured staged barely better than
# blanket (3.2 vs 3.57 % at random init) and the knob was dropped; the
# decision here only needs the blanket-bf16 policy that the bench could
# actually ship (dtype=jnp.bfloat16).
m32 = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128))
m16 = fetch_model("FlowNet2", pretrained_path=None, init_size=(128, 128),
                  dtype=jnp.bfloat16)

j32 = jax.jit(m32.predict_fn)
j16 = jax.jit(m16.predict_fn)


def drift_row(label, jfn, v, f32):
    f = np.asarray(jfn(v, a[:2], b[:2]), np.float32)
    d = np.sqrt(((f32 - f) ** 2).sum(-1))
    mag = np.sqrt((f32 ** 2).sum(-1))
    row = {
        "policy": label,
        "epe_drift_mean": round(float(d.mean()), 5),
        "rel_drift_mean_pct": round(
            100 * float(d.mean() / max(mag.mean(), 1e-9)), 3),
        "flow_mag_mean": round(float(mag.mean()), 3),
    }
    print(json.dumps(row), flush=True)
    return row


# Unlike RAFT (random init -> ~150 px), FlowNet2's random-init flows are
# tiny (~1.3 px mean at 384x1280) — the calibration must scale UP into
# the 5-40 px band.  The head->output map is not exactly linear (scaled
# early-stage flows change the inter-stage warps), so solve iteratively:
# estimate the scale from the measured magnitude, then verify.
calibrated = None
f0 = np.asarray(j32(m32.variables, a[:2], b[:2]), np.float32)
mag0 = float(np.sqrt((f0 ** 2).sum(-1)).mean())
print(json.dumps({"scale": 1.0, "flow_mag_mean": round(mag0, 2)}),
      flush=True)
s = 15.0 / max(mag0, 1e-6)
for _ in range(4):
    v = scale_predict_heads(m32.variables, s)
    f32 = np.asarray(j32(v, a[:2], b[:2]), np.float32)
    mag = float(np.sqrt((f32 ** 2).sum(-1)).mean())
    print(json.dumps({"scale": round(s, 3), "flow_mag_mean": round(mag, 2)}),
          flush=True)
    if BAND[0] <= mag <= BAND[1]:
        calibrated = (round(s, 3), v, f32)
        break
    s *= 15.0 / max(mag, 1e-6)
if calibrated is None:
    print(json.dumps({"model": "FlowNet2 calibrated",
                      "calibration_failed": True,
                      "target_band_px": list(BAND)}), flush=True)
else:
    s, v, f32 = calibrated
    print(json.dumps({"calibrated_scale": s}), flush=True)
    drift_row(f"blanket bf16, heads x{s}", j16, v, f32)

    # throughput of the candidate policies (weights don't matter)
    for label, m, jfn in (("f32", m32, j32), ("bf16", m16, j16)):
        dt = timed_loop(lambda x, y, vv: jfn(vv, x, y),
                        (a, b, v), n=10)
        print(json.dumps({"policy": label,
                          "ms_per_batch8": round(dt * 1e3, 1),
                          "pairs_per_s": round(B / dt, 1)}), flush=True)
print("done", flush=True)
