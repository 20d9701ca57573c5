"""Benchmark: the three BASELINE.md headline metrics on one TPU chip.

Timing uses the loop-differencing on-device harness
(understanding_flow_robustness_tpu.utils.benchmark) — the tunneled backend
is async and dedupes identical calls, so naive host loops are meaningless.

Prints ONE JSON line: the headline RAFT metric (schema the driver parses)
plus an ``extra_metrics`` list carrying the other two BASELINE metrics.

Baselines (PyTorch-GPU denominators) — the reference repo publishes no
end-to-end numbers (BASELINE.md §published), so each denominator is derived
from the closest published measurement and documented in
BASELINE.md §"GPU baseline derivations":

* RAFT-12 @ 384x1280: 10.0 pairs/s — the RAFT paper (Teed & Deng, ECCV
  2020) reports ~10 FPS on a GTX 1080Ti at 1088x436 with the same
  12-iteration refinement the reference evaluates with
  (models/utils_model.py:62); KITTI eval geometry has ~1.04x the pixels.
* FlowNetC @ 384x1280 (KITTI-2012 eval geometry): 28.0 pairs/s — the
  FlowNet2 paper (Ilg et al., CVPR 2017) reports ~32 ms/frame for FlowNetC
  on a GTX 1080 at Sintel 1024x436; scaled by the 1.10x pixel ratio.
  Cross-check: the vendored correlation op alone measures 6.5 ms/frame on
  a GTX 980 at the (smaller) 48x64 grid (BASELINE.md, correlation README).
* Patch-attack inner step (fwd+bwd vs FlowNetC, batch 1): 9.0 iters/s —
  derived as forward-throughput / 3 (backward ~2x forward FLOPs), the
  reference loop additionally pays per-step host round-trips
  (patch_attacks/main.py:546-611) that this estimate ignores in the
  GPU's favor.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

# Display metadata for the headline table PERF.md embeds (see
# render_markdown): metric key -> (display name, baseline source note).
TABLE_ROWS = [
    ("raft_kitti_384x1280_frame_pairs_per_sec_per_chip",
     "RAFT-12 @ 384×1280", "10 pairs/s (1080Ti, RAFT paper)"),
    ("raft_wildflow_384x1280_frame_pairs_per_sec_per_chip",
     "RAFT-12 @ 384×1280 (wild-flow worst case)",
     "10 pairs/s (1080Ti, RAFT paper)"),
    ("flownetc_kitti2012_384x1280_frame_pairs_per_sec_per_chip",
     "FlowNetC @ 384×1280", "28 pairs/s (GTX 1080, FlowNet2 paper)"),
    ("patch_attack_flownetc_384x1280_iters_per_sec_per_chip",
     "Patch-attack inner step (FlowNetC, batch 1)", "~9 iters/s (derived)"),
    ("flownet2_384x1280_frame_pairs_per_sec_per_chip",
     "FlowNet2 @ 384×1280 (f32)", "8 pairs/s (GTX 1080, FlowNet2 paper)"),
    ("spynet_384x1280_frame_pairs_per_sec_per_chip",
     "SPyNet @ 384×1280", "14 pairs/s (Titan X, SPyNet paper)"),
    ("pwcnet_384x1280_frame_pairs_per_sec_per_chip",
     "PWC-Net @ 384×1280 (mixed)", "32 pairs/s (Titan X, PWC-Net paper)"),
    ("raft_train_step_288x960_frames_per_sec_per_chip",
     "RAFT train step (batch 4 @ 288×960)", "6 frames/s (derived)"),
]


def flatten_metrics(result: dict) -> dict:
    """{metric_key: (value, unit, vs_baseline)} from a bench JSON line."""
    out = {result["metric"]: (result["value"], result["unit"],
                              result["vs_baseline"])}
    for m in result.get("extra_metrics", []):
        out[m["metric"]] = (m["value"], m["unit"], m["vs_baseline"])
    return out


def render_markdown(result: dict) -> str:
    """The PERF.md headline table, generated from bench output so the doc
    cannot drift from the driver artifact (tests/test_perf_doc.py pins it
    against the newest BENCH_r*.json)."""
    flat = flatten_metrics(result)
    lines = [
        "| Metric | v5e (1 chip) | PyTorch-GPU baseline | Factor |",
        "|---|---|---|---|",
    ]
    missing = []
    for key, name, base in TABLE_ROWS:
        row = flat.get(key)
        if row is None:
            # pre-round-3 artifacts predate some metrics (e.g.
            # raft_wildflow); skip the row with a note instead of a bare
            # KeyError so `update_perf.py BENCH_r02.json` stays usable
            missing.append(key)
            continue
        value, unit, vs = row
        lines.append(f"| {name} | **{value:g} {unit}** | {base} "
                     f"| **{vs:g}×** |")
    out = "\n".join(lines) + "\n"
    if missing:
        out += ("\n*(artifact predates metric(s) "
                + ", ".join(f"`{m}`" for m in missing)
                + " — re-run bench.py for the full table)*\n")
    return out

RAFT_GPU_BASELINE = 10.0       # pairs/s, see module docstring
FLOWNETC_GPU_BASELINE = 28.0   # pairs/s
PATCH_GPU_BASELINE = 9.0       # attack iters/s
FLOWNET2_GPU_BASELINE = 8.0    # pairs/s (123 ms/frame on GTX 1080, scaled)
SPYNET_GPU_BASELINE = 14.0     # pairs/s (~69 ms/frame Titan X, scaled)
PWCNET_GPU_BASELINE = 32.0     # pairs/s (~35 fps Titan X Pascal, scaled)
TRAIN_GPU_BASELINE = 6.0       # frames/s (RAFT train step @ 288x960,
#                                derived: inference/3/pixel-ratio)

BATCH = 8
H, W = 384, 1280
ITERS = 20

# Calibrated-headline operating band: trained checkpoints drive 5-40 px
# recurrent iterates (the regime the GPU denominator was measured in);
# the calibration is *verified* at bench geometry, not asserted (ADVICE r3)
CAL_BAND = (5.0, 40.0)


def make_inputs(batch=BATCH, h=H, w=W, seed=0):
    rng = np.random.RandomState(seed)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    return img1, img2


def measure_raft(n=ITERS, batch=BATCH):
    """(calibrated pairs/s, wild pairs/s, calibrated mean |flow| px).

    Measured at the TRAINED-CHECKPOINT operating point: the 10 pairs/s
    GPU denominator (RAFT paper) was measured with trained weights,
    whose recurrent iterates are smooth 5-40 px flows.  Raw random init
    drives ~150 px spatially-wild iterates — a regime no deployed
    checkpoint operates in — which disables the flow-following slab
    path (PERF.md "Flow-following row slabs"); the headline therefore
    scales the FlowHead so iterates land at checkpoint-like magnitudes
    (models.raft_model.scale_flow_head — same operating point as the
    PERF.md drift measurement), and the raw-random-init number ships
    alongside as the `raft_wildflow` worst-case metric.  The returned
    mean-|flow| is measured at BENCH geometry so the calibration claim is
    checked where it is used, not at the 64x64 scale-search geometry.
    """
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.models.raft_model import (
        scale_flow_head,
    )
    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    img1, img2 = make_inputs(batch)
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128))
    vcal = scale_flow_head(raft.variables, 0.05)
    flow = jax.jit(raft.predict_fn)(vcal, img1[:1], img2[:1])
    cal_mag = float(jnp.mean(jnp.linalg.norm(
        flow.astype(jnp.float32), axis=-1)))
    dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                    (img1, img2, vcal), n=n)
    cal_pairs = batch / dt
    dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                    (img1, img2, raft.variables), n=n)
    wild_pairs = batch / dt
    return cal_pairs, wild_pairs, cal_mag


def _measure_predict(model_id, n, batch=BATCH):
    """pairs/s for one zoo model's predict_fn at bench geometry.

    repeats=5 (not the harness default 3): round 4's builder bench
    recorded SPyNet at 163.8 pairs/s in one window while 12 probe reps
    across 2 fresh processes and all 4 driver artifacts measure
    123-127 — an unreproducible single-window artifact of the
    wall-time differencing (RPC jitter contaminates a sample; a median
    of 3 noisy differences can land far off).  Five repeats cut the
    tail; tests/test_perf_doc.py cross-checks the generated table
    against PERF.md's hand-written zoo table as the second line.
    """
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    img1, img2 = make_inputs(batch)
    m = fetch_model(model_id, pretrained_path=None, init_size=(128, 128))
    dt = timed_loop(lambda a, b, v: m.predict_fn(v, a, b),
                    (img1, img2, m.variables), n=n, repeats=5)
    return batch / dt


def measure_flownetc(n=60):
    return _measure_predict("FlowNetC", n)


def measure_flownet2(n=10):
    return _measure_predict("FlowNet2", n)


def measure_spynet(n=10):
    return _measure_predict("SpyNet", n)


def measure_pwcnet(n=15):
    return _measure_predict("PWCNet", n)


def measure_patch_attack(n=5):
    """Patch-attack inner-loop iters/s (jitted fwd+bwd, batch 1)."""
    from understanding_flow_robustness_tpu.attacks.patch_attack import (
        PatchAttackConfig,
        make_patch_attack_step,
    )
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    rng = np.random.RandomState(0)
    fnc = fetch_model("FlowNetC", pretrained_path=None, init_size=(128, 128))
    # loss_threshold 0 pins the while_loop at exactly max_count iterations
    n_steps = 8
    cfg = PatchAttackConfig(max_count=n_steps, loss_threshold=0.0)
    # variables threaded as a TRACED argument (not closed over): closing
    # over fnc.predict would inline ~150 MB of f32 params into the HLO
    attack = make_patch_attack_step(fnc.predict_fn, cfg,
                                    takes_variables=True)
    tgt = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    ref = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    mask = np.zeros((1, H, W, 3), np.float32)
    mask[:, 100:200, 100:200] = 1.0
    mask = jnp.asarray(mask)
    patch = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)) * mask
    target = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))
    dt = timed_loop(
        lambda t, r, v: attack(t, r, patch, mask, patch, target, v)[:3],
        (tgt, ref, fnc.variables), n=n,
    )
    return n_steps / dt


# Guard-facing registry: metric key -> zero-arg measurement closure
# returning the value in the metric's unit (tests/test_tpu_perf_guard.py
# iterates this so every BENCH metric is guarded on chip).
MEASURES = {
    "flownetc_kitti2012_384x1280_frame_pairs_per_sec_per_chip":
        measure_flownetc,
    "patch_attack_flownetc_384x1280_iters_per_sec_per_chip":
        measure_patch_attack,
    "flownet2_384x1280_frame_pairs_per_sec_per_chip": measure_flownet2,
    "spynet_384x1280_frame_pairs_per_sec_per_chip": measure_spynet,
    "pwcnet_384x1280_frame_pairs_per_sec_per_chip": measure_pwcnet,
}


def measure_train_fwd(n=8):
    """Forward+loss only at the train geometry (no grad/optimizer),
    frames/s — the denominator of the train guard's same-session
    backward-multiple bound (tests/test_tpu_perf_guard.py)."""
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.training.losses import (
        sequence_loss,
    )
    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    rng = np.random.RandomState(0)
    tb, th, tw = 4, 288, 960
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       batch_pad_encoders=True)
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    targs = (
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        jnp.ones((tb, th, tw), jnp.float32),
    )

    def fwd_loss(i1, i2, fl, va, p, s):
        variables = {"params": p, "batch_stats": s}
        preds, _ = raft.module.apply(
            variables, i1 * 255.0, i2 * 255.0, mutable=["batch_stats"],
            train=True, test_mode=False, packed_train=True)
        loss, _ = sequence_loss(list(preds), fl, va, packed=True)
        return (loss,)

    dt = timed_loop(fwd_loss, targs + (tparams, tstats), n=n)
    return tb / dt


def measure_train_step(n=5):
    """RAFT train-step throughput, frames/s (batch 4 @ 288x960)."""
    from understanding_flow_robustness_tpu.models import fetch_model
    from understanding_flow_robustness_tpu.training import (
        fetch_optimizer,
        make_train_step,
    )
    from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

    rng = np.random.RandomState(0)
    tb, th, tw = 4, 288, 960
    tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
    # train module: batch_pad_encoders tiles the batch-4 cnet to 8 (XLA's
    # batch-4 conv strategy is pathological on v5e — see RAFT.batched);
    # params/stats are structurally identical to the inference module.
    # make_train_step auto-enables the packed RAFT loss path on TPU.
    raft_tr = fetch_model("RAFT", pretrained_path=None,
                          init_size=(128, 128), batch_pad_encoders=True)
    tparams = raft_tr.variables["params"]
    tstats = raft_tr.variables.get("batch_stats", {})
    topt = tx.init(tparams)
    tstep = jax.jit(make_train_step(raft_tr.module, tx, loss_type="sequence",
                                    is_raft=True))
    tbatch = (
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
        jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
        jnp.ones((tb, th, tw), jnp.float32),
    )

    def train_once(i1, i2, fl, va, p, o, s):
        batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
        np_, no_, _, m = tstep(p, o, s, batch)
        # return the UPDATED PARAMS too: timed_loop folds every output
        # leaf into its carry, so this keeps the backward pass + optimizer
        # update live — returning only the loss lets XLA dead-code-
        # eliminate the whole VJP and time a forward-only step
        return np_, m["loss"]

    dt = timed_loop(train_once, tbatch + (tparams, topt, tstats), n=n)
    return tb / dt


def main():
    import sys

    from understanding_flow_robustness_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    # --- headline: RAFT-12 inference (fused on-demand corr lookup) ---
    raft_pairs, raft_wild_pairs, cal_mag = measure_raft()
    cal_in_band = CAL_BAND[0] <= cal_mag <= CAL_BAND[1]
    if not cal_in_band:
        print(
            f"WARNING: calibrated RAFT mean |flow| = {cal_mag:.1f} px is "
            f"outside the {CAL_BAND} band the headline's operating-point "
            "claim rests on — treat raft_kitti as uncalibrated "
            "(raft_wildflow is the load-bearing number)",
            file=sys.stderr,
        )

    # --- the rest of the zoo via the guard-shared closures (MEASURES) ---
    fnc_pairs = measure_flownetc()
    patch_iters = measure_patch_attack()
    fn2_pairs = measure_flownet2()
    spy_pairs = measure_spynet()
    pwc_pairs = measure_pwcnet()

    # --- RAFT adversarial-finetuning train step (batch 4 @ 288x960) ---
    train_frames = measure_train_step()

    print(
        json.dumps(
            {
                "metric": "raft_kitti_384x1280_frame_pairs_per_sec_per_chip",
                "value": round(raft_pairs, 2),
                "unit": "frame-pairs/s",
                "vs_baseline": round(raft_pairs / RAFT_GPU_BASELINE, 2),
                "calibration_mean_flow_px": round(cal_mag, 1),
                "calibration_in_band": cal_in_band,
                "extra_metrics": [
                    {
                        "metric": "raft_wildflow_384x1280_frame_pairs"
                                  "_per_sec_per_chip",
                        "value": round(raft_wild_pairs, 2),
                        "unit": "frame-pairs/s",
                        "vs_baseline": round(
                            raft_wild_pairs / RAFT_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "flownetc_kitti2012_384x1280_frame_pairs"
                                  "_per_sec_per_chip",
                        "value": round(fnc_pairs, 2),
                        "unit": "frame-pairs/s",
                        "vs_baseline": round(
                            fnc_pairs / FLOWNETC_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "patch_attack_flownetc_384x1280_iters"
                                  "_per_sec_per_chip",
                        "value": round(patch_iters, 2),
                        "unit": "attack-iters/s",
                        "vs_baseline": round(
                            patch_iters / PATCH_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "flownet2_384x1280_frame_pairs"
                                  "_per_sec_per_chip",
                        "value": round(fn2_pairs, 2),
                        "unit": "frame-pairs/s",
                        "vs_baseline": round(
                            fn2_pairs / FLOWNET2_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "spynet_384x1280_frame_pairs"
                                  "_per_sec_per_chip",
                        "value": round(spy_pairs, 2),
                        "unit": "frame-pairs/s",
                        "vs_baseline": round(
                            spy_pairs / SPYNET_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "pwcnet_384x1280_frame_pairs"
                                  "_per_sec_per_chip",
                        "value": round(pwc_pairs, 2),
                        "unit": "frame-pairs/s",
                        "vs_baseline": round(
                            pwc_pairs / PWCNET_GPU_BASELINE, 2
                        ),
                    },
                    {
                        "metric": "raft_train_step_288x960_frames"
                                  "_per_sec_per_chip",
                        "value": round(train_frames, 2),
                        "unit": "frames/s",
                        "vs_baseline": round(
                            train_frames / TRAIN_GPU_BASELINE, 2
                        ),
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
