"""Global-attack evaluation driver (reference: global_attacks/perturb_main.py).

``run()`` reproduces the reference pipeline (:48-814): per frame pair —
clean flow, attack (white-box jitted / noise / corruption / pre-trained
universal perturbation), adversarial flow, noise-only flow — with sample
dumps, per-frame timing, and the final ``validate`` aggregation.  The
white-box attack itself is the jitted loop from
attacks/global_attacks.py, so the reference's 40 host-synced
forward+backwards collapse into one device program per pair.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import log_utils
from .corruptions import corrupt_pair, get_corruption_names
from .global_attacks import (
    PerturbConfig,
    make_jitted_attack,
    perturb_trajectory,
)
from .losses import compute_epe

Array = jax.Array


def _write_evolution_gifs(path: str, tr0: np.ndarray, tr1: np.ndarray):
    """Perturbation-evolution GIFs (perturb_model.py:582-614): each step's
    noise is min-max normalized to uint8; files are named viz{ctr}_0.gif /
    viz{ctr}_1.gif with the first unused ctr, total duration ~20 ms."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    ctr = 0
    while os.path.isfile(os.path.join(path, f"viz{ctr}_0.gif")):
        ctr += 1
    for suffix, tr in (("0", tr0), ("1", tr1)):
        frames = []
        for step in range(tr.shape[0]):
            n = tr[step, 0]
            lo, hi = n.min(), n.max()
            frames.append(Image.fromarray(
                np.uint8((n - lo) / (hi - lo + 1e-12) * 255.0)))
        frames[0].save(
            os.path.join(path, f"viz{ctr}_{suffix}.gif"), save_all=True,
            append_images=frames[1:],
            # reference: imageio duration=20/n_step SECONDS per frame
            # (perturb_model.py:610-614); PIL's duration is milliseconds
            duration=max(int(20.0 / max(tr.shape[0], 1) * 1000.0), 1),
            loop=0,
        )


@dataclasses.dataclass
class RunConfig:
    flownet: str = "FlowNetC"
    perturb: PerturbConfig = dataclasses.field(default_factory=PerturbConfig)
    n_height: int = 256
    n_width: int = 640
    output_path: str = "output/perturb"
    seed: int = 0
    write_out_frequency: int = 0        # dump every Nth sample (0 = off)
    save_npy: bool = False
    universal_perturbation_path: Optional[str] = None
    arbitrary_gt: Optional[np.ndarray] = None   # fixed target for all pairs
    # fixed noise pair re-applied to every sample (the reference's
    # arbitrary_noise_index branch, perturb_main.py:385-448): (2, H, W, 3)
    arbitrary_noise: Optional[np.ndarray] = None
    # --homogeneous (perturb_main.py:477-481): second frame := first frame,
    # full-res GT := zeros (the downsampled attack target is left alone,
    # exactly like the reference's unpack order).
    homogeneous: bool = False
    # --uniform_noise universal baseline (perturb_main.py:451-457): one
    # uniform noise pair in [-output_norm, output_norm] drawn once and
    # applied to every sample.
    uniform_noise: bool = False
    # --show_evolve (perturb_model.py:497,582,604-614): directory for
    # per-attack perturbation-evolution GIFs (iterative methods only).
    show_evolve_path: Optional[str] = None


def build_arbitrary_gt(kind: str, helper_gt: np.ndarray,
                       rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Arbitrary attack targets (perturb_main.py:244-383):

    * digit index — handled by the caller (a dataset sample's GT)
    * "fun"       — a flow field drawing "42" (±90 px strokes on a -5 field)
    * "uniform_N" — random U(-180, 180) blocks of size N
    helper_gt: (H, W, 3) NHWC (u, v, valid).
    """
    rng = rng or np.random.RandomState(0)
    H, W = helper_gt.shape[:2]
    if kind == "fun":
        gt = np.full_like(helper_gt, -5.0)
        thickness, margin = 50, 20
        idx = np.zeros((H, W), bool)
        # "4"
        idx[margin : 256 - margin, 225 : 225 + thickness] = True
        idx[margin : 128, 125 : 125 + thickness] = True
        idx[128 - thickness // 2 : 128 + thickness // 2,
            125 : 225 + thickness] = True
        gt[idx, 0] = -90
        gt[idx, 1] = -90
        # "2"
        idx = np.zeros((H, W), bool)
        idx[margin : margin + thickness, 400 : 500 + thickness] = True
        idx[128 - thickness // 2 : 128 + thickness // 2,
            400 : 500 + thickness] = True
        idx[256 - margin - thickness : 256 - margin,
            400 : 500 + thickness] = True
        idx[margin : 128, 500 : 500 + thickness] = True
        idx[128 : 256 - margin, 400 : 400 + thickness] = True
        gt[idx, 0] = 90
        gt[idx, 1] = 90
        gt[..., 2] = 1
        return gt
    if kind.startswith("uniform"):
        factor = int(kind[kind.rfind("_") + 1 :])
        hs, ws = H // factor, W // factor
        small = rng.uniform(
            -180, 180, (hs, ws, helper_gt.shape[2])
        ).astype(np.float32)
        # torch F.interpolate(mode="nearest") to the FULL size
        # (perturb_main.py:358-363): src index = floor(dst * in / out) —
        # identical to block-repeat when factor divides H/W, evenly
        # spread otherwise (repeat + edge-pad would bunch the remainder
        # into one bottom/right band)
        iy = np.arange(H) * hs // H
        ix = np.arange(W) * ws // W
        gt = small[iy][:, ix]
        gt[..., 2] = 1
        return gt
    raise ValueError(kind)


def run(
    predict: Callable[[Array, Array], Array],
    samples: Iterable,
    cfg: RunConfig,
    mesh=None,
    predict_fn: Optional[Callable] = None,
    variables=None,
) -> dict:
    """Attack-evaluate over (img0, img1, gt_small, gt_full) NHWC [0,1]
    samples (batch dim included).  Returns the aggregate metrics dict and
    writes results{seed}.txt under the output path.

    With ``mesh`` (plus ``predict_fn(variables, a, b)`` and ``variables``),
    each sample batch is sharded over the mesh's ``data`` axis — the
    multi-chip analog of the reference's DataParallel evaluation
    (training/evaluate.py:410); feed batches whose leading dim is a
    multiple of the mesh size.  Per-sample metrics/logging are unchanged:
    every batch entry is logged individually.
    """
    method = cfg.perturb.perturb_method
    is_corruption = method in get_corruption_names("all")
    attack = None
    whitebox = method in ("fgsm", "fgm", "ifgsm", "ifgm", "mifgsm", "mifgm",
                          "gaussian", "uniform", "none")
    if not whitebox and not is_corruption:
        # fail BEFORE creating output dirs, with the reference's explicit
        # dispatch error (perturb_model.py:270-272)
        raise ValueError(f"Invalid perturbation method: {method}")

    os.makedirs(cfg.output_path, exist_ok=True)
    seed = log_utils.find_unused_seed_results(cfg.output_path, cfg.seed)
    paths = log_utils.create_write_folder_structure(cfg.output_path)
    logf = os.path.join(cfg.output_path, f"log{seed}.txt")
    if mesh is not None:
        if predict_fn is None or variables is None:
            raise ValueError("mesh mode needs predict_fn + variables")
        if cfg.show_evolve_path:
            # the sharded attack has no trajectory-collecting variant;
            # failing loudly beats silently dropping the requested GIFs
            raise ValueError(
                "show_evolve_path is not supported with mesh sharding; "
                "run unsharded to collect perturbation-evolution GIFs"
            )
        from ..parallel.mesh import shard_predict
        from .global_attacks import make_sharded_attack

        _pjit = shard_predict(predict_fn, mesh)
        predict_jit = lambda a, b: _pjit(variables, a, b)  # noqa: E731
        if whitebox:
            _attack = make_sharded_attack(predict_fn, cfg.perturb, mesh)
            attack = (
                lambda i0, i1, t, k: _attack(variables, i0, i1, t, k)
            )  # noqa: E731
    else:
        predict_jit = jax.jit(predict)
        if whitebox:
            if cfg.show_evolve_path:
                attack_traj = jax.jit(
                    lambda i0, i1, t, k: perturb_trajectory(
                        predict, i0, i1, t, cfg.perturb, k))

                def attack(i0, i1, t, k):
                    outs, (tr0, tr1) = attack_traj(i0, i1, t, k)
                    _write_evolution_gifs(
                        cfg.show_evolve_path,
                        np.asarray(tr0), np.asarray(tr1))
                    return outs
            else:
                attack = make_jitted_attack(predict, cfg.perturb)

    universal = None
    if cfg.universal_perturbation_path:
        universal = np.load(cfg.universal_perturbation_path)
    uniform_universal = None
    if cfg.uniform_noise:
        # drawn ONCE before the sample loop (perturb_main.py:451-457;
        # upstream hardcodes its default 256x640 geometry — we draw at the
        # configured size so non-default geometries work, see PARITY.md)
        eps = float(cfg.perturb.output_norm)
        rng = np.random.RandomState(cfg.seed if cfg.seed > 0 else 0)
        uniform_universal = (
            rng.rand(2, 1, cfg.n_height, cfg.n_width, 3).astype(np.float32)
            * 2 * eps - eps
        )

    rng_key = jax.random.PRNGKey(seed)
    noises0, noises1, origins, outputs, gts = [], [], [], [], []
    t_start = time.time()

    for i, (img0, img1, gt_small, gt_full) in enumerate(samples):
        img0 = jnp.asarray(img0, jnp.float32)
        img1 = jnp.asarray(img1, jnp.float32)
        if cfg.homogeneous:
            # perturb_main.py:477-481: identical frames, zeroed full-res GT
            # (attack target gt_small is computed before this upstream and
            # is intentionally NOT zeroed)
            img1 = img0
            gt_full = np.zeros_like(np.asarray(gt_full))
        flow_origin = predict_jit(img0, img1)

        if cfg.arbitrary_gt is not None:
            target = jnp.broadcast_to(
                jnp.asarray(cfg.arbitrary_gt)[None],
                img0.shape[:1] + cfg.arbitrary_gt.shape,
            )
        else:
            target = jnp.asarray(gt_small)

        if cfg.arbitrary_noise is not None:
            n0 = jnp.asarray(cfg.arbitrary_noise[0][None])
            n1 = jnp.asarray(cfg.arbitrary_noise[1][None])
            adv0 = jnp.clip(img0 + n0, 0.0, 1.0)
            adv1 = jnp.clip(img1 + n1, 0.0, 1.0)
            noise0, noise1 = adv0 - img0, adv1 - img1
        elif universal is not None or uniform_universal is not None:
            # re-apply a pre-trained universal perturbation — or the
            # uniform-noise baseline pair (perturb_main.py:450-464)
            if uniform_universal is not None:
                n0 = jnp.asarray(uniform_universal[0])
                n1 = jnp.asarray(uniform_universal[1])
            else:
                n0 = jnp.asarray(universal[:, 0])
                n1 = jnp.asarray(universal[:, 1])
            adv0 = jnp.clip(img0 + n0, 0.0, 1.0)
            adv1 = jnp.clip(img1 + n1, 0.0, 1.0)
            noise0, noise1 = adv0 - img0, adv1 - img1
        elif is_corruption:
            out0, out1 = corrupt_pair(
                np.asarray(img0), np.asarray(img1), method,
                int(cfg.perturb.output_norm),
                mode=cfg.perturb.perturb_mode,
            )
            adv0 = jnp.asarray(np.clip(out0, 0, 1))
            adv1 = jnp.asarray(np.clip(out1, 0, 1))
            noise0, noise1 = adv0 - img0, adv1 - img1
        else:
            rng_key, sub = jax.random.split(rng_key)
            noise0, noise1, adv0, adv1 = attack(img0, img1, target, sub)

        flow_output = predict_jit(adv0, adv1)

        # noise-only prediction (perturb_main.py:627-650): normalize each
        # noise into [0, 1] and run the model on it
        def norm01(x):
            lo, hi = jnp.min(x), jnp.max(x)
            return (x - lo) / (hi - lo + 1e-12)

        flow_noise = predict_jit(norm01(noise0), norm01(noise1))

        gt_full = jnp.asarray(gt_full)
        for b in range(int(img0.shape[0])):
            noises0.append(np.asarray(noise0[b]))
            noises1.append(np.asarray(noise1[b]))
            origins.append(np.asarray(flow_origin[b]))
            outputs.append(np.asarray(flow_output[b]))
            gts.append(np.asarray(gt_full[b]))

            j = len(outputs) - 1
            if cfg.write_out_frequency and j % cfg.write_out_frequency == 0:
                log_utils.write_out_sample(
                    paths, j,
                    image0=np.asarray(adv0[b]), image1=np.asarray(adv1[b]),
                    noise0=np.asarray(noise0[b]),
                    noise1=np.asarray(noise1[b]),
                    flow_output=np.asarray(flow_output[b]),
                    flow_origin=np.asarray(flow_origin[b]),
                    flow_output_noise=np.asarray(flow_noise[b]),
                    save_npy=cfg.save_npy,
                )

            epe_before = float(
                compute_epe(gt_full[b : b + 1], flow_origin[b : b + 1])
            )
            epe_after = float(
                compute_epe(gt_full[b : b + 1], flow_output[b : b + 1])
            )
            log_utils.log(
                f"[{j}] epe {epe_before:.3f} -> {epe_after:.3f}", logf,
                to_console=False,
            )

        if cfg.homogeneous:
            # the homogeneous experiment evaluates exactly ONE sample
            # (perturb_main.py:777-778 breaks after the first iteration)
            break

    n = max(len(outputs), 1)
    per_frame = (time.time() - t_start) / n
    results = log_utils.validate(
        noises0, noises1, origins, outputs, gts,
        output_path=cfg.output_path, seed=seed,
    )
    log_utils.log(f"time_per_frame: {per_frame:.3f}s", logf, to_console=False)
    results["time_per_frame"] = (per_frame, 0.0)
    return results
