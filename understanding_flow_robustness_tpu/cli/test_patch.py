"""Patch evaluation at fixed or random location
(reference: patch_attacks/test_patch.py:131-647).

Evaluates a saved / random / self-correlated patch against a flow net over
an evaluation set; writes ``test_results.csv`` (aggregate) and
``test_result_scenes.csv`` (per-scene), plus optional flow visualizations.
``--different_pos`` places independent patch positions in the two frames
and replaces the GT inside the patch with the synthesized patch motion
(utils_patch.py:499-757's circle_transform_different semantics).

Supports --synthetic for data-free smoke runs.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import (
    circle_transform,
    create_correlated_patch,
    create_random_patch,
    create_circular_mask,
)
from ..attacks.losses import compute_cossim, compute_epe
from ..utils.meters import AverageMeter, CsvLogger


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--flownet", type=str, default="FlowNetC")
    p.add_argument("--pretrained_path", type=str, default="pretrained_models")
    p.add_argument("--valset", type=str, default="kitti2015",
                   choices=["kitti2012", "kitti2015", "sintel"])
    p.add_argument("--kitti-dir", type=str, default="datasets/KITTI/scene_flow")
    p.add_argument("--sintel-dir", type=str, default="datasets/Sintel")
    p.add_argument("--patch_path", type=str, default=None)
    p.add_argument("--random_patch", type=str, default=None,
                   choices=["gaussian", "uniform", "black", "white", "red",
                            "gray"])
    p.add_argument("--self_correlated_patch", type=str, default=None)
    p.add_argument("--patch_size", type=int, default=100,
                   help="pixels (for random/self-correlated patches)")
    p.add_argument("--fixed_loc_x", type=int, default=-1)
    p.add_argument("--fixed_loc_y", type=int, default=-1)
    p.add_argument("--different_pos", action="store_true")
    p.add_argument("--norotate", action="store_true")
    p.add_argument("--true_motion", action="store_true",
                   help="3D-projected patch motion (needs KITTI raw)")
    p.add_argument("--name", type=str, default="test_patch")
    p.add_argument("--output", type=str, default="output/patch_attacks")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic-size", type=int, nargs=2, default=(128, 192))
    return p


def load_patch(args):
    if args.self_correlated_patch:
        patch = create_correlated_patch(args.self_correlated_patch,
                                        args.patch_size)
    elif args.random_patch:
        patch = create_random_patch(args.random_patch, args.patch_size)
    elif args.patch_path:
        patch = np.load(args.patch_path)
    else:
        raise SystemExit("need --patch_path / --random_patch / "
                         "--self_correlated_patch")
    m = create_circular_mask(patch.shape[1], patch.shape[2]).astype("float32")
    mask = np.tile(m[None, :, :, None], (1, 1, 1, 3))
    return patch, mask, patch.shape


def _val_samples(args):
    if args.synthetic:
        rng = np.random.RandomState(args.seed)
        h, w = args.synthetic_size
        for i in range(args.synthetic):
            tgt = rng.rand(1, h, w, 3).astype(np.float32)
            fut = rng.rand(1, h, w, 3).astype(np.float32)
            gt = np.zeros((1, h, w, 3), np.float32)
            gt[..., 2] = 1
            yield i, tgt, fut, gt
        return
    from argparse import Namespace

    from ..data import get_evaluation_set

    ds = get_evaluation_set(args.valset, Namespace(
        img_height=384, img_width=1280, kitti_dir=args.kitti_dir,
        sintel_dir=args.sintel_dir, true_motion=args.true_motion,
    ))
    for i in range(len(ds)):
        _, tgt, fut, gt_flow, _, _, _ = ds[i]
        yield i, tgt[None], fut[None], gt_flow[None]


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)
    if args.true_motion:
        raise SystemExit(
            "--true_motion (3D patch projection) requires KITTI raw data; "
            "see understanding_flow_robustness_tpu.data.kitti_raw"
        )

    from ..models import fetch_model
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(args.flownet, pretrained_path=(
        args.pretrained_path if os.path.isdir(args.pretrained_path) else None
    ))
    predict_jit = jax.jit(lambda a, b: model.predict(a, b))

    patch, mask, patch_shape = load_patch(args)
    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)
    scene_csv = CsvLogger(
        os.path.join(out_dir, "test_result_scenes.csv"),
        ["scene", "epe", "adv_epe", "cos_sim", "adv_cos_sim"],
    )
    errors = AverageMeter(i=4)
    fixed = (args.fixed_loc_x, args.fixed_loc_y)

    for i, tgt, fut, gt in _val_samples(args):
        flow = predict_jit(jnp.asarray(tgt), jnp.asarray(fut))

        pc, mc, _, rx, ry, pshape = circle_transform(
            patch.copy(), mask, patch.copy(), tgt.shape, patch_shape,
            norotate=args.norotate, fixed_loc=fixed, moving=True,
        )
        gt_eval = gt
        if args.different_pos:
            # independent placement in frame 2; GT inside the patch becomes
            # the synthesized patch displacement
            pc2, mc2, _, rx2, ry2, _ = circle_transform(
                patch.copy(), mask, patch.copy(), tgt.shape, patch_shape,
                norotate=args.norotate, moving=True,
            )
            gt_eval = gt.copy()
            region = mc[0, :, :, 0] > 0.5
            gt_eval[0, region, 0] = rx2 - rx
            gt_eval[0, region, 1] = ry2 - ry
            gt_eval[0, region, 2] = 1
        else:
            pc2, mc2 = pc, mc

        adv_tgt = np.clip((1 - mc) * tgt + mc * pc, 0, 1).astype(np.float32)
        adv_fut = np.clip((1 - mc2) * fut + mc2 * pc2, 0, 1).astype(np.float32)
        adv_flow = predict_jit(jnp.asarray(adv_tgt), jnp.asarray(adv_fut))

        gt_j = jnp.asarray(gt_eval)
        vals = [
            float(compute_epe(jnp.asarray(gt), flow)),
            float(compute_epe(gt_j, adv_flow)),
            float(compute_cossim(jnp.asarray(gt), flow)),
            float(compute_cossim(gt_j, adv_flow)),
        ]
        errors.update(vals)
        scene_csv.write([i] + [round(v, 4) for v in vals])

    result_csv = CsvLogger(
        os.path.join(out_dir, "test_results.csv"),
        ["epe", "adv_epe", "cos_sim", "adv_cos_sim"],
    )
    result_csv.write([round(v, 4) for v in errors.avg])
    print("avg:", dict(zip(["epe", "adv_epe", "cos_sim", "adv_cos_sim"],
                           [round(v, 4) for v in errors.avg])))
    return errors.avg


if __name__ == "__main__":
    main()
