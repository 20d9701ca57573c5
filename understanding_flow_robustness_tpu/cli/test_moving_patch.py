"""Moving-patch location sweep
(reference: patch_attacks/test_moving_patch.py:137-686).

Slides the patch over a stride grid; per location computes the adversarial
EPE against GT whose patch region is replaced with zero flow (valid) or
ignored (--ignore_mask_flow); renders the per-location EPE heatmap overlay
(jet colormap, :474-488), tracks the worst location, and writes
``moving_results.csv`` + per-scene stats.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import circle_transform
from ..attacks.losses import compute_cossim, compute_epe
from ..ops import resize_bilinear
from ..utils.meters import AverageMeter, CsvLogger
from .test_patch import _val_samples, build_parser as _base_parser, load_patch


def build_parser():
    p = _base_parser()
    p.description = __doc__
    p.add_argument("--stride", type=int, default=25)
    p.add_argument("--ignore_mask_flow", action="store_true")
    p.add_argument("--whole_img", type=float, default=0.0,
                   help="non-zero: the loaded patch/mask are already "
                        "full-image canvases; skip placement "
                        "(test_moving_patch.py:63-68,307-343)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)

    from ..models import fetch_model
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(args.flownet, pretrained_path=(
        args.pretrained_path if os.path.isdir(args.pretrained_path) else None
    ))
    predict_jit = jax.jit(lambda a, b: model.predict(a, b))

    patch, mask, patch_shape = load_patch(args)
    m_size = patch_shape[2]
    out_dir = os.path.join(args.output, args.name)
    vis_dir = os.path.join(out_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    scene_csv = CsvLogger(
        os.path.join(out_dir, "moving_result_scenes.csv"),
        ["scene", "epe", "adv_epe_avg", "adv_epe_min", "adv_epe_median",
         "adv_epe_max", "cos_sim", "adv_cos_avg", "adv_cos_min",
         "adv_cos_median", "adv_cos_max"],
    )
    errors = AverageMeter(i=4)

    for i, tgt, fut, gt in _val_samples(args):
        H, W = tgt.shape[1:3]
        flow = predict_jit(jnp.asarray(tgt), jnp.asarray(fut))
        epe = float(compute_epe(jnp.asarray(gt), flow))
        cos = float(compute_cossim(jnp.asarray(gt), flow))

        ys = range(0, H - m_size, args.stride)
        xs = range(0, W - m_size, args.stride)
        heat = np.zeros((len(list(ys)), len(list(xs))), np.float32)
        scene = AverageMeter(i=4)
        adv_epes, adv_coss = [], []
        worst = (-1.0, None)

        for yi, ry in enumerate(range(0, H - m_size, args.stride)):
            for xi, rx in enumerate(range(0, W - m_size, args.stride)):
                if args.whole_img == 0:
                    # reference passes args.norotate (default False): swept
                    # patches rotate randomly per location
                    # (test_moving_patch.py:308-343, utils_patch.py:289-296)
                    pc, mc, _, _, _, _ = circle_transform(
                        patch.copy(), mask, patch.copy(), tgt.shape,
                        patch_shape, norotate=args.norotate,
                        fixed_loc=(rx, ry), moving=True,
                    )
                else:
                    pc, mc = patch, mask
                adv_tgt = np.clip((1 - mc) * tgt + mc * pc, 0, 1).astype(
                    np.float32
                )
                adv_fut = np.clip((1 - mc) * fut + mc * pc, 0, 1).astype(
                    np.float32
                )
                adv_flow = predict_jit(
                    jnp.asarray(adv_tgt), jnp.asarray(adv_fut)
                )

                # GT in the patch region -> zero flow valid=1, or fully
                # ignored (test_moving_patch.py:413-432)
                mres = np.asarray(resize_bilinear(
                    jnp.asarray(mc), gt.shape[1], gt.shape[2],
                    align_corners=False,
                ))
                patch_flow = np.zeros_like(gt)
                if not args.ignore_mask_flow:
                    patch_flow[..., 2] = 1.0
                gt_adv = (1 - mres) * gt + mres * patch_flow

                adv_epe = float(compute_epe(jnp.asarray(gt_adv), adv_flow))
                adv_cos = float(compute_cossim(jnp.asarray(gt_adv), adv_flow))
                heat[yi, xi] = adv_epe
                adv_epes.append(adv_epe)
                adv_coss.append(adv_cos)
                scene.update([epe, adv_epe, cos, adv_cos])
                errors.update([epe, adv_epe, cos, adv_cos])
                if adv_epe > worst[0]:
                    worst = (adv_epe, (rx, ry))

        # heatmap overlay (test_moving_patch.py:474-488)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from scipy.ndimage import zoom as ndzoom

            heat_full = ndzoom(
                heat, (H / heat.shape[0], W / heat.shape[1]), order=1
            )
            gray = np.dot(tgt[0], [0.299, 0.587, 0.114])
            plt.imshow(gray, cmap="gray")
            plt.imshow(heat_full, cmap="jet", alpha=0.5)
            plt.axis("off")
            plt.colorbar()
            plt.tight_layout()
            plt.savefig(os.path.join(vis_dir, f"adv_epe_image_{i:03d}.jpg"))
            plt.close()
        except Exception:
            np.save(os.path.join(vis_dir, f"adv_epe_image_{i:03d}.npy"), heat)

        scene_csv.write([
            i, round(epe, 4), round(scene.avg[1], 4), round(scene.min[1], 4),
            round(float(np.median(adv_epes)), 4), round(scene.max[1], 4),
            round(cos, 4), round(scene.avg[3], 4), round(scene.min[3], 4),
            round(float(np.median(adv_coss)), 4), round(scene.max[3], 4),
        ])
        print(f"scene {i}: clean epe {epe:.3f}, adv epe "
              f"avg {scene.avg[1]:.3f} max {scene.max[1]:.3f} "
              f"@ {worst[1]}")

    result_csv = CsvLogger(
        os.path.join(out_dir, "moving_results.csv"),
        ["epe", "adv_epe", "cos_sim", "adv_cos_sim"],
    )
    result_csv.write([round(v, 4) for v in errors.avg])
    return errors.avg


if __name__ == "__main__":
    main()
