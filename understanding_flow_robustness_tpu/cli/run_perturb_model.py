"""Global-attack CLI (reference: global_attacks/run_perturb_model.py:26-281).

Three branches like the reference (:200-281): universal-perturbation
evaluation, white-box/noise attacks, and corruption sweeps over severities
1-5.  Supports synthetic data (--synthetic N) for data-free smoke runs.

Example:
  python -m understanding_flow_robustness_tpu.cli.run_perturb_model \\
      --flownet FlowNetC --perturb_method ifgsm --flow_loss l2 \\
      --output_norm 0.02 --synthetic 4
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attacks.corruptions import get_corruption_names
from ..attacks.global_attacks import (
    LEARNING_RATE,
    MOMENTUM,
    N_STEP,
    OUTPUT_NORM,
    PERTURB_METHOD,
    PerturbConfig,
)
from ..attacks.perturb_runner import RunConfig, build_arbitrary_gt, run

PERTURB_METHODS = ["fgsm", "fgm", "ifgsm", "ifgm", "mifgsm", "mifgm",
                   "gaussian", "uniform", "none"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="kitti2015",
                   choices=["kitti2012", "kitti2015"])
    p.add_argument("--data_list_dir", type=str,
                   default="datasets/KITTI/global_attacks")
    p.add_argument("--n_height", type=int, default=256)
    p.add_argument("--n_width", type=int, default=640)
    p.add_argument("--perturb_method", type=str, default=PERTURB_METHOD,
                   choices=PERTURB_METHODS + get_corruption_names("all"))
    p.add_argument("--perturb_mode", type=str, default="both",
                   choices=["both", "left", "right", "same"])
    p.add_argument("--output_norm", default=OUTPUT_NORM)
    p.add_argument("--n_step", type=int, default=N_STEP)
    p.add_argument("--learning_rate", type=float, default=LEARNING_RATE)
    p.add_argument("--momentum", type=float, default=MOMENTUM)
    p.add_argument("--probability_diverse_input", type=float, default=0.0,
                   help="per-step probability of random resize-pad input "
                        "diversification (perturb_model.py:759-821)")
    p.add_argument("--flownet", type=str, default="FlowNetC")
    p.add_argument("--pretrained_path", type=str, default="pretrained_models")
    p.add_argument("--flow_loss", type=str, default="cossim",
                   choices=["cossim", "l2", "l1"])
    p.add_argument("--targeted", action="store_true")
    p.add_argument("--arbitrary_gt_index", type=str, default=None,
                   help="dataset index digit, 'fun', or 'uniform_N'")
    p.add_argument("--universal_evaluation", action="store_true")
    p.add_argument("--perturbations_file", type=str, default=None)
    p.add_argument("--output_path", type=str, default="output/global_attacks")
    p.add_argument("--write_out", action="store_true")
    p.add_argument("--write_out_npy", action="store_true")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic frame pairs instead of a dataset")
    return p


def _samples(args):
    if args.synthetic:
        rng = np.random.RandomState(0)
        for _ in range(args.synthetic):
            img0 = rng.rand(1, args.n_height, args.n_width, 3).astype(np.float32)
            img1 = rng.rand(1, args.n_height, args.n_width, 3).astype(np.float32)
            gt = np.zeros((1, args.n_height, args.n_width, 3), np.float32)
            gt[..., 2] = 1
            yield img0, img1, gt, gt
        return
    from ..data import KittiPairDataset

    year = "2015" if args.dataset == "kitti2015" else "2012"
    ds = KittiPairDataset.from_lists(
        args.data_list_dir, year=year, split="train",
        n_height=args.n_height, n_width=args.n_width,
    )
    for i in range(len(ds)):
        img0, img1, gt_small, gt_full = ds[i]
        yield img0[None], img1[None], gt_small[None], gt_full[None]


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.perturb_method = args.perturb_method.lower()
    args.perturb_mode = args.perturb_mode.lower()

    from ..models import fetch_model
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(args.flownet, pretrained_path=(
        args.pretrained_path if os.path.isdir(args.pretrained_path) else None
    ))
    predict = lambda a, b: model.predict(a, b)

    def make_cfg(method, norm, out_sub):
        return RunConfig(
            flownet=args.flownet,
            perturb=PerturbConfig(
                perturb_method=method,
                perturb_mode=args.perturb_mode,
                output_norm=float(norm),
                n_step=args.n_step,
                learning_rate=args.learning_rate,
                momentum=args.momentum,
                targeted=args.targeted or args.arbitrary_gt_index is not None,
                flow_loss=args.flow_loss,
                probability_diverse_input=args.probability_diverse_input,
            ),
            n_height=args.n_height,
            n_width=args.n_width,
            output_path=os.path.join(
                args.output_path, args.dataset, args.flownet, out_sub
            ),
            seed=max(args.seed, 0),
            write_out_frequency=10 if args.write_out else 0,
            save_npy=args.write_out_npy,
            universal_perturbation_path=(
                args.perturbations_file if args.universal_evaluation else None
            ),
        )

    arbitrary_gt = None
    if args.arbitrary_gt_index is not None:
        first = next(_samples(args))
        helper = first[2][0]
        if args.arbitrary_gt_index.isdigit():
            idx = int(args.arbitrary_gt_index)
            for i, s in enumerate(_samples(args)):
                if i == idx:
                    arbitrary_gt = s[2][0]
                    break
        else:
            arbitrary_gt = build_arbitrary_gt(args.arbitrary_gt_index, helper)

    if args.perturb_method in get_corruption_names("all"):
        # severity sweep 1-5 (run_perturb_model.py:246-281)
        for severity in range(1, 6):
            cfg = make_cfg(args.perturb_method, severity,
                           f"{args.perturb_method}_sev{severity}")
            cfg.arbitrary_gt = arbitrary_gt
            res = run(predict, _samples(args), cfg)
            print(f"severity {severity}: epe "
                  f"{res['flow_epe_origin'][0]:.3f} -> {res['flow_epe'][0]:.3f}")
    else:
        sub = (f"{args.perturb_method}_{args.perturb_mode}"
               f"_norm{args.output_norm}_{args.flow_loss}")
        cfg = make_cfg(args.perturb_method, args.output_norm, sub)
        cfg.arbitrary_gt = arbitrary_gt
        res = run(predict, _samples(args), cfg)
        print(f"epe {res['flow_epe_origin'][0]:.3f} -> "
              f"{res['flow_epe'][0]:.3f}; results under {cfg.output_path}")


if __name__ == "__main__":
    main()
