"""Generate the KITTI path-list txt files the global-attack datasets read
(reference: setup/setup_dataset_kitti.py:8-365).

Produces datasets/KITTI/global_attacks/{training,testing}/
kitti_{stereo,scene,stereo_scene}_flow_{all,train,test}_{image0,image1,
disparity,flow}.txt, with the reference's split convention (first 160
stereo / 160 scene samples -> train, remainder -> test).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from understanding_flow_robustness_tpu.flowviz import write_paths  # noqa: E402


def collect(root: str, image0_dir: str, disp_dir: str, flow_dir: str):
    # both frames come from the LEFT camera (*_10/*_11 pairs) — the
    # right-camera dirs the reference enumerates are never read by the
    # flow-pair consumers (KittiPairDataset)
    image0 = sorted(glob.glob(os.path.join(root, image0_dir, "*_10.png")))
    image1 = sorted(glob.glob(os.path.join(root, image0_dir, "*_11.png")))
    disparity = sorted(glob.glob(os.path.join(root, disp_dir, "*_10.png")))
    flow = sorted(glob.glob(os.path.join(root, flow_dir, "*_10.png")))
    return image0, image1, disparity, flow


def emit(out_train: str, out_test: str, tag: str, lists, n_train: int = 160):
    image0, image1, disparity, flow = lists
    names = ["image0", "image1", "disparity", "flow"]
    for name, paths in zip(names, lists):
        write_paths(
            os.path.join(out_train, f"kitti_{tag}_flow_all_{name}.txt"), paths
        )
        write_paths(
            os.path.join(out_train, f"kitti_{tag}_flow_train_{name}.txt"),
            paths[:n_train],
        )
        write_paths(
            os.path.join(out_test, f"kitti_{tag}_flow_test_{name}.txt"),
            paths[n_train:],
        )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kitti2012", default="datasets/KITTI/2012/training")
    p.add_argument("--kitti2015", default="datasets/KITTI/2015/training")
    p.add_argument("--output", default="datasets/KITTI/global_attacks")
    args = p.parse_args(argv)

    out_train = os.path.join(args.output, "training")
    out_test = os.path.join(args.output, "testing")
    os.makedirs(out_train, exist_ok=True)
    os.makedirs(out_test, exist_ok=True)

    stereo = collect(args.kitti2012, "colored_0", "disp_occ", "flow_occ")
    scene = collect(args.kitti2015, "image_2", "disp_occ_0", "flow_occ")

    emit(out_train, out_test, "stereo", stereo)
    emit(out_train, out_test, "scene", scene)
    # combined split = per-dataset splits concatenated
    # (setup_dataset_kitti.py:404-470 writes stereo_train + scene_train),
    # NOT combined[:320] — KITTI-2012 has 194 pairs, so a flat 320-prefix
    # would leak 34 stereo test samples into the combined train list
    names = ["image0", "image1", "disparity", "flow"]
    for k, name in enumerate(names):
        write_paths(
            os.path.join(out_train, f"kitti_stereo_scene_flow_all_{name}.txt"),
            stereo[k] + scene[k],
        )
        write_paths(
            os.path.join(out_train,
                         f"kitti_stereo_scene_flow_train_{name}.txt"),
            stereo[k][:160] + scene[k][:160],
        )
        write_paths(
            os.path.join(out_test, f"kitti_stereo_scene_flow_test_{name}.txt"),
            stereo[k][160:] + scene[k][160:],
        )
    print(f"wrote path lists under {args.output}")


if __name__ == "__main__":
    main()
