"""Prepare KITTI raw for patch-attack training
(reference: setup/prepare_train_data.py:36-117 + setup/kitti_raw_loader.py).

Crawls KITTI raw drives, filters static frames by OXTS speed, resizes
frames to (height, width) jpgs under <dump_root>/<scene>/, writes the
scaled intrinsics to cam.txt and the train.txt/val.txt scene split — the
layout data.SequenceFolder consumes.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from understanding_flow_robustness_tpu.data.kitti_raw import (  # noqa: E402
    read_calib_file,
)

STATIC_FRAMES_SPEED = 1.0  # m/s: below this the frame is considered static


def iter_drives(raw_root: str):
    for date in sorted(os.listdir(raw_root)):
        date_dir = os.path.join(raw_root, date)
        if not os.path.isdir(date_dir) or not date.startswith("2011"):
            continue
        for drive in sorted(glob.glob(os.path.join(date_dir, "*_sync"))):
            yield date, drive


def drive_speeds(drive_dir: str) -> np.ndarray:
    files = sorted(glob.glob(os.path.join(drive_dir, "oxts", "data", "*.txt")))
    speeds = []
    for f in files:
        vals = np.genfromtxt(f)
        # oxts fields 8-10 are vf, vl, vu
        speeds.append(float(np.linalg.norm(vals[8:11])))
    return np.asarray(speeds)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_dir", required=True, help="KITTI raw root")
    p.add_argument("--dump_root", required=True)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--cam", type=int, default=2, help="camera id (2 = RGB left)")
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--keep_static", action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args(argv)

    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    os.makedirs(args.dump_root, exist_ok=True)
    scenes = []

    def process_drive(date, drive):
        name = os.path.basename(drive)
        img_dir = os.path.join(drive, f"image_{args.cam:02d}", "data")
        images = sorted(glob.glob(os.path.join(img_dir, "*.png")))
        if not images:
            return None
        try:
            speeds = drive_speeds(drive)
        except Exception:
            speeds = np.full(len(images), np.inf)
        out_dir = os.path.join(args.dump_root, name)
        os.makedirs(out_dir, exist_ok=True)

        # scaled intrinsics (setup/kitti_raw_loader.py intrinsics scaling)
        calib = read_calib_file(
            os.path.join(os.path.dirname(drive), "calib_cam_to_cam.txt")
        )
        P = calib[f"P_rect_{args.cam:02d}"].reshape(3, 4)
        with Image.open(images[0]) as im0:
            w0, h0 = im0.size
        K = P[:3, :3].copy()
        K[0] *= args.width / w0
        K[1] *= args.height / h0
        np.savetxt(os.path.join(out_dir, "cam.txt"), K, delimiter=",")

        kept = 0
        for i, path in enumerate(images):
            if (not args.keep_static and i < len(speeds)
                    and speeds[i] < STATIC_FRAMES_SPEED):
                continue
            with Image.open(path) as im:
                im = im.resize((args.width, args.height), Image.LANCZOS)
                im.save(os.path.join(out_dir, f"{kept:07d}.jpg"), quality=95)
            kept += 1
        return name if kept >= 3 else None

    with ThreadPoolExecutor(args.num_workers) as pool:
        futs = [(d, pool.submit(process_drive, d, dr)) for d, dr in
                iter_drives(args.dataset_dir)]
        for drive, f in futs:
            # per-drive isolation: one incompletely-downloaded drive
            # (missing calib file, corrupt PNG) must not abort the whole
            # prep and discard hours of completed resizing
            try:
                name = f.result()
            except Exception as e:
                print(f"WARNING: skipping drive {drive}: {e}")
                continue
            if name:
                scenes.append(name)

    scenes.sort()
    # never assign the ONLY scene to val (an empty train.txt would make
    # SequenceFolder crawl zero scenes with no error pointing here)
    n_val = (max(1, int(len(scenes) * args.val_fraction))
             if len(scenes) > 1 else 0)
    with open(os.path.join(args.dump_root, "train.txt"), "w") as f:
        f.write("\n".join(scenes[n_val:]) + "\n")
    with open(os.path.join(args.dump_root, "val.txt"), "w") as f:
        f.write("\n".join(scenes[:n_val]) + "\n")
    print(f"prepared {len(scenes)} scenes under {args.dump_root}")


if __name__ == "__main__":
    main()
