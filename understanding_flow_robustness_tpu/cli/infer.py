"""Batch inference / serving CLI (`ufr-infer`) — a TPU-native addition.

The reference has no standalone "predict a set of frame pairs" tool (its
flow predictions only fall out of attack/eval scripts); production use of
a flow model is exactly that, so this CLI provides it the TPU way:

* static padded shapes — every batch compiles to ONE XLA program
  (pad to the model's size multiple via the InputPadder rule,
  models/raft/utils/utils.py:7-30, then unpad the flow);
* decode-ahead via the native C++ prefetch loader (``native.loader``),
  falling back to pure-Python readers;
* optional data-parallel sharding over a device mesh (``--devices N``) —
  the jitted program is identical, XLA splits the batch over ICI;
* outputs per pair: ``.flo`` (Middlebury), KITTI 16-bit flow PNG, and/or
  a Middlebury color-wheel visualization PNG.

Input selection (one of):
  --pairs LIST.txt     two image paths per line (whitespace-separated)
  --dir DIR            KITTI-style directory: every ``*_10.png`` pairs
                       with its ``*_11.png`` sibling
  --img1 A --img2 B    a single pair

All frames in a run must share one resolution (static shapes; resize
upstream if needed).
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Batch optical-flow inference on TPU")
    p.add_argument("--flownet", default="RAFT",
                   help="model ID (models.registry.fetch_model)")
    p.add_argument("--pretrained", default=None,
                   help="checkpoint path (.pth/.pth.tar/.msgpack); random "
                        "init when omitted")
    p.add_argument("--pairs", default=None,
                   help="text file: two image paths per line")
    p.add_argument("--dir", dest="pair_dir", default=None,
                   help="directory of KITTI-style *_10.png / *_11.png pairs")
    p.add_argument("--img1", default=None)
    p.add_argument("--img2", default=None)
    p.add_argument("--output_dir", default="flow_out")
    p.add_argument("--save", default="flo",
                   help="comma list of output formats: flo, png (KITTI "
                        "16-bit), viz (color wheel)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--devices", type=int, default=1,
                   help="data-parallel mesh size (must divide batch_size)")
    p.add_argument("--pad_mode", default="kitti", choices=["kitti", "sintel"],
                   help="InputPadder rule: kitti pads top+right-ish, "
                        "sintel symmetric")
    p.add_argument("--prefetch_threads", type=int, default=4)
    return p


def collect_pairs(args) -> list:
    """[(img1_path, img2_path, output_stem), ...] from the CLI selection."""
    if args.pairs:
        out = []
        with open(args.pairs) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    stem = os.path.splitext(os.path.basename(parts[0]))[0]
                    out.append((parts[0], parts[1], stem))
        return out
    if args.pair_dir:
        out = []
        for p1 in sorted(glob.glob(os.path.join(args.pair_dir, "*_10.png"))):
            p2 = p1[: -len("_10.png")] + "_11.png"
            if os.path.exists(p2):
                stem = os.path.splitext(os.path.basename(p1))[0][:-3]
                out.append((p1, p2, stem))
        return out
    if args.img1 and args.img2:
        stem = os.path.splitext(os.path.basename(args.img1))[0]
        return [(args.img1, args.img2, stem)]
    raise SystemExit("need --pairs, --dir, or --img1/--img2")


def _dedup_stems(pairs: list) -> list:
    """Disambiguate duplicate output stems (same basename, different dirs)
    by appending the pair index — otherwise later pairs silently overwrite
    earlier outputs."""
    seen: dict = {}
    for _, _, stem in pairs:
        seen[stem] = seen.get(stem, 0) + 1
    if all(v == 1 for v in seen.values()):
        return pairs
    dupes = {s for s, v in seen.items() if v > 1}
    return [
        (p1, p2, f"{stem}_{i:06d}" if stem in dupes else stem)
        for i, (p1, p2, stem) in enumerate(pairs)
    ]


def _writers(formats):
    from ..flowviz import flowlib, io as fio

    def write(stem_path, flow):
        if "flo" in formats:
            fio.write_flo(stem_path + ".flo", flow)
        if "png" in formats:
            fio.write_flow_png(
                stem_path + "_flow.png", flow,
                np.ones(flow.shape[:2], np.float32),
            )
        if "viz" in formats:
            import cv2

            img = flowlib.flow_to_image(flow)
            cv2.imwrite(stem_path + "_viz.png", img[..., ::-1])

    return write


def main(argv=None):
    args = build_parser().parse_args(argv)
    pairs = _dedup_stems(collect_pairs(args))
    if not pairs:
        raise SystemExit("no input pairs found")
    if args.batch_size % args.devices:
        raise SystemExit("--devices must divide --batch_size")
    formats = {f.strip() for f in args.save.split(",") if f.strip()}
    unknown = formats - {"flo", "png", "viz"}
    if unknown:
        raise SystemExit(f"unknown --save formats: {sorted(unknown)}")
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from ..data.loader import pad_batch
    from ..models import fetch_model
    from ..native.loader import PrefetchLoader
    from ..ops.interp import remove_pad
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(args.flownet, pretrained_path=args.pretrained)

    if args.devices > 1:
        from ..parallel import make_mesh, replicate, shard_predict

        mesh = make_mesh(args.devices)
        pfn = shard_predict(model.predict_fn, mesh)
        variables = replicate(mesh, model.variables)
        ctx = mesh
    else:
        import contextlib

        pfn = jax.jit(model.predict_fn)
        variables = model.variables
        ctx = contextlib.nullcontext()

    write = _writers(formats)
    loader = PrefetchLoader(
        [(p1, p2) for p1, p2, _ in pairs],
        n_threads=args.prefetch_threads, strict=False,
    )
    stems = [s for _, _, s in pairs]

    t0 = time.time()
    done = 0
    buf1, buf2 = [], []
    shape = None
    bs = args.batch_size

    def flush():
        nonlocal done
        if not buf1:
            return
        n_real = len(buf1)
        while len(buf1) < bs:   # static batch: repeat the last sample
            buf1.append(buf1[-1])
            buf2.append(buf2[-1])
        if buf1[0].dtype == np.uint8:
            # one-pass native u8 -> [0,1] f32 + replicate pad (OpenMP;
            # numpy fallback inside the wrapper)
            from ..native import batch_u8_to_float01_pad
            from ..ops.interp import compute_pad

            h0, w0 = buf1[0].shape[:2]
            t, b, l, r = compute_pad(
                h0, w0, mode=args.pad_mode, multiple=model.size_multiple)
            oh, ow = h0 + t + b, w0 + l + r
            img1 = batch_u8_to_float01_pad(np.stack(buf1), oh, ow, t, l)
            img2 = batch_u8_to_float01_pad(np.stack(buf2), oh, ow, t, l)
            pad = (t, b, l, r)
        else:
            # scale by the integer dtype's max (16-bit PNGs decode as u16;
            # dividing those by 255 would feed the model values up to ~257)
            dt = buf1[0].dtype
            scale = float(np.iinfo(dt).max) if np.issubdtype(
                dt, np.integer) else 255.0
            img1 = np.stack(buf1).astype(np.float32) / scale
            img2 = np.stack(buf2).astype(np.float32) / scale
            img1, img2, _, _, pad = pad_batch(
                img1, img2, None, None,
                multiple=model.size_multiple, mode=args.pad_mode,
            )
        with ctx:
            flow = pfn(variables, jnp.asarray(img1), jnp.asarray(img2))
        flow = np.asarray(remove_pad(flow, pad))
        for i in range(n_real):
            write(os.path.join(args.output_dir, stems[done + i]), flow[i])
        done += n_real
        buf1.clear()
        buf2.clear()

    for im1, im2 in loader:
        if im1 is None or im2 is None:
            raise SystemExit("undecodable input image")
        if im1.ndim == 2:
            im1 = np.stack([im1] * 3, -1)
        if im2.ndim == 2:
            im2 = np.stack([im2] * 3, -1)
        if shape is None:
            shape = im1.shape
        if im1.shape != shape or im2.shape != shape:
            raise SystemExit(
                f"all frames must share one resolution (static shapes): "
                f"got {im1.shape} after {shape}"
            )
        buf1.append(im1[..., :3])
        buf2.append(im2[..., :3])
        if len(buf1) == bs:
            flush()
    flush()

    dt = time.time() - t0
    print(
        f"{done} pairs -> {args.output_dir} "
        f"[{','.join(sorted(formats))}] in {dt:.2f}s "
        f"({done / dt:.2f} pairs/s incl. decode+compile)"
    )
    return done


if __name__ == "__main__":
    main()
