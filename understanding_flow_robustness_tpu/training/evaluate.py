"""Validation + benchmark submissions (reference: training/evaluate.py).

``validate_chairs/sintel/kitti`` with the reference metrics (EPE, 1/3/5px,
KITTI F1 = EPE > 3px AND EPE/mag > 0.05, evaluate.py:374-389) and the
Sintel (warm-start) / KITTI submission writers (:200-267).  Models come in
as FlowModel bundles (models.registry); RAFT runs at x255 + test_mode and
FlowNet-family at [0,1] native, like the reference's flowNetC branches.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import pad_batch
from ..flowviz import write_flo, write_flow_png
from ..ops.interp import remove_pad


def _predict_padded(model, img1, img2, mode="sintel"):
    """Pad to the model's size multiple, predict, unpad.  Images [0,1]."""
    img1, img2, _, _, pad = pad_batch(
        img1, img2, None, None, multiple=model.size_multiple, mode=mode
    )
    flow = model.predict(jnp.asarray(img1), jnp.asarray(img2))
    return np.asarray(remove_pad(flow, pad))


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Warm-start propagation (models/raft/utils/utils.py:33-60): scatter
    the flow forward and fill holes by nearest-neighbor griddata."""
    from scipy import interpolate

    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    flow_x = interpolate.griddata(
        (x1[valid], y1[valid]), dxf[valid], (x0, y0), method="nearest",
        fill_value=0,
    )
    flow_y = interpolate.griddata(
        (x1[valid], y1[valid]), dyf[valid], (x0, y0), method="nearest",
        fill_value=0,
    )
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)


def validate_chairs(model, dataset) -> dict:
    """evaluate.py:271-296."""
    epe_list = []
    for i in range(len(dataset)):
        img1, img2, flow_gt, _ = dataset[i]
        flow = _predict_padded(model, img1[None] / 255.0, img2[None] / 255.0)
        epe = np.sqrt(np.sum((flow[0] - flow_gt) ** 2, axis=-1))
        epe_list.append(epe.reshape(-1))
    epe = float(np.mean(np.concatenate(epe_list)))
    print(f"Validation Chairs EPE: {epe:.3f}")
    return {"chairs": epe}


def validate_sintel(model, dataset_fn) -> dict:
    """evaluate.py:299-345.  dataset_fn(dstype) -> dataset."""
    results = {}
    for dstype in ["clean", "final"]:
        dataset = dataset_fn(dstype)
        epe_list = []
        for i in range(len(dataset)):
            img1, img2, flow_gt, _ = dataset[i]
            flow = _predict_padded(
                model, img1[None] / 255.0, img2[None] / 255.0, mode="sintel"
            )
            epe = np.sqrt(np.sum((flow[0] - flow_gt) ** 2, axis=-1))
            epe_list.append(epe.reshape(-1))
        epe_all = np.concatenate(epe_list)
        print(
            "Validation (%s) EPE: %f, 1px: %f, 3px: %f, 5px: %f"
            % (dstype, epe_all.mean(), (epe_all < 1).mean(),
               (epe_all < 3).mean(), (epe_all < 5).mean())
        )
        results[dstype] = float(epe_all.mean())
    return results


def validate_kitti(model, dataset, mesh=None) -> dict:
    """evaluate.py:348-392: EPE + F1 (outlier = EPE>3 AND EPE/mag>0.05,
    :381) over valid pixels.

    With ``mesh``, samples are padded to a common geometry and evaluated
    in mesh-sized batches sharded over the ``data`` axis — the multi-chip
    analog of the reference's DataParallel eval wrap
    (training/evaluate.py:410).  Per-sample metrics are identical: padding
    uses each sample's own replicate-pad and is cropped off before
    scoring.
    """
    if mesh is not None:
        return _validate_kitti_sharded(model, dataset, mesh)
    out_list, epe_list = [], []
    for i in range(len(dataset)):
        img1, img2, flow_gt, valid_gt = dataset[i]
        flow = _predict_padded(
            model, img1[None] / 255.0, img2[None] / 255.0, mode="kitti"
        )[0]
        epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
        mag = np.sqrt(np.sum(flow_gt ** 2, axis=-1))
        val = valid_gt >= 0.5
        out = (epe > 3.0) & ((epe / np.maximum(mag, 1e-9)) > 0.05)
        epe_list.append(epe[val].mean())
        out_list.append(out[val])
    epe = float(np.mean(epe_list))
    f1 = 100 * float(np.mean(np.concatenate(out_list)))
    print(f"Validation KITTI: {epe:.6f}, {f1:.6f}")
    return {"kitti-epe": epe, "kitti-f1": f1}


def _validate_kitti_sharded(model, dataset, mesh) -> dict:
    """Mesh-batched KITTI validation.  Samples are replicate-padded to one
    common geometry so they batch (KITTI frames differ by a few pixels);
    models see slightly more padded context than the per-sample-padded
    sequential path, the same trade the reference makes whenever it crops
    or batches for DataParallel.  Scoring crops the pad off first."""
    from ..ops.interp import apply_pad
    from ..parallel.mesh import shard_predict

    n_dev = mesh.devices.size
    pjit = shard_predict(model.predict_fn, mesh)

    # common padded geometry over the whole set (KITTI frames differ by a
    # few pixels; replicate-pad per sample, crop before scoring).  Read
    # dimensions from the PNG headers when the dataset exposes its file
    # list — decoding all 200 samples just for shapes doubles the sharded
    # path's I/O (everything is decoded again in the main loop).
    if hasattr(dataset, "image_list") and dataset.image_list:
        from PIL import Image

        sizes = []
        for pair in dataset.image_list:
            with Image.open(pair[0]) as im:   # header-only, lazy decode
                sizes.append((im.height, im.width))
        # the shortcut assumes __getitem__ returns images at file
        # resolution (true for the KITTI validation sets: aug_params=None,
        # no resize) — cross-check the first sample and fall back to full
        # decode if some future dataset rescales in __getitem__
        if sizes and tuple(dataset[0][0].shape[:2]) != tuple(sizes[0]):
            sizes = [dataset[i][0].shape[:2] for i in range(len(dataset))]
    else:
        sizes = [dataset[i][0].shape[:2] for i in range(len(dataset))]
    max_h = max(s[0] for s in sizes)
    max_w = max(s[1] for s in sizes)
    pad_h = max_h + (-max_h) % max(model.size_multiple, 1)
    pad_w = max_w + (-max_w) % max(model.size_multiple, 1)

    out_list, epe_list = [], []
    for s0 in range(0, len(dataset), n_dev):
        idxs = list(range(s0, min(s0 + n_dev, len(dataset))))
        batch1, batch2, metas = [], [], []
        for i in idxs:
            img1, img2, flow_gt, valid_gt = dataset[i]
            h, w = img1.shape[:2]
            # kitti-mode pad (bottom/right-ish) to the common geometry
            pad = (0, pad_h - h, (pad_w - w) // 2,
                   pad_w - w - (pad_w - w) // 2)
            batch1.append(np.asarray(apply_pad(
                jnp.asarray(img1[None] / 255.0), pad))[0])
            batch2.append(np.asarray(apply_pad(
                jnp.asarray(img2[None] / 255.0), pad))[0])
            metas.append((pad, flow_gt, valid_gt))
        while len(batch1) < n_dev:  # ragged tail: replicate last sample
            batch1.append(batch1[-1])
            batch2.append(batch2[-1])
        flows = np.asarray(pjit(
            model.variables,
            jnp.asarray(np.stack(batch1), jnp.float32),
            jnp.asarray(np.stack(batch2), jnp.float32),
        ))
        for k, (pad, flow_gt, valid_gt) in enumerate(metas):
            t, b, l, r = pad
            H, W = flows[k].shape[:2]
            flow = flows[k][t: H - b, l: W - r]
            epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
            mag = np.sqrt(np.sum(flow_gt ** 2, axis=-1))
            val = valid_gt >= 0.5
            out = (epe > 3.0) & ((epe / np.maximum(mag, 1e-9)) > 0.05)
            epe_list.append(epe[val].mean())
            out_list.append(out[val])
    epe = float(np.mean(epe_list))
    f1 = 100 * float(np.mean(np.concatenate(out_list)))
    print(f"Validation KITTI ({n_dev}-device mesh): {epe:.6f}, {f1:.6f}")
    return {"kitti-epe": epe, "kitti-f1": f1}


def create_sintel_submission(model, dataset_fn, output_path="sintel_submission",
                             warm_start: bool = False):
    """evaluate.py:200-240: .flo files per scene/frame with optional
    warm-start flow propagation (RAFT only)."""
    # jit the RAFT forward ONCE per warm-start mode: un-jitted apply would
    # dispatch the full 32-iteration graph op-by-op for every one of the
    # ~1100 frames per pass (variables stay a traced argument, see
    # FlowModel.predict)
    @jax.jit
    def _raft_cold(variables, i1, i2):
        return model.module.apply(variables, i1 * 255.0, i2 * 255.0,
                                  test_mode=True)

    @jax.jit
    def _raft_warm(variables, i1, i2, flow_init):
        return model.module.apply(variables, i1 * 255.0, i2 * 255.0,
                                  test_mode=True, flow_init=flow_init)

    for dstype in ["clean", "final"]:
        dataset = dataset_fn(dstype)
        flow_prev, sequence_prev = None, None
        for i in range(len(dataset)):
            img1, img2, (sequence, frame) = dataset[i]
            if sequence != sequence_prev:
                flow_prev = None
            img1b = img1[None] / 255.0
            img2b = img2[None] / 255.0
            img1b, img2b, _, _, pad = pad_batch(
                img1b, img2b, None, None, multiple=model.size_multiple,
                mode="sintel",
            )
            if model.is_raft:
                if flow_prev is not None and warm_start:
                    flow_low, flow_pr = _raft_warm(
                        model.variables, jnp.asarray(img1b),
                        jnp.asarray(img2b), jnp.asarray(flow_prev[None]),
                    )
                else:
                    flow_low, flow_pr = _raft_cold(
                        model.variables, jnp.asarray(img1b),
                        jnp.asarray(img2b),
                    )
                if warm_start:
                    flow_prev = forward_interpolate(np.asarray(flow_low[0]))
            else:
                flow_pr = model.predict(jnp.asarray(img1b), jnp.asarray(img2b))
            flow = np.asarray(remove_pad(flow_pr, pad))[0]
            output_dir = os.path.join(output_path, dstype, str(sequence))
            os.makedirs(output_dir, exist_ok=True)
            write_flo(
                os.path.join(output_dir, "frame%04d.flo" % (frame + 1)), flow
            )
            sequence_prev = sequence


def create_kitti_submission(model, dataset, output_path="kitti_submission"):
    """evaluate.py:243-267: 16-bit KITTI flow PNGs."""
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(dataset)):
        img1, img2, extra = dataset[i]
        frame_id = extra[0] if isinstance(extra, (list, tuple)) else extra
        flow = _predict_padded(
            model, img1[None] / 255.0, img2[None] / 255.0, mode="kitti"
        )[0]
        write_flow_png(os.path.join(output_path, frame_id), flow)
