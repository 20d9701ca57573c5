"""Batched data loading for TPU (replaces torch DataLoader).

TPU-first design: static padded shapes (pad-to-multiple with valid masks)
so every batch compiles to the same XLA program, shuffled epoch iteration
with a worker thread pool for the host-side decode/augment, and simple
double-buffered prefetch.
"""

from __future__ import annotations

import concurrent.futures
from typing import Iterator, Optional

import numpy as np

from ..ops.interp import compute_pad


def pad_batch(img1, img2, flow, valid, multiple: int = 8, mode: str = "kitti"):
    """Replicate-pad images (and zero-pad flow/valid) to a multiple of
    ``multiple`` — the static-shape replacement for RAFT's InputPadder
    (models/raft/utils/utils.py:7-30)."""
    h, w = img1.shape[1:3]
    t, b, l, r = compute_pad(h, w, mode=mode, multiple=multiple)
    if (t, b, l, r) == (0, 0, 0, 0):
        return img1, img2, flow, valid, (t, b, l, r)
    from ..native import batch_f32_pad

    oh, ow = h + t + b, w + l + r
    img1 = batch_f32_pad(np.asarray(img1, np.float32), oh, ow, t, l)
    img2 = batch_f32_pad(np.asarray(img2, np.float32), oh, ow, t, l)
    if flow is not None:
        flow = batch_f32_pad(np.asarray(flow, np.float32), oh, ow, t, l,
                             zero=True)
    if valid is not None:
        valid = batch_f32_pad(
            np.asarray(valid, np.float32)[..., None], oh, ow, t, l,
            zero=True)[..., 0]
    return img1, img2, flow, valid, (t, b, l, r)


class DataLoader:
    """Minimal shuffled, batched, threaded loader over an indexable dataset
    yielding dict batches of stacked numpy arrays."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        pad_multiple: Optional[int] = None,
        pad_mode: str = "kitti",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.pad_multiple = pad_multiple
        self.pad_mode = pad_mode

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples):
        img1 = np.stack([s[0] for s in samples])
        img2 = np.stack([s[1] for s in samples])
        flow = np.stack([s[2] for s in samples])
        valid = np.stack([s[3] for s in samples])
        pad = (0, 0, 0, 0)
        if self.pad_multiple:
            img1, img2, flow, valid, pad = pad_batch(
                img1, img2, flow, valid, self.pad_multiple, self.pad_mode
            )
        return {
            "image1": img1 / 255.0,
            "image2": img2 / 255.0,
            "flow": flow,
            "valid": valid,
            "pad": pad,
        }

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            for idxs in batches:
                yield self._collate([self.dataset[i] for i in idxs])
            return

        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            # double-buffered prefetch: per-sample futures (no nested pool
            # usage — a batch-level task map()ing on the same pool deadlocks)
            def submit(idxs):
                return [pool.submit(self.dataset.__getitem__, i) for i in idxs]

            pending = submit(batches[0]) if batches else None
            for idxs in batches[1:]:
                nxt = submit(idxs)
                yield self._collate([f.result() for f in pending])
                pending = nxt
            if pending is not None:
                yield self._collate([f.result() for f in pending])
