"""Training losses (reference: training/utils.py:68-222).

``sequence_loss`` — RAFT-style L1 over the per-iteration prediction list
with gamma^(N-1-i) weighting and the valid & |gt|<MAX_FLOW mask.
``multiscale_epe`` — FlowNetC/PWC-style per-scale EPE against area-resized
GT with either the classic [0.005, 0.01, 0.02, 0.08, 0.32] weights or
gamma^i.

NHWC: flow tensors are (B, H, W, 2), valid is (B, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_FLOW = 400.0


def _area_matrix(src: int, dst: int):
    """(dst, src) row-averaging matrix of torch adaptive average pooling:
    output i averages input rows [floor(i*src/dst), ceil((i+1)*src/dst))."""
    import numpy as np

    m = np.zeros((dst, src), np.float32)
    for i in range(dst):
        s = (i * src) // dst
        e = -((-(i + 1) * src) // dst)
        m[i, s:e] = 1.0 / (e - s)
    return jnp.asarray(m)


def _area_resize(flow: Array, h: int, w: int) -> Array:
    """torch F.interpolate(mode="area") == adaptive average pooling with
    VARIABLE bins (bin i spans [floor(i*H/h), ceil((i+1)*H/h))), exact for
    non-divisible sizes too — a fixed-block crop deviates by up to ~0.06
    at the coarse FlowNet scales when H % h != 0.  Separable matrices keep
    it on the MXU; HIGHEST precision because this feeds the loss."""
    B, H, W, C = flow.shape
    if (H, W) == (h, w):
        return flow
    prec = jax.lax.Precision.HIGHEST
    my = _area_matrix(H, h)
    mw = _area_matrix(W, w)
    x = jnp.einsum("hH,bHWc->bhWc", my, flow, precision=prec)
    return jnp.einsum("wW,bhWc->bhwc", mw, x, precision=prec)


def _masked_mean(x: Array, keep: Array) -> Array:
    keep = keep.astype(x.dtype)
    return jnp.sum(x * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def _nanmean(x: Array) -> Array:
    """Mean over non-NaN elements (torch ``x[~isnan(x)].mean()``,
    utils.py:119-126/204-210); 0 when every element is NaN."""
    m = jnp.logical_not(jnp.isnan(x))
    return jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(
        jnp.sum(m.astype(x.dtype)), 1.0
    )


def _keep_mask(flow_gt: Array, valid: Array, max_flow: float) -> Array:
    """valid & |gt|<max_flow.  ``not_excluding`` in the reference is a dead
    no-op — it re-applies ``>= 0.5`` to the already-combined boolean mask
    (utils.py:88-91, 173-176) — so it is accepted but has no effect here
    either, for strict parity."""
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    return (valid >= 0.5) & (mag < max_flow)


def sequence_loss(
    flow_preds: list[Array],
    flow_gt: Array,
    valid: Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
    flownetc: bool = False,
    pwc: bool = False,
    not_excluding: bool = False,
    div_flow: float = 1.0,
    flownetc_weighing: bool = False,
    packed: bool = False,
):
    """training/utils.py:148-222.  Returns (loss, metrics dict).

    ``packed``: flow_preds are RAFT packed-upsample tensors
    (B, H/8, W/8, 128) from ``RAFT(..., packed_train=True)``; the GT and
    masks are packed once (``models.raft_model.pack_fullres``) and every
    per-iteration term is computed at 1/8 spatial resolution over
    128-lane channels — the same scalar arithmetic on the same elements
    in a different summation order (float reassociation only; pinned by
    tests/test_training.py::test_packed_sequence_loss_matches_plain)."""
    if packed:
        return _sequence_loss_packed(flow_preds, flow_gt, valid, gamma,
                                     max_flow)
    n = len(flow_preds)
    if div_flow > 1:
        flow_gt = flow_gt / div_flow

    keep = _keep_mask(flow_gt, valid, max_flow)

    loss = 0.0
    classic_w = [0.005, 0.01, 0.02, 0.08, 0.32]
    for i, pred in enumerate(flow_preds):
        if flownetc or pwc:
            h, w = pred.shape[1:3]
            scale = jnp.asarray(
                [w / flow_gt.shape[2], h / flow_gt.shape[1]], pred.dtype
            )
            gt_s = _area_resize(flow_gt, h, w) * scale
            i_loss = jnp.abs(pred - gt_s)
            # The reference's weight ternary here checks flowNetC ALONE
            # (utils.py:186-189): PWC without flownetc gets the RAFT-style
            # gamma^(n-1-i), even though it takes the scaled-GT branch.
            if flownetc_weighing:
                weight = classic_w[i]
            elif flownetc:
                weight = gamma ** i
            else:
                weight = gamma ** (n - i - 1)
            loss = loss + weight * _nanmean(i_loss)
        else:
            i_loss = jnp.abs(pred - flow_gt)
            weight = gamma ** (n - i - 1)
            loss = loss + weight * jnp.mean(
                keep[..., None].astype(i_loss.dtype) * i_loss
            )

    # EPE metrics on the final (RAFT) / first (FlowNetC-style) prediction
    if flownetc or pwc:
        h, w = flow_preds[0].shape[1:3]
        scale = jnp.asarray(
            [w / flow_gt.shape[2], h / flow_gt.shape[1]], flow_preds[0].dtype
        )
        gt_s = _area_resize(flow_gt, h, w) * scale
        epe = jnp.sqrt(jnp.sum((flow_preds[0] - gt_s) ** 2, axis=-1))
        epe_mask = jnp.ones_like(epe, bool)
    else:
        epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
        epe_mask = keep

    metrics = {
        "epe": _masked_mean(epe, epe_mask),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), epe_mask),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), epe_mask),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), epe_mask),
    }
    return loss, metrics


def _sequence_loss_packed(flow_preds, flow_gt, valid, gamma, max_flow):
    """RAFT sequence loss in the packed 1/8-res layout (see sequence_loss
    docstring).  flow_gt (B, H, W, 2) / valid (B, H, W) are full-res."""
    from ..models.raft_model import pack_fullres

    n = len(flow_preds)
    keep = _keep_mask(flow_gt, valid, max_flow)           # (B, H, W)
    gt_p = pack_fullres(flow_gt)                          # (B, h, w, 128)
    keep64 = pack_fullres(keep[..., None].astype(jnp.float32))
    keep_p = jnp.repeat(keep64, 2, axis=-1)               # dup over c

    loss = 0.0
    for i, pred in enumerate(flow_preds):
        i_loss = jnp.abs(pred.astype(jnp.float32) - gt_p)
        weight = gamma ** (n - i - 1)
        loss = loss + weight * jnp.mean(keep_p * i_loss)

    d2 = (flow_preds[-1].astype(jnp.float32) - gt_p) ** 2
    epe = jnp.sqrt(d2[..., 0::2] + d2[..., 1::2])         # (B, h, w, 64)
    epe_mask = keep64 >= 0.5
    metrics = {
        "epe": _masked_mean(epe, epe_mask),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), epe_mask),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), epe_mask),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), epe_mask),
    }
    return loss, metrics


def multiscale_epe(
    flow_preds: list[Array],
    flow_gt: Array,
    valid: Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
    flownetc: bool = False,
    pwc: bool = False,
    not_excluding: bool = False,
    div_flow: float = 1.0,
    flownetc_weighing: bool = False,
):
    """training/utils.py:68-145: per-scale sqrt-sum-squared EPE maps against
    area-interpolated (NOT u/v-rescaled for the epe metric, rescaled for the
    loss) ground truth."""
    n = len(flow_preds)
    eps = 1e-5
    if div_flow > 1:
        flow_gt = flow_gt / div_flow

    keep = _keep_mask(flow_gt, valid, max_flow)

    loss = 0.0
    classic_w = [0.005, 0.01, 0.02, 0.08, 0.32]
    for i, pred in enumerate(flow_preds):
        if flownetc or pwc:
            h, w = pred.shape[1:3]
            scale = jnp.asarray(
                [w / flow_gt.shape[2], h / flow_gt.shape[1]], pred.dtype
            )
            gt_s = _area_resize(flow_gt, h, w) * scale
            epe_map = jnp.sqrt(jnp.sum((pred - gt_s) ** 2, axis=-1) + eps)
            # Unlike sequence_loss, the reference ternary here checks
            # ``flowNetC or pwc`` (utils.py:103-105): gamma^i for both.
            weight = classic_w[i] if flownetc_weighing else gamma ** i
            loss = loss + weight * _nanmean(epe_map)
        else:
            i_loss = jnp.abs(pred - flow_gt)
            weight = gamma ** (n - i - 1)
            loss = loss + weight * jnp.mean(
                keep[..., None].astype(i_loss.dtype) * i_loss
            )

    if flownetc or pwc:
        h, w = flow_preds[0].shape[1:3]
        gt_s = _area_resize(flow_gt, h, w)
        epe = jnp.sqrt(jnp.sum((flow_preds[0] - gt_s) ** 2, axis=-1))
        # utils.py:96-97: the multiscale epe metric drops NaNs.
        epe_mask = jnp.logical_not(jnp.isnan(epe))
        epe = jnp.where(epe_mask, epe, 0.0)
    else:
        epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
        epe_mask = keep

    metrics = {
        "epe": _masked_mean(epe, epe_mask),
        "1px": _masked_mean((epe < 1).astype(jnp.float32), epe_mask),
        "3px": _masked_mean((epe < 3).astype(jnp.float32), epe_mask),
        "5px": _masked_mean((epe < 5).astype(jnp.float32), epe_mask),
        "loss": loss,
    }
    return loss, metrics
