"""Flow attack/eval losses (jit-friendly, NHWC).

References: patch_attacks/losses.py:8-59 and
global_attacks/perturb_model.py:38-145.  GT tensors carry an optional third
channel as the valid mask; all reductions follow the reference's
valid-masked-mean convention with eps=1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear

Array = jax.Array

EPSILON = 1e-8


def _upsample_pred(gt: Array, pred: Array) -> Array:
    """Bilinear-resize pred to GT size and scale u, v by the size ratio
    (patch_attacks/losses.py:11-15; torch F.upsample align_corners=False)."""
    h_gt, w_gt = gt.shape[1:3]
    h_pred, w_pred = pred.shape[1:3]
    pred = resize_bilinear(pred, h_gt, w_gt, align_corners=False)
    scale = jnp.asarray([w_gt / w_pred, h_gt / h_pred], pred.dtype)
    return pred * scale


def compute_epe(gt: Array, pred: Array) -> Array:
    """Valid-masked mean end-point error (patch_attacks/losses.py:8-28)."""
    pred = _upsample_pred(gt, pred)
    epe = jnp.sqrt(
        (gt[..., 0] - pred[..., 0]) ** 2 + (gt[..., 1] - pred[..., 1]) ** 2
    )
    if gt.shape[-1] == 3:
        valid = gt[..., 2]
        return jnp.sum(epe * valid) / (jnp.sum(valid) + EPSILON)
    return jnp.mean(epe)


def cosine_similarity(a: Array, b: Array, axis: int = -1,
                      eps: float = 1e-8) -> Array:
    """torch.nn.functional.cosine_similarity semantics."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)


def compute_cossim(gt: Array, pred: Array) -> Array:
    """patch_attacks/losses.py:31-50."""
    pred = _upsample_pred(gt, pred)
    sim = cosine_similarity(gt[..., :2], pred)
    if gt.shape[-1] == 3:
        valid = gt[..., 2]
        return jnp.sum(sim * valid) / (jnp.sum(valid) + EPSILON)
    return jnp.mean(sim)


def compute_l1(gt: Array, pred: Array) -> Array:
    """global_attacks/perturb_model.py:85-99."""
    pred = _upsample_pred(gt, pred)
    l1 = jnp.abs(pred - gt[..., :2])
    # mean over NON-NaN elements only (perturb_model.py:93 indexes with
    # ~isnan); zero-filling before the mean would underestimate by the
    # NaN fraction.  All-NaN input -> 0/0 = NaN, like torch.mean(empty).
    notnan = ~jnp.isnan(l1)
    l1_mean = jnp.sum(jnp.where(notnan, l1, 0.0)) / jnp.sum(notnan)
    if gt.shape[-1] == 3:
        valid = gt[..., 2]
        return jnp.sum(l1_mean * valid) / (jnp.sum(valid) + EPSILON)
    return l1_mean


def multiscale_cossim(gts, preds) -> Array:
    """patch_attacks/losses.py:53-59: sum of -mean cos-sim per scale."""
    loss = 0.0
    for gt, pred in zip(gts, preds):
        loss = loss - jnp.mean(cosine_similarity(gt, pred))
    return loss


def flow_attack_loss(flow_pred: Array, ground_truth: Array,
                     flow_loss: str = "cossim") -> Array:
    """compute_flow_loss (global_attacks/perturb_model.py:102-145): the
    prediction is compared at its native resolution (the caller matches
    GT and prediction sizes, as the attack pipeline does)."""
    gt2 = ground_truth[..., :2]
    if flow_loss == "cossim":
        loss = 1.0 - cosine_similarity(flow_pred, gt2)
    elif flow_loss == "l2":
        loss = jnp.sqrt(jnp.sum((flow_pred - gt2) ** 2, axis=-1) + 1e-7)
    elif flow_loss == "l1":
        loss = jnp.abs(flow_pred - gt2)
    else:
        raise NotImplementedError(flow_loss)

    if ground_truth.shape[-1] == 3:
        valid = ground_truth[..., 2]
        if flow_loss == "l1":
            loss = loss * valid[..., None]
        else:
            loss = loss * valid
        return jnp.sum(loss) / (jnp.sum(valid) + EPSILON)
    return jnp.mean(loss)
