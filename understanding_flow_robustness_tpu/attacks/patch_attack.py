"""Universal adversarial patch optimization (reference: patch_attacks/main.py).

The reference's inner loop (:523-613) does per-step host round-trips; here
the composite + forward + loss + gradient + patch update + re-composite loop
runs as ONE jitted ``lax.while_loop``: it iterates while
``loss > 0.1 and count <= max_count`` exactly like the reference, entirely
on device.  The host only does patch placement (numpy, attacks/patch.py)
and the epoch loop.

Loss (main.py:546-575): L2 ``sqrt(sum((flow - target)^2) + 1e-8).mean()`` or
``(1 - cossim).mean()`` against ``target = -clean_flow``, plus an
``alpha``-weighted L1 patch regularizer toward the initial patch; update
``patch -= clamp(0.5 * lr * (g_tgt + g_future), -2, 2)``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .losses import compute_cossim, compute_epe, cosine_similarity
from .patch import circle_transform, extract_patch, rezoom_to, square_transform

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PatchAttackConfig:
    lr: float = 100.0            # patch_attacks/main.py default --lr 1e2
    alpha: float = 0.0           # patch regularizer weight
    max_count: int = 2
    l2: bool = False             # loss: l2 if True else cossim
    loss_threshold: float = 0.1
    image_clip: tuple[float, float] = (0.0, 1.0)


def make_patch_attack_step(predict: Callable, cfg: PatchAttackConfig,
                           takes_variables: bool = False):
    """Build the jitted inner attack (main.py:523-613).

    predict(img1, img2) -> flow at GT resolution; with
    ``takes_variables=True``, predict(variables, img1, img2) and the
    returned ``attack`` takes ``variables`` as a trailing TRACED argument —
    closing over a large model's params would bake them into the HLO as
    inline constants (FlowModel.predict_fn's contract; see PERF.md
    "Program size").
    Inputs: tgt/ref_future images, patch/mask/init canvases (all NHWC
    full-image), target flow.  Returns (adv_tgt, adv_ref_future,
    patch_canvas, final_loss, n_steps).
    """

    def loss_fn(adv_tgt, adv_ref_future, target, mask, patch, patch_init,
                variables=None):
        if takes_variables:
            flow = predict(variables, adv_tgt, adv_ref_future)
        else:
            flow = predict(adv_tgt, adv_ref_future)
        if cfg.l2:
            loss_data = jnp.mean(
                jnp.sqrt(jnp.sum((flow - target) ** 2, axis=-1) + 1e-8)
            )
        else:
            loss_data = jnp.mean(1.0 - cosine_similarity(flow, target))
        loss_reg = jnp.mean(jnp.abs(mask * patch - mask * patch_init))
        return (1 - cfg.alpha) * loss_data + cfg.alpha * loss_reg

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))
    lo, hi = cfg.image_clip

    @jax.jit
    def attack(tgt, ref_future, patch, mask, patch_init, target,
               variables=None):
        def composite(p):
            adv_tgt = (1 - mask) * tgt + mask * p
            adv_ref = (1 - mask) * ref_future + mask * p
            return adv_tgt, adv_ref

        def cond(state):
            _, _, _, loss, count = state
            return (loss > cfg.loss_threshold) & (count < cfg.max_count)

        def body(state):
            adv_tgt, adv_ref, patch, _, count = state
            loss, (g_tgt, g_ref) = grad_fn(
                adv_tgt, adv_ref, target, mask, patch, patch_init, variables
            )
            patch = patch - jnp.clip(
                0.5 * cfg.lr * (g_tgt + g_ref), -2.0, 2.0
            )
            # main.py:585-605: the composite is clamped AFTER each update;
            # the initial composite below stays unclamped (main.py:536-541).
            adv_tgt, adv_ref = composite(patch)
            adv_tgt = jnp.clip(adv_tgt, lo, hi)
            adv_ref = jnp.clip(adv_ref, lo, hi)
            return adv_tgt, adv_ref, patch, loss, count + 1

        adv_tgt0, adv_ref0 = composite(patch)
        init = (
            adv_tgt0, adv_ref0, patch,
            jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0),
        )
        adv_tgt, adv_ref, patch, loss, count = lax.while_loop(
            cond, body, init
        )
        return adv_tgt, adv_ref, patch, loss, count

    return attack


def train_patch_epoch(
    attack_step,
    predict_jit,
    patch: np.ndarray,
    mask: np.ndarray,
    patch_init: np.ndarray,
    patch_shape,
    batches,
    patch_type: str = "circle",
    norotate: bool = False,
    epoch_size: int = 0,
    on_batch=None,
):
    """One optimization epoch over (tgt, ref_future) batches
    (patch_attacks/main.py:345-520): place -> attack -> extract -> re-zoom.

    ``batches`` yields (tgt_img, ref_future_img) NHWC float [0,1] arrays.
    ``on_batch(i, tgt, adv_tgt, patch_canvas, loss)`` mirrors the
    reference's per-iteration TensorBoard dumps gated by
    --training_output_freq (main.py:463-519).
    """
    patch_shape_orig = patch_shape
    for i, (tgt, ref_future) in enumerate(batches):
        flow_pred = predict_jit(jnp.asarray(tgt), jnp.asarray(ref_future))
        target = -1.0 * np.asarray(flow_pred)
        data_shape = tgt.shape

        if patch_type == "circle":
            # margin=1: the reference passes `True` positionally into
            # margin (main.py:378-380)
            pc, mc, ic, rx, ry, patch_shape = circle_transform(
                patch, mask, patch_init, data_shape, patch_shape, margin=1
            )
        else:
            pc, mc, ic, rx, ry = square_transform(
                patch, mask, patch_init, data_shape, patch_shape,
                norotate=norotate,
            )

        adv_tgt, adv_ref, pc_new, loss, count = attack_step(
            jnp.asarray(tgt, jnp.float32),
            jnp.asarray(ref_future, jnp.float32),
            jnp.asarray(pc, jnp.float32),
            jnp.asarray(mc, jnp.float32),
            jnp.asarray(ic, jnp.float32),
            jnp.asarray(target, jnp.float32),
        )

        if on_batch is not None:
            on_batch(i, np.asarray(tgt), np.asarray(adv_tgt),
                     np.asarray(pc_new), float(loss))
        masked = np.asarray(pc_new) * np.asarray(mc)
        patch = extract_patch(masked, rx, ry, patch_shape)
        mask_x = extract_patch(np.asarray(mc), rx, ry, patch_shape)
        init_x = extract_patch(np.asarray(ic), rx, ry, patch_shape)
        patch, mask, patch_init, patch_shape = rezoom_to(
            patch, mask_x, init_x, patch_shape, patch_shape_orig
        )
        if epoch_size and i >= epoch_size - 1:
            break
    return patch, mask, patch_init, patch_shape


def validate_patch(
    predict_jit,
    patch: np.ndarray,
    mask: np.ndarray,
    patch_shape,
    val_samples,
    patch_type: str = "circle",
    norotate: bool = False,
):
    """validate_flow_with_gt (main.py:616-784): per-sample random placement,
    clean vs adversarial EPE/cossim.  val_samples yields
    (ref_past, tgt, ref_future, gt_flow) NHWC numpy with batch dim."""
    sums = np.zeros(4)
    n = 0
    for ref_past, tgt, ref_future, gt_flow in val_samples:
        flow = predict_jit(jnp.asarray(tgt), jnp.asarray(ref_future))
        if patch_type == "circle":
            pc, mc, _, _, _, _ = circle_transform(
                patch, mask, patch.copy(), tgt.shape, patch_shape
            )
        else:
            pc, mc, _, _, _ = square_transform(
                patch, mask, patch.copy(), tgt.shape, patch_shape,
                norotate=norotate,
            )
        adv_tgt = np.clip((1 - mc) * tgt + mc * pc, 0, 1).astype(np.float32)
        adv_ref = np.clip((1 - mc) * ref_future + mc * pc, 0, 1).astype(
            np.float32
        )
        adv_flow = predict_jit(jnp.asarray(adv_tgt), jnp.asarray(adv_ref))

        gt = jnp.asarray(gt_flow)
        sums += np.array([
            float(compute_epe(gt, flow)),
            float(compute_epe(gt, adv_flow)),
            float(compute_cossim(gt, flow)),
            float(compute_cossim(gt, adv_flow)),
        ])
        n += 1
    metrics = sums / max(n, 1)
    return {
        "epe": metrics[0], "adv_epe": metrics[1],
        "cos_sim": metrics[2], "adv_cos_sim": metrics[3],
    }
