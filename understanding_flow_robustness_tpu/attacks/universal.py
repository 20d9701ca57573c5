"""Universal perturbation trainer (reference:
global_attacks/universal_perturbation.py:161-726).

A single shared two-frame perturbation pair is optimized over a dataset:
per batch, n-step I-FGSM *descent* toward target = -clean_flow (or ascent
toward a gaussian-noised clean flow with --add_gaussian), the accumulated
noise clamped to the eps-ball each step (:452-530).  The inner n-step loop
is one jitted ``lax.fori_loop``; the epoch loop and checkpointing stay on
host (per-epoch perturbations saved like :348).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .losses import flow_attack_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UniversalConfig:
    perturb_method: str = "ifgsm"     # ifgsm | ifgm
    perturb_mode: str = "both"
    output_norm: float = 0.02
    n_step: int = 40
    learning_rate: float = 2e-3
    flow_loss: str = "l2"
    add_gaussian: bool = False        # ascent with noisy target


def make_universal_attack_step(predict: Callable, cfg: UniversalConfig):
    """Jitted inner attack: (img0, img1, noise0, noise1, target) ->
    (adv0, adv1, new_noise0, new_noise1)."""
    # reference dispatch (universal_perturbation.py:477-500): substring
    # match — so e.g. "mifgsm" runs the sign path there too — exact
    # "ifgm" for raw gradients, anything else rejected
    use_sign = "ifgsm" in cfg.perturb_method
    if not use_sign and cfg.perturb_method != "ifgm":
        raise NotImplementedError(
            f"universal perturbation method: {cfg.perturb_method}")
    if cfg.perturb_mode not in ("both", "left", "right"):
        raise ValueError(f"Invalid perturbation mode: {cfg.perturb_mode}")
    m0 = 0.0 if cfg.perturb_mode == "right" else 1.0
    m1 = 0.0 if cfg.perturb_mode == "left" else 1.0
    descent = not cfg.add_gaussian
    eps = cfg.output_norm

    def loss_fn(adv0, adv1, target):
        return flow_attack_loss(predict(adv0, adv1), target, cfg.flow_loss)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1))

    @jax.jit
    def attack(img0, img1, noise0, noise1, target):
        adv0 = jnp.clip(img0 + noise0, 0.0, 1.0)
        adv1 = jnp.clip(img1 + noise1, 0.0, 1.0)

        def body(_, carry):
            adv0, adv1 = carry
            g0, g1 = grad_fn(adv0, adv1, target)
            if use_sign:
                g0, g1 = jnp.sign(g0), jnp.sign(g1)
            step0 = cfg.learning_rate * g0 * m0
            step1 = cfg.learning_rate * g1 * m1
            if descent:
                adv0 = jnp.clip(adv0 - step0, 0.0, 1.0)
                adv1 = jnp.clip(adv1 - step1, 0.0, 1.0)
            else:
                adv0 = jnp.clip(adv0 + step0, 0.0, 1.0)
                adv1 = jnp.clip(adv1 + step1, 0.0, 1.0)
            n0 = jnp.clip(adv0 - img0, -eps, eps)
            n1 = jnp.clip(adv1 - img1, -eps, eps)
            return img0 + n0, img1 + n1

        adv0, adv1 = lax.fori_loop(0, cfg.n_step, body, (adv0, adv1))
        return adv0, adv1, adv0 - img0, adv1 - img1

    return attack


def train_universal_perturbation(
    predict_jit,
    attack_step,
    batches,
    image_shape,
    cfg: UniversalConfig,
    epochs: int = 1,
    epoch_size: int = 0,
    save_dir: str | None = None,
    rng: np.random.RandomState | None = None,
    on_epoch_end: Callable | None = None,
    on_batch_end: Callable | None = None,
    logger=None,
):
    """Epoch loop (universal_perturbation.py:354-449): the perturbation pair
    persists across batches; per-epoch snapshots go to
    ``save_dir/perturbations/epoch_N.npy``.  ``on_batch_end(tgt, ref,
    noise0, noise1)`` mirrors the reference's per-iteration TensorBoard
    dumps (:399-442); ``logger`` is an optional TermLogger whose train bar
    is advanced per batch (:445-446)."""
    rng = rng or np.random.RandomState(0)
    noise0 = jnp.zeros(image_shape, jnp.float32)
    noise1 = jnp.zeros(image_shape, jnp.float32)

    for epoch in range(epochs):
        if logger is not None:
            logger.epoch_bar.update(epoch)
            logger.reset_train_bar()
        for i, (tgt, ref_future) in enumerate(batches()):
            tgt = jnp.asarray(tgt, jnp.float32)
            ref_future = jnp.asarray(ref_future, jnp.float32)
            flow = predict_jit(tgt, ref_future)
            if cfg.add_gaussian:
                target = np.asarray(flow) + rng.randn(*flow.shape).astype(
                    np.float32
                )
            else:
                target = -1.0 * np.asarray(flow)
            _, _, noise0, noise1 = attack_step(
                tgt, ref_future, noise0, noise1, jnp.asarray(target)
            )
            if on_batch_end is not None:
                on_batch_end(tgt, ref_future, noise0, noise1)
            if logger is not None:
                logger.train_bar.update(i + 1)
            if epoch_size and i >= epoch_size - 1:
                break
        if save_dir is not None:
            d = os.path.join(save_dir, "perturbations")
            os.makedirs(d, exist_ok=True)
            np.save(
                os.path.join(d, f"epoch_{epoch}.npy"),
                np.stack([np.asarray(noise0), np.asarray(noise1)], axis=1),
            )
        if on_epoch_end is not None:
            on_epoch_end(epoch, np.asarray(noise0), np.asarray(noise1))
    return np.asarray(noise0), np.asarray(noise1)
