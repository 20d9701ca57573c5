"""Global adversarial attacks as jitted on-device loops.

Replaces global_attacks/perturb_model.py:148-821.  The reference runs each
I-FGSM step as a separate forward+backward with host round-trips; here the
whole n-step attack is ONE jitted ``lax.fori_loop`` with ``jax.grad`` w.r.t.
the input images — the BASELINE "jitted on-device gradient ascent" design.

Methods (global_attacks/global_constants.py:34): fgsm/fgm (one-step sign,
perturb_model.py:423-473), ifgsm/ifgm (n-step iterative with per-step clamp
to image range then to the eps-ball, :475-619), mifgsm/mifgm (momentum 0.47
with L1-normalized grads, :621-757), gaussian (var=(eps/4)^2, :274-330),
uniform (:332-382), none.  Image corruptions live in
attacks/corruptions.py (host-side numpy, like the reference).

``perturb_mode`` ("both"/"left"/"right") selects which frame is attacked;
``targeted`` negates the loss (:452-453).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .losses import flow_attack_loss

Array = jax.Array

# Defaults from global_attacks/global_constants.py:19-61
PERTURB_METHOD = "fgsm"
PERTURB_MODE = "both"
OUTPUT_NORM = 0.02
N_STEP = 40
LEARNING_RATE = 2e-3
MOMENTUM = 0.47


@dataclasses.dataclass(frozen=True)
class PerturbConfig:
    perturb_method: str = PERTURB_METHOD
    perturb_mode: str = PERTURB_MODE
    output_norm: float = OUTPUT_NORM
    n_step: int = N_STEP
    learning_rate: float = LEARNING_RATE
    momentum: float = MOMENTUM
    targeted: bool = False
    flow_loss: str = "cossim"


PredictFn = Callable[[Array, Array], Array]  # (img0, img1 in [0,1]) -> flow


def _mode_mask(mode: str):
    if mode == "both":
        return 1.0, 1.0
    if mode == "left":
        return 1.0, 0.0
    if mode == "right":
        return 0.0, 1.0
    raise ValueError(f"invalid perturbation mode: {mode}")


def _loss_fn(predict: PredictFn, cfg: PerturbConfig):
    sign = -1.0 if cfg.targeted else 1.0

    def loss(img0, img1, ground_truth):
        flow = predict(img0, img1)
        return sign * flow_attack_loss(flow, ground_truth, cfg.flow_loss)

    return loss


def perturb(
    predict: PredictFn,
    image0: Array,
    image1: Array,
    ground_truth: Array,
    cfg: PerturbConfig,
    rng: Array | None = None,
):
    """Run the configured attack.  Returns (noise0, noise1, adv0, adv1),
    with adv images clamped to [0, 1] and noises the final image deltas
    (perturb_model.py:260-272)."""
    method = cfg.perturb_method
    if method in ("fgsm", "fgm"):
        noise0, noise1 = fgsm(predict, image0, image1, ground_truth, cfg)
    elif method in ("ifgsm", "ifgm"):
        noise0, noise1 = ifgsm(predict, image0, image1, ground_truth, cfg)
    elif method in ("mifgsm", "mifgm"):
        noise0, noise1 = mifgsm(predict, image0, image1, ground_truth, cfg)
    elif method == "gaussian":
        noise0, noise1 = gaussian_noise(image0, image1, cfg, rng)
    elif method == "uniform":
        noise0, noise1 = uniform_noise(image0, image1, cfg, rng)
    elif method == "none":
        noise0 = jnp.zeros_like(image0)
        noise1 = jnp.zeros_like(image1)
    else:
        raise ValueError(f"invalid perturbation method: {method}")

    adv0 = jnp.clip(image0 + noise0, 0.0, 1.0)
    adv1 = jnp.clip(image1 + noise1, 0.0, 1.0)
    return adv0 - image0, adv1 - image1, adv0, adv1


def fgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig):
    """One-step fast gradient (sign) method (perturb_model.py:423-473)."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    loss = _loss_fn(predict, cfg)
    g0, g1 = jax.grad(loss, argnums=(0, 1))(image0, image1, ground_truth)
    step0 = jnp.sign(g0) if cfg.perturb_method == "fgsm" else g0
    step1 = jnp.sign(g1) if cfg.perturb_method == "fgsm" else g1
    return cfg.output_norm * step0 * m0, cfg.output_norm * step1 * m1


def ifgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig):
    """n-step iterative FGSM/FGM as a lax.fori_loop
    (perturb_model.py:475-619): per step, ascend, clamp the image to
    [0, 1], clamp the accumulated noise to the eps-ball, re-apply."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    loss = _loss_fn(predict, cfg)
    grad_fn = jax.grad(loss, argnums=(0, 1))
    eps = cfg.output_norm
    use_sign = "ifgsm" in cfg.perturb_method

    def body(_, carry):
        out0, out1 = carry
        g0, g1 = grad_fn(out0, out1, ground_truth)
        if use_sign:
            g0, g1 = jnp.sign(g0), jnp.sign(g1)
        out0 = jnp.clip(out0 + cfg.learning_rate * g0 * m0, 0.0, 1.0)
        out1 = jnp.clip(out1 + cfg.learning_rate * g1 * m1, 0.0, 1.0)
        n0 = jnp.clip(out0 - image0, -eps, eps)
        n1 = jnp.clip(out1 - image1, -eps, eps)
        return image0 + n0, image1 + n1

    out0, out1 = lax.fori_loop(0, cfg.n_step, body, (image0, image1))
    return out0 - image0, out1 - image1


def mifgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig):
    """Momentum I-FGSM (perturb_model.py:621-757): L1-normalized gradients
    accumulated with momentum mu (default 0.47), sign steps."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    loss = _loss_fn(predict, cfg)
    grad_fn = jax.grad(loss, argnums=(0, 1))
    eps = cfg.output_norm
    mu = cfg.momentum

    def body(_, carry):
        out0, out1, acc0, acc1 = carry
        g0, g1 = grad_fn(out0, out1, ground_truth)
        acc0 = mu * acc0 + (1.0 - mu) * g0 / jnp.sum(jnp.abs(g0))
        acc1 = mu * acc1 + (1.0 - mu) * g1 / jnp.sum(jnp.abs(g1))
        out0 = jnp.clip(out0 + cfg.learning_rate * jnp.sign(acc0) * m0, 0.0, 1.0)
        out1 = jnp.clip(out1 + cfg.learning_rate * jnp.sign(acc1) * m1, 0.0, 1.0)
        n0 = jnp.clip(out0 - image0, -eps, eps)
        n1 = jnp.clip(out1 - image1, -eps, eps)
        return image0 + n0, image1 + n1, acc0, acc1

    init = (image0, image1, jnp.zeros_like(image0), jnp.zeros_like(image1))
    out0, out1, _, _ = lax.fori_loop(0, cfg.n_step, body, init)
    return out0 - image0, out1 - image1


def gaussian_noise(image0, image1, cfg: PerturbConfig, rng: Array):
    """Gaussian noise, var = (eps/4)^2, output clipped to [0, 1] like
    skimage.random_noise (perturb_model.py:274-330)."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    sigma = cfg.output_norm / 4.0
    k0, k1 = jax.random.split(rng)
    out0 = jnp.clip(
        image0 + sigma * jax.random.normal(k0, image0.shape), 0.0, 1.0
    )
    out1 = jnp.clip(
        image1 + sigma * jax.random.normal(k1, image1.shape), 0.0, 1.0
    )
    return (out0 - image0) * m0, (out1 - image1) * m1


def uniform_noise(image0, image1, cfg: PerturbConfig, rng: Array):
    """Uniform noise in [-eps, eps] (perturb_model.py:332-382)."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    eps = cfg.output_norm
    k0, k1 = jax.random.split(rng)
    n0 = jax.random.uniform(k0, image0.shape, minval=-eps, maxval=eps)
    n1 = jax.random.uniform(k1, image1.shape, minval=-eps, maxval=eps)
    return n0 * m0, n1 * m1


def make_jitted_attack(predict: PredictFn, cfg: PerturbConfig):
    """Compile the full attack into one device program.

    The reference's per-step host loop (40 forward+backwards with CPU
    sync each step, perturb_main.py:466-698) becomes a single XLA
    computation."""

    @jax.jit
    def run(image0, image1, ground_truth, rng):
        return perturb(predict, image0, image1, ground_truth, cfg, rng)

    return run
