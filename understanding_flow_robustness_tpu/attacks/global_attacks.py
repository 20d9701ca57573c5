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
    # perturb_model.py:759-821 / global_constants.py:32 — probability of
    # applying the random resize-pad input diversification per step.
    probability_diverse_input: float = 0.0


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


def _resize_into_canvas(x: Array, nh, nw, top, left, mode: str) -> Array:
    """Resize (B,H,W,C) ``x`` to a traced (nh, nw) size and zero-pad it at
    (top, left) inside the original HxW canvas — the static-shape form of
    torch ``interpolate(size=(nh, nw)) + pad`` in perturb_model.py:783-820.
    Sizes/offsets are data (int32 scalars), not shapes, so this jits."""
    B, H, W, C = x.shape
    nh = jnp.asarray(nh, jnp.float32)
    nw = jnp.asarray(nw, jnp.float32)
    iy = (jnp.arange(H, dtype=jnp.float32) - jnp.asarray(top, jnp.float32))
    ix = (jnp.arange(W, dtype=jnp.float32) - jnp.asarray(left, jnp.float32))
    inside = (
        (iy[:, None] >= 0) & (iy[:, None] < nh)
        & (ix[None, :] >= 0) & (ix[None, :] < nw)
    )
    if mode == "bilinear":
        # torch area_pixel_compute_source_index (align_corners=False):
        # src = scale*(dst+0.5)-0.5, clamped below at 0.
        sy = jnp.maximum((iy + 0.5) * (H / nh) - 0.5, 0.0)
        sx = jnp.maximum((ix + 0.5) * (W / nw) - 0.5, 0.0)
        y0 = jnp.clip(jnp.floor(sy), 0, H - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(sx), 0, W - 1).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        ly = (sy - y0.astype(jnp.float32))[:, None, None]
        lx = (sx - x0.astype(jnp.float32))[None, :, None]
        v00 = x[:, y0[:, None], x0[None, :], :]
        v01 = x[:, y0[:, None], x1[None, :], :]
        v10 = x[:, y1[:, None], x0[None, :], :]
        v11 = x[:, y1[:, None], x1[None, :], :]
        out = (
            (1 - ly) * ((1 - lx) * v00 + lx * v01)
            + ly * ((1 - lx) * v10 + lx * v11)
        )
    elif mode == "nearest":
        # torch upsample_nearest2d: src = floor(dst * in/out), capped.
        y0 = jnp.minimum(jnp.floor(iy * (H / nh)), H - 1).astype(jnp.int32)
        x0 = jnp.minimum(jnp.floor(ix * (W / nw)), W - 1).astype(jnp.int32)
        y0 = jnp.maximum(y0, 0)
        x0 = jnp.maximum(x0, 0)
        out = x[:, y0[:, None], x0[None, :], :]
    else:
        raise ValueError(mode)
    return jnp.where(inside[None, :, :, None], out, 0.0)


def apply_diverse_input(image0, image1, ground_truth, nh, nw, top, left):
    """The deterministic core of ``__diverse_input``
    (perturb_model.py:759-821): bilinear-resize the images and
    nearest-resize the GT to (nh, nw), zero-pad into the original canvas at
    (top, left), and scale the whole GT (valid channel included, as the
    reference does) by nw/W."""
    W = image0.shape[2]
    img0 = _resize_into_canvas(image0, nh, nw, top, left, "bilinear")
    img1 = _resize_into_canvas(image1, nh, nw, top, left, "bilinear")
    gt = _resize_into_canvas(ground_truth, nh, nw, top, left, "nearest")
    gt = gt * (jnp.asarray(nw, gt.dtype) / W)
    return img0, img1, gt


def diverse_input(image0, image1, ground_truth, key, probability: float):
    """Random resize-pad input diversification (perturb_model.py:759-821):
    with probability p pick nh in [H-H/10, H], nw in [W-W/10, W], a random
    top/left pad, and apply :func:`apply_diverse_input`; otherwise pass
    through unchanged."""
    H, W = image0.shape[1:3]
    k_p, k_nh, k_nw, k_top, k_left = jax.random.split(key, 5)
    nh = jax.random.randint(k_nh, (), int(H - H / 10.0), H + 1)
    nw = jax.random.randint(k_nw, (), int(W - W / 10.0), W + 1)
    top = jax.random.randint(k_top, (), 0, H - nh + 1)
    left = jax.random.randint(k_left, (), 0, W - nw + 1)
    d0, d1, dgt = apply_diverse_input(
        image0, image1, ground_truth, nh, nw, top, left
    )
    apply = jax.random.uniform(k_p, ()) <= probability
    pick = lambda a, b: jnp.where(apply, a, b)  # noqa: E731
    return pick(d0, image0), pick(d1, image1), pick(dgt, ground_truth)


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
        noise0, noise1 = ifgsm(predict, image0, image1, ground_truth, cfg, rng)
    elif method in ("mifgsm", "mifgm"):
        noise0, noise1 = mifgsm(predict, image0, image1, ground_truth, cfg, rng)
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


def _make_grad_fn(predict: PredictFn, cfg: PerturbConfig,
                  rng: Array | None):
    """Per-step gradient of the attack loss w.r.t. the (pre-diversification)
    images.  The diverse-input transform sits INSIDE the differentiated
    function, exactly like the reference's autograd graph
    (perturb_model.py:507-521)."""
    loss = _loss_fn(predict, cfg)
    p = cfg.probability_diverse_input
    if p <= 0.0 or rng is None:
        grad01 = jax.grad(
            lambda a, b, gt: loss(a, b, gt), argnums=(0, 1)
        )
        return lambda i, a, b, gt: grad01(a, b, gt)

    def step_loss(a, b, gt, i):
        key = jax.random.fold_in(rng, i)
        d0, d1, dgt = diverse_input(a, b, gt, key, p)
        return loss(d0, d1, dgt)

    grad01 = jax.grad(step_loss, argnums=(0, 1))
    return lambda i, a, b, gt: grad01(a, b, gt, i)


def fgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig):
    """One-step fast gradient sign method (perturb_model.py:423-473).

    NOTE: the reference routes BOTH "fgsm" and "fgm" here and always takes
    the gradient sign — one-step fgm has no non-sign branch upstream (only
    ifgm does, :529-539).  Verified against the executed reference in
    tests/test_attack_parity.py."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    loss = _loss_fn(predict, cfg)
    g0, g1 = jax.grad(loss, argnums=(0, 1))(image0, image1, ground_truth)
    return (
        cfg.output_norm * jnp.sign(g0) * m0,
        cfg.output_norm * jnp.sign(g1) * m1,
    )


def _ifgsm_body_fn(predict, image0, image1, ground_truth,
                   cfg: PerturbConfig, rng: Array | None):
    """Shared one-step body of ifgsm/ifgm, used by both the production
    fori_loop and the trajectory scan (identical math, so the
    trajectory-collecting variant stays parity-locked for free)."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    grad_fn = _make_grad_fn(predict, cfg, rng)
    eps = cfg.output_norm
    use_sign = "ifgsm" in cfg.perturb_method

    def body(i, carry):
        out0, out1 = carry
        g0, g1 = grad_fn(i, out0, out1, ground_truth)
        if use_sign:
            g0, g1 = jnp.sign(g0), jnp.sign(g1)
        out0 = jnp.clip(out0 + cfg.learning_rate * g0 * m0, 0.0, 1.0)
        out1 = jnp.clip(out1 + cfg.learning_rate * g1 * m1, 0.0, 1.0)
        n0 = jnp.clip(out0 - image0, -eps, eps)
        n1 = jnp.clip(out1 - image1, -eps, eps)
        return image0 + n0, image1 + n1

    return body


def ifgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig,
          rng: Array | None = None):
    """n-step iterative FGSM/FGM as a lax.fori_loop
    (perturb_model.py:475-619): per step, optionally diversify the input,
    ascend, clamp the image to [0, 1], clamp the accumulated noise to the
    eps-ball, re-apply."""
    body = _ifgsm_body_fn(predict, image0, image1, ground_truth, cfg, rng)
    out0, out1 = lax.fori_loop(0, cfg.n_step, body, (image0, image1))
    return out0 - image0, out1 - image1


def _mifgsm_body_fn(predict, image0, image1, ground_truth,
                    cfg: PerturbConfig, rng: Array | None):
    """Shared one-step body of mifgsm (see _ifgsm_body_fn)."""
    m0, m1 = _mode_mask(cfg.perturb_mode)
    grad_fn = _make_grad_fn(predict, cfg, rng)
    eps = cfg.output_norm
    mu = cfg.momentum

    def body(i, carry):
        out0, out1, acc0, acc1 = carry
        g0, g1 = grad_fn(i, out0, out1, ground_truth)
        # PER-SAMPLE L1 normalization: the reference's whole-tensor
        # torch.sum (perturb_model.py:673-679) IS the per-sample norm at
        # its only batch size (1, perturb_main.py:189); reducing over the
        # batch axis too would couple samples in batched/sharded attacks.
        ax = tuple(range(1, g0.ndim))
        acc0 = mu * acc0 + (1.0 - mu) * g0 / jnp.sum(
            jnp.abs(g0), axis=ax, keepdims=True)
        acc1 = mu * acc1 + (1.0 - mu) * g1 / jnp.sum(
            jnp.abs(g1), axis=ax, keepdims=True)
        out0 = jnp.clip(out0 + cfg.learning_rate * jnp.sign(acc0) * m0, 0.0, 1.0)
        out1 = jnp.clip(out1 + cfg.learning_rate * jnp.sign(acc1) * m1, 0.0, 1.0)
        n0 = jnp.clip(out0 - image0, -eps, eps)
        n1 = jnp.clip(out1 - image1, -eps, eps)
        return image0 + n0, image1 + n1, acc0, acc1

    return body


def mifgsm(predict, image0, image1, ground_truth, cfg: PerturbConfig,
           rng: Array | None = None):
    """Momentum I-FGSM (perturb_model.py:621-757): L1-normalized gradients
    accumulated with momentum mu (default 0.47), sign steps."""
    body = _mifgsm_body_fn(predict, image0, image1, ground_truth, cfg, rng)
    init = (image0, image1, jnp.zeros_like(image0), jnp.zeros_like(image1))
    out0, out1, _, _ = lax.fori_loop(0, cfg.n_step, body, init)
    return out0 - image0, out1 - image1


def perturb_trajectory(
    predict: PredictFn,
    image0: Array,
    image1: Array,
    ground_truth: Array,
    cfg: PerturbConfig,
    rng: Array | None = None,
):
    """Like :func:`perturb` but also returns the per-step noise trajectory
    ``(n_step, B, H, W, C)`` for each frame — the data behind the
    reference's ``--show_evolve`` perturbation-evolution GIFs
    (perturb_model.py:497,582,604-614).  Iterative methods run the SAME
    step body as the production fori_loop, lifted into a ``lax.scan`` whose
    per-step output is the accumulated noise; one-step/noise methods return
    a length-1 trajectory."""
    method = cfg.perturb_method
    if method in ("ifgsm", "ifgm", "mifgsm", "mifgm"):
        if method in ("ifgsm", "ifgm"):
            body = _ifgsm_body_fn(predict, image0, image1, ground_truth,
                                  cfg, rng)
            init = (image0, image1)
        else:
            body = _mifgsm_body_fn(predict, image0, image1, ground_truth,
                                   cfg, rng)
            init = (image0, image1, jnp.zeros_like(image0),
                    jnp.zeros_like(image1))

        def scan_body(carry, i):
            new = body(i, carry)
            return new, (new[0] - image0, new[1] - image1)

        final, (tr0, tr1) = lax.scan(scan_body, init,
                                     jnp.arange(cfg.n_step))
        out0, out1 = final[0], final[1]
        noise0, noise1 = out0 - image0, out1 - image1
    else:
        noise0, noise1, _, _ = perturb(
            predict, image0, image1, ground_truth, cfg, rng)
        tr0, tr1 = noise0[None], noise1[None]
    adv0 = jnp.clip(image0 + noise0, 0.0, 1.0)
    adv1 = jnp.clip(image1 + noise1, 0.0, 1.0)
    return (adv0 - image0, adv1 - image1, adv0, adv1), (tr0, tr1)


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


def make_sharded_attack(predict_fn: Callable, cfg: PerturbConfig, mesh):
    """Data-parallel white-box attack over a device mesh.

    The reference's attack sweeps are its flagship workload but run
    sample-at-a-time on one GPU (perturb_main.py:466-698); here the whole
    n-step attack shards its batch over the mesh's ``data`` axis.  The
    attack is per-sample independent (image gradients never cross the
    batch axis), so no collectives are needed beyond XLA's bookkeeping.

    predict_fn(variables, img1, img2) -> flow, variables as a TRACED
    argument (FlowModel.predict_fn's contract — closing over params would
    inline them into the HLO).  Returns jitted
    ``run(variables, image0, image1, ground_truth, rng)``.
    """
    from ..parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def run(variables, image0, image1, ground_truth, rng):
        predict = lambda a, b: predict_fn(variables, a, b)  # noqa: E731
        return perturb(predict, image0, image1, ground_truth, cfg, rng)

    return jax.jit(
        run,
        in_shardings=(rep, data, data, data, rep),
        out_shardings=(data, data, data, data),
    )


def make_spatial_attack(predict_fn: Callable, cfg: PerturbConfig, mesh):
    """White-box attack on a 2-D ``data x spatial`` mesh: batch over the
    data axis AND image height over the spatial axis, for frame pairs too
    large for one chip (parallel/spatial.py; no reference analog).

    XLA SPMD shards the conv forward/backward with halo exchanges; the
    attack math itself (sign/normalize/clamp) is pointwise, so it shards
    for free.  Semantics caveat: reassociation of the sharded conv
    reductions perturbs gradient bits, and sign-based methods (fgsm/ifgsm)
    amplify a near-zero-gradient bit flip to a full ±lr step at that
    pixel — statistically irrelevant (tests/test_spatial_shard.py pins the
    attack-effect equivalence) but not bit-identical to single-chip, unlike
    ``make_sharded_attack`` which is.
    """
    from ..ops.kernel_gate import no_pallas_kernels
    from ..parallel.mesh import replicated
    from ..parallel.spatial import check_spatial_shapes, image_sharding

    rep = replicated(mesh)
    img = image_sharding(mesh)

    def run(variables, image0, image1, ground_truth, rng):
        check_spatial_shapes(mesh, image0)
        predict = lambda a, b: predict_fn(variables, a, b)  # noqa: E731
        with no_pallas_kernels():
            return perturb(predict, image0, image1, ground_truth, cfg, rng)

    return jax.jit(
        run,
        in_shardings=(rep, img, img, img, rep),
        out_shardings=(img, img, img, img),
    )
