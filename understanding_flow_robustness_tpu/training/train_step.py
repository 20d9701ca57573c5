"""Jitted training step with data-parallel sharding.

Replaces the core of training/train.py:155-287: forward (per-iteration
flow list), sequence/multiscale loss, grad clip 1.0, AdamW+OneCycle step —
as one jitted function whose batch inputs are sharded over the mesh's
``data`` axis (params replicated, gradient all-reduce inserted by XLA).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, replicated
from .losses import multiscale_epe, sequence_loss

Array = jax.Array


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: int


def make_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    loss_type: str = "sequence",
    is_raft: bool = False,
    flownetc: bool = False,
    pwc: bool = False,
    gamma: float = 0.8,
    div_flow: float = 1.0,
    flownetc_weighing: bool = False,
    freeze_bn: bool = False,
    not_excluding: bool = False,
    packed_raft: Optional[bool] = None,
    axis_name: Optional[str] = None,
    grad_transport: str = "f32",
) -> Callable:
    """Build the jittable train step.

    ``freeze_bn`` is RAFT-only, exactly like the reference (train.py:
    329-335 excludes the FlowNetC/PWC families): for the conv families
    the ``train`` flag gates BOTH the norm mode and the multi-scale
    return structure, so train=False would hand the loss a single
    eval-mode flow instead of the prediction pyramid.

    Batch: dict(image1, image2 in [0,1] NHWC, flow (B,H,W,2), valid (B,H,W)).
    Returns (new_params, new_opt_state, new_batch_stats, metrics).

    ``axis_name``: build the step for ``shard_train_step(...,
    explicit_collectives=True)`` — the function then sees only its LOCAL
    batch shard and performs the cross-device gradient reduction itself
    with an explicit ``lax.pmean`` over this mesh axis (instead of the
    all-reduce XLA's SPMD partitioner inserts on the pjit path).  That
    explicit collective is what makes ``grad_transport`` possible:

    ``grad_transport="bf16"``: gradients cross ICI as bfloat16 (cast
    before the pmean, restored to f32 for the optimizer).  Halves the
    all-reduce bytes — the mitigation PARITY.md §2.9's ICI model calls
    for on FlowNet2's 650 MB f32 gradient all-reduce, which is otherwise
    the scaling bottleneck of large-model fine-tuning.  Parameters,
    optimizer state and the local backward stay full f32; only the
    transport is compressed.  Numerics: verified on the 8-device CPU mesh
    against the f32 pjit path (tests/test_grad_transport.py) — per-step
    update drift is at the bf16 rounding floor (~1e-3 relative on the
    grad, ~1e-7 absolute on params after the optimizer's 1e-4 lr).
    """
    if grad_transport not in ("f32", "bf16"):
        raise ValueError(f"unknown grad_transport {grad_transport!r}")
    if grad_transport == "bf16" and axis_name is None:
        raise ValueError(
            "grad_transport='bf16' compresses the cross-device all-reduce "
            "— it requires axis_name (explicit-collectives mode); the "
            "pjit path's implicit all-reduce dtype is not controllable"
        )
    if freeze_bn and not is_raft:
        raise ValueError(
            "freeze_bn is RAFT-only (train.py:329-335); the conv families' "
            "train flag also controls the multi-scale return structure"
        )
    # Packed RAFT loss path (TPU): per-iteration predictions stay in the
    # 1/8-res packed layout (RAFT(packed_train=True)) and the sequence
    # loss packs the GT once — same loss/grads modulo float reassociation
    # (tests/test_training.py pins it), ~40% faster steps on v5e (the
    # convex-upsample transposes and full-res loss tensors vanish).
    # auto: on for standard RAFT + sequence loss on TPU.
    if packed_raft is None:
        packed_raft = (
            is_raft and loss_type == "sequence"
            and jax.default_backend() == "tpu"
            and getattr(model, "small", False) is False
            and getattr(model, "return_features", False) is False
        )
    if packed_raft and (not is_raft or loss_type != "sequence"):
        raise ValueError("packed_raft requires is_raft + sequence loss")
    loss_fn_impl = sequence_loss if loss_type == "sequence" else multiscale_epe

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"] if not freeze_bn else []
        # freeze_bn == the reference's ``m.eval()`` on every BatchNorm2d
        # (models/raft/raft.py:97-100): batch norm uses running stats and
        # writes nothing.  ``train`` only selects norm behavior in these
        # models (no dropout), so train=False + test_mode=False reproduces
        # that exactly while keeping per-iteration predictions.
        norm_train = not freeze_bn
        img1, img2 = batch["image1"], batch["image2"]
        if is_raft:
            img1, img2 = img1 * 255.0, img2 * 255.0
            call_kw = dict(train=norm_train, test_mode=False)
            if packed_raft:
                call_kw["packed_train"] = True
        else:
            call_kw = dict(train=norm_train)
        # NOTE: flax returns (out, vars) for ANY non-False ``mutable``,
        # including an empty list — only pass it when non-empty, else
        # models without batch stats (FlowNet family) and freeze_bn
        # fine-tuning unpack garbage.
        if mutable:
            preds, new_vars = model.apply(
                variables, img1, img2, mutable=mutable, **call_kw)
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            preds = model.apply(variables, img1, img2, **call_kw)
            new_stats = batch_stats
        # Single-prediction models (the FlowNet2 cascade returns ONE flow,
        # flownet2_models.py:185-205) must become a 1-element list —
        # list() on the bare array would unpack the BATCH dim and the
        # multiscale loss would silently treat batch entries as scales
        # (caught by tests/test_grad_transport.py in round 5).
        preds = (list(preds) if isinstance(preds, (list, tuple))
                 else [preds])
        extra = {"packed": True} if packed_raft else {}
        loss, metrics = loss_fn_impl(
            preds, batch["flow"], batch["valid"],
            gamma=gamma, flownetc=flownetc, pwc=pwc, div_flow=div_flow,
            flownetc_weighing=flownetc_weighing,
            not_excluding=not_excluding, **extra,
        )
        return loss, (metrics, new_stats)

    def train_step(params, opt_state, batch_stats, batch):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch)
        if axis_name is not None:
            # Explicit DP reduction (shard_map mode): every device holds
            # the full replicated params and a batch shard; averaging the
            # shard-local gradients reproduces the global-batch gradient
            # (equal shard sizes — shard_map guarantees it).
            if grad_transport == "bf16":
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(
                        g.astype(jnp.bfloat16), axis_name
                    ).astype(jnp.float32),
                    grads,
                )
            else:
                grads = jax.lax.pmean(grads, axis_name)
            # loss/metrics become the global-batch values (cheap: scalars);
            # batch stats (BN running averages) are averaged across shards
            # so every replica carries identical state — the pjit path
            # computes them over the global batch instead, a documented
            # (tiny) semantic difference of explicit-collectives mode.
            loss = jax.lax.pmean(loss, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            if new_stats:
                new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN guard (training/train.py:270-272): skip the update entirely
        # when the loss is not finite — params AND optimizer state (incl.
        # step count / momentum / decoupled weight decay) keep their old
        # values, exactly like the reference's `continue`.
        finite = jnp.isfinite(loss)
        pick = lambda new, old: jnp.where(finite, new, old)  # noqa: E731
        new_params = jax.tree_util.tree_map(pick, new_params, params)
        new_opt_state = jax.tree_util.tree_map(pick, new_opt_state, opt_state)
        metrics = dict(metrics, loss=loss)
        return new_params, new_opt_state, new_stats, metrics

    return train_step


def shard_train_step(train_step: Callable, mesh,
                     explicit_collectives: bool = False):
    """jit the step with params replicated and batch sharded over ``data``.

    Default (pjit) mode: XLA's SPMD partitioner inserts the f32 gradient
    all-reduce over ICI.  ``explicit_collectives=True``: the step runs
    under ``shard_map`` and must have been built with
    ``make_train_step(..., axis_name=mesh's data axis)`` — it then owns
    its collectives, which enables compressed gradient transport
    (``grad_transport="bf16"``, halving FlowNet2's 650 MB all-reduce).
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    if explicit_collectives:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        # check_vma off: outputs are replicated by construction (the
        # pmean-ed gradient drives identical updates on every device) but
        # the replication checker cannot prove it through optax.
        mapped = jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped)
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, rep, data),
        out_shardings=(rep, rep, rep, rep),
    )
