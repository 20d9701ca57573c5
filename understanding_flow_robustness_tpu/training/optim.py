"""Optimizer / LR schedule (reference: training/utils.py:225-239).

AdamW + torch-style OneCycleLR with linear annealing: warm up from
max_lr/div_factor over pct_start of the steps, then linearly anneal to
max_lr/div_factor/final_div_factor — exactly torch's two-phase linear
OneCycle (cycle_momentum=False).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def onecycle_linear(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    initial = max_lr / div_factor
    final = initial / final_div_factor
    # torch OneCycleLR phase boundaries: warmup ends at step
    # pct_start*total - 1, anneal ends at step total - 1
    warm = max(float(pct_start * total_steps) - 1, 1.0)
    down_len = max(total_steps - 1 - warm, 1.0)

    end = warm + down_len

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # Two-sided lerp with both distances computed directly from the
        # step counter (exact in f32 for integer steps): avoids the
        # a+(b-a)*t and 1-t cancellations, which otherwise dominate near
        # the end where final ≪ max_lr.
        t_up = jnp.minimum(step / warm, 1.0)
        up = initial * (1.0 - t_up) + max_lr * t_up
        d_left = jnp.clip(end - step, 0.0, down_len)
        d_done = jnp.clip(step - warm, 0.0, down_len)
        down = (max_lr * d_left + final * d_done) / down_len
        return jnp.where(step < warm, up, down)

    return schedule


def fetch_optimizer(
    lr: float = 1e-4,
    wdecay: float = 1e-4,
    epsilon: float = 1e-8,
    num_steps: int = 100000,
    inner_iteration: int = 1,
    clip: float = 1.0,
):
    """AdamW + OneCycle(linear, pct_start=0.05) with global-norm gradient
    clipping (training/train.py:277-282 clips at 1.0 before stepping).
    Total schedule steps = num_steps * inner_iteration + 100, matching
    training/utils.py:231-238."""
    schedule = onecycle_linear(lr, num_steps * inner_iteration + 100)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(
            learning_rate=schedule, weight_decay=wdecay, eps=epsilon
        ),
    )
    return tx, schedule
