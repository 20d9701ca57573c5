"""Checkpoint save/restore with full optimizer state
(reference: training/train.py:110-124, 289-300, 349-350, 607-636).

Uses orbax PyTreeCheckpointer: ``checkpoint/`` holds the rolling state
(params, opt_state, batch_stats, total_steps) for resume; final
weights-only exports mirror the reference's ``<name>.pth`` dumps.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, params: Any, opt_state: Any,
                    batch_stats: Any, total_steps: int) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    state = {
        "params": params,
        "opt_state": opt_state,
        "batch_stats": batch_stats,
        "total_steps": np.asarray(total_steps),
    }
    path = os.path.join(ckpt_dir, "checkpoint")
    _checkpointer().save(path, state, force=True)


def restore_checkpoint(ckpt_dir: str, template: Optional[dict] = None):
    """Returns the saved state dict, or None if absent."""
    path = os.path.join(os.path.abspath(ckpt_dir), "checkpoint")
    if not os.path.exists(path):
        return None
    import orbax.checkpoint as ocp

    kwargs = {}
    if template is not None:
        kwargs["item"] = template
    state = _checkpointer().restore(path, **kwargs)
    return state


def save_weights(path: str, params: Any) -> None:
    """Weights-only export (training/train.py:349-350)."""
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_weights(path: str, template: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_variables(path: str, variables_template: dict) -> dict:
    """Restore a ``.msgpack`` into a FULL variables dict.

    Accepts either serialization flavor: a whole variables dict (the
    ``ufr-convert`` output — carries ``batch_stats`` running averages for
    the BN models) or a params-only export (``save_weights``/
    training/train.py:349-350 final weights), which leaves the template's
    other collections (init zeros) in place.
    """
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(dict(variables_template), data)
    except (ValueError, KeyError):
        out = dict(variables_template)
        out["params"] = serialization.from_bytes(
            variables_template["params"], data)
        return out
