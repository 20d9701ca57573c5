"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
over the batch axis (training/train.py:117,126-127; SURVEY §2.9).  The
TPU-native equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis,
batch tensors sharded over it, parameters replicated, and the gradient
all-reduce emitted by XLA over ICI — which covers 100% of the reference's
distributed behavior while scaling to real multi-chip slices.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put every leaf with its batch axis sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def shard_predict(predict_fn, mesh: Mesh):
    """Data-parallel inference: the TPU equivalent of wrapping the model in
    ``torch.nn.DataParallel`` for evaluation (training/evaluate.py:410).

    predict_fn(variables, img1, img2) -> flow (FlowModel.predict_fn's
    contract: variables stay a traced argument).  Returns a jitted function
    with variables replicated and the batch axis of images/flow sharded
    over the mesh's ``data`` axis.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        predict_fn,
        in_shardings=(rep, data, data),
        out_shardings=data,
    )
