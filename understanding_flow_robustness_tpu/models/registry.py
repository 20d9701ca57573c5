"""Model factory and uniform inference API.

Replaces the reference's fetch_model / predict_flow
(models/utils_model.py:10-157, 627-681): the same 12 model IDs, each with
its architecture configuration, checkpoint filename and conversion rule;
``predict_flow`` gives every model the same (img1, img2 in [0,1] NHWC) ->
full-resolution-flow interface, handling RAFT's x255 + test_mode dispatch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import convert as _convert
from .flownet2 import FlowNet2, FlowNetS2
from .flownet_family import FlowNetC, FlowNetCFlex, FlowNetS
from .pwcnet import PWCNet
from .raft_model import RAFT
from .spynet import SpyNet

Array = jax.Array


def get_flownet_choices() -> list[str]:
    """models/utils_model.py:10-24."""
    return [
        "FlowNetS",
        "FlowNetC",
        "FlowNet2",
        "FlowNetCFlexLarger_k3_reps3",  # Robust FlowNetC
        "FlowNetCFlexLarger_k3_reps3_adv_ifgsm_l2_002",
        "FlowNetCFlexLarger_k5_reps0",
        "SpyNet",
        "PWCNet",
        "PWCNet_adv_ifgsm_l2_002",
        "RAFT",
        "RAFT_FlowNetCEncoder_WoContext",
        "RAFT_adv_kitti2012_ifgsm_l2_002",
    ]


@dataclasses.dataclass
class ModelSpec:
    build: Callable[..., Any]
    checkpoint: Optional[str]
    converter: Optional[str]
    is_raft: bool = False
    # minimal valid input multiple for H/W (static-shape padding)
    size_multiple: int = 64


_SPECS: dict[str, ModelSpec] = {
    "FlowNetS": ModelSpec(
        lambda **kw: FlowNetS2(**kw), "FlowNet2-S_checkpoint.pth.tar",
        "flownet_s",
    ),
    "FlowNetC": ModelSpec(
        lambda **kw: FlowNetC(**{"div_flow": 20.0, **kw}),
        "FlowNet2-C_checkpoint.pth.tar", "flownet_c",
    ),
    "FlowNet2": ModelSpec(
        lambda **kw: FlowNet2(**kw), "FlowNet2_checkpoint.pth.tar", "flownet2",
    ),
    "FlowNetCFlexLarger_k3_reps3": ModelSpec(
        lambda **kw: FlowNetCFlex(
            **{"kernel_size": 3, "number_of_reps": 3, **kw}),
        "RobustFlowNetC.pth", "flownet_c_flex",
    ),
    "FlowNetCFlexLarger_k3_reps3_adv_ifgsm_l2_002": ModelSpec(
        lambda **kw: FlowNetCFlex(
            **{"kernel_size": 3, "number_of_reps": 3, **kw}),
        "adv_kitti2012_robustFlow_ifgsm_l2_0.02.pth", "flownet_c_flex",
    ),
    "FlowNetCFlexLarger_k5_reps0": ModelSpec(
        lambda **kw: FlowNetCFlex(**{
            "kernel_size": 5, "number_of_reps": 0, "flat_entry_names": True,
            **kw,
        }),
        "larger_field_3x3_x0_l2.pth", "flownet_c_flex",
    ),
    # training/get_model's --larger_field variant
    # (models/FlowNetC_larger_field.py; not in the 12 attack-eval IDs)
    "FlowNetC_larger_field": ModelSpec(
        lambda **kw: FlowNetCFlex(kernel_size=5, number_of_reps=1, **kw),
        None, "flownet_c_larger",
    ),
    "SpyNet": ModelSpec(
        lambda **kw: SpyNet(nlevels=6, **kw), "spynet_models", None,
        size_multiple=32,
    ),
    "PWCNet": ModelSpec(
        # production config: bf16 compute / f32 params + f32 flow heads
        # (reference-AMP-equivalent; drift guard in tests/test_bf16_drift)
        lambda **kw: PWCNet(**{"mixed_precision": True, **kw}),
        "pwc_net_chairs.pth.tar", "pwcnet",
    ),
    "PWCNet_adv_ifgsm_l2_002": ModelSpec(
        lambda **kw: PWCNet(**{"mixed_precision": True, **kw}),
        "adv_kitti2012_pwcnet_ifgsm_l2_0.02.pth",
        "pwcnet",
    ),
    "RAFT": ModelSpec(
        lambda **kw: RAFT(**{"mixed_precision": True, **kw}),
        "raft-things.pth", "raft", is_raft=True, size_multiple=8,
    ),
    "RAFT_FlowNetCEncoder_WoContext": ModelSpec(
        lambda **kw: RAFT(**{
            "flownetc_encoder": True, "no_separate_context": True,
            "mixed_precision": True, **kw,
        }),
        "raft_flowNetCEnc_noSeparateContext.pth", "raft", is_raft=True,
        size_multiple=8,
    ),
    "RAFT_adv_kitti2012_ifgsm_l2_002": ModelSpec(
        # default-dict + **kw so callers can override mixed_precision,
        # like every other spec (a plain keyword would TypeError on it)
        lambda **kw: RAFT(**{"mixed_precision": False, **kw}),
        "adv_kitti2012_raft_ifgsm_l2_0.02.pth", "raft", is_raft=True,
        size_multiple=8,
    ),
}


@dataclasses.dataclass
class FlowModel:
    """A built model: module + variables + jit-friendly apply fns."""

    name: str
    module: Any
    variables: dict
    is_raft: bool
    size_multiple: int
    _predict_jit: Any = None

    def predict(self, img1: Array, img2: Array, overrides=None):
        """Uniform inference (models/utils_model.py:627-681): images in
        [0, 1] NHWC; returns flow at the model's native output resolution.

        Runs through a cached jit that takes ``variables`` as a TRACED
        argument — closing over them would bake every parameter into the
        program as an inline literal (650 MB of HLO constants for
        FlowNet2, which overflows compiler request limits and slows every
        compile)."""
        if overrides is not None:
            return predict_flow(self, img1, img2, overrides=overrides)
        if self._predict_jit is None:
            object.__setattr__(self, "_predict_jit", jax.jit(self.predict_fn))
        return self._predict_jit(self.variables, img1, img2)

    @property
    def predict_fn(self) -> Callable:
        """``fn(variables, img1, img2) -> flow`` with variables as an
        explicit argument — use this (not ``predict``) inside any outer
        jit/benchmark so the parameters stay traced arguments instead of
        inlined program constants."""
        module, is_raft = self.module, self.is_raft

        def _run(variables, a, b):
            if is_raft:
                _, flow_up = module.apply(
                    variables, a * 255.0, b * 255.0, test_mode=True
                )
                return flow_up
            return module.apply(variables, a, b)

        return _run

    def apply_train(self, variables, img1, img2, **kw):
        if self.is_raft:
            return self.module.apply(
                variables, img1 * 255.0, img2 * 255.0,
                train=True, test_mode=False, **kw,
            )
        return self.module.apply(variables, img1, img2, train=True, **kw)


def predict_flow(model: FlowModel, img1: Array, img2: Array, overrides=None):
    if model.is_raft:
        _, flow_up = model.module.apply(
            model.variables, img1 * 255.0, img2 * 255.0, test_mode=True
        )
        return flow_up
    kw = {}
    if overrides is not None:
        kw["overrides"] = overrides
    return model.module.apply(model.variables, img1, img2, **kw)


def fetch_model(
    name: str,
    pretrained_path: Optional[str] = "pretrained_models",
    rng: int = 0,
    init_size: tuple[int, int] = (64, 64),
    **model_kwargs,
) -> FlowModel:
    """Create a model and load its converted checkpoint if available;
    falls back to random init when the checkpoint file is absent (this
    environment has no weight zoo)."""
    if name not in _SPECS:
        raise KeyError(f"unknown model '{name}'; choices: {get_flownet_choices()}")
    spec = _SPECS[name]
    module = spec.build(**model_kwargs)

    h = max(init_size[0], spec.size_multiple)
    w = max(init_size[1], spec.size_multiple)
    h -= h % spec.size_multiple
    w -= w % spec.size_multiple
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager linen init dispatches thousands of tiny ops,
    # which is pathologically slow over the tunneled TPU backend.
    variables = jax.jit(module.init)(jax.random.PRNGKey(rng), dummy, dummy)

    ckpt = None
    if pretrained_path is not None and os.path.isfile(pretrained_path):
        # explicit checkpoint FILE: a flax .msgpack (ufr-convert output or
        # a params-only training export) or a reference torch checkpoint
        if pretrained_path.endswith(".msgpack"):
            from ..training.checkpoint import load_variables

            variables = load_variables(pretrained_path, variables)
        else:
            ckpt = load_checkpoint_variables(name, pretrained_path)
    elif pretrained_path is not None and spec.checkpoint is not None:
        # zoo DIRECTORY: the reference's per-model file name convention
        path = os.path.join(pretrained_path, spec.checkpoint)
        if os.path.exists(path):
            ckpt = load_checkpoint_variables(name, path)
    if ckpt is not None:
        variables = _merge_strict(variables, ckpt, name)

    return FlowModel(
        name=name, module=module, variables=variables,
        is_raft=spec.is_raft, size_multiple=spec.size_multiple,
    )


def load_checkpoint_variables(name: str, path: str) -> dict:
    """Convert a reference checkpoint file into flax variables."""
    import torch

    spec = _SPECS[name]
    if name == "SpyNet":
        return _convert.convert_spynet_dir(path)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = _convert.to_numpy_state_dict(raw)
    return _convert.CONVERTERS[spec.converter](sd)


def _merge_strict(init_vars: dict, loaded: dict, name: str) -> dict:
    """Shape-check loaded variables against the initialized pytree (strict
    load_state_dict semantics); batch_stats fall back to init when a
    checkpoint has none (e.g. non-BN configs)."""
    flat_init = _flatten(init_vars)
    flat_new = _flatten(loaded)
    missing = set(flat_init) - set(flat_new)
    extra = set(flat_new) - set(flat_init)
    # models without BN have no batch_stats in checkpoints; keep init zeros
    missing = {k for k in missing if not k[0] == "batch_stats"}
    if missing or extra:
        raise ValueError(
            f"checkpoint mismatch for {name}: missing={sorted(missing)[:8]} "
            f"extra={sorted(extra)[:8]}"
        )
    merged = _flatten(init_vars)
    for k, v in flat_new.items():
        if merged[k].shape != v.shape:
            raise ValueError(
                f"{name}: shape mismatch at {k}: {merged[k].shape} vs {v.shape}"
            )
        merged[k] = jnp.asarray(v)
    return _unflatten(merged)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def checkpoint_arg(path: Optional[str]) -> Optional[str]:
    """Normalize a CLI ``--pretrained_path`` for ``fetch_model``: a zoo
    DIRECTORY or a checkpoint FILE (.pth/.pth.tar/.msgpack) passes
    through; a missing path becomes None (random init, the documented
    no-weights fallback) with a visible warning instead of silently
    evaluating random weights as if they were the requested checkpoint."""
    if path and os.path.exists(path):
        return path
    if path and path != "pretrained_models":
        import sys

        print(f"WARNING: pretrained path '{path}' not found; "
              "using random init", file=sys.stderr)
    return None


def get_feature_map_keys(name: str) -> list[str]:
    """Capture-key sets per model family (models/utils_model.py:429-436 +
    get_feature_map_keys :282-426): the names the ``return_features`` dicts
    expose.  ``overrides`` injection is a FlowNetC-family capability only,
    exactly like the reference (overwrite_feat_maps exists solely in
    FlowNetC/FlowNetC_flexible forwards, FlowNetC.py:121-155); RAFT/PWC
    keys are capture-only."""
    if name.startswith("RAFT"):
        keys = ["fmap1", "fmap2"] + [f"corr_pyramid_{i}" for i in range(4)]
        keys += ["net", "inp"]
        for i in range(12):
            keys += [f"idx_corr_vol_{i}", f"net_{i}", f"motion_features_{i}",
                     f"cor1_{i}", f"cor_{i}", f"cor_flo_{i}", f"flow_pred_{i}"]
        return keys
    if "FlowNetC" in name or name in ("FlowNetCFlexLarger_k3_reps3",):
        return ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                "corr", "conv_redir", "conv3_1"]
    if name.startswith("PWC"):
        # the reference's full hook set (utils_model.py:345-409):
        # interleaved pyramid taps, then per decoder level the corr,
        # dense-chain convs, flow head and upsamplers, then the context
        # net.  Quirk mirrored: the exposed "corr2" tensor is corr5 again
        # (PWCNet.py:336 appends corr5 at the corr2 site).
        keys = []
        for i in range(6):
            keys += [f"c1{i + 1}", f"c2{i + 1}"]
        for lvl in (6, 5, 4, 3):
            keys += [f"corr{lvl}"]
            keys += [f"conv{lvl}_{i}" for i in range(5)]
            keys += [f"predict_flow{lvl}", f"deconv{lvl}", f"upfeat{lvl}"]
        keys += ["corr2"] + [f"conv2_{i}" for i in range(5)]
        keys += [f"dc_conv{i}" for i in range(1, 8)] + ["predict_flow2"]
        return keys
    return []
