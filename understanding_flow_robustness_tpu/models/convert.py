"""PyTorch checkpoint -> flax params conversion.

Reproduces the per-model loading rules of the reference factory
(models/utils_model.py:100-156): file layouts ("state_dict" wrappers vs raw
dicts), the RAFT "module."-prefix / positional-remap fallback (:132-142),
and SPyNet's per-level per-conv weight files (models/spynet.py:81-127).

Layout transforms:
  * Conv2d weight        (O, I, kh, kw) -> HWIO (kh, kw, I, O)
  * ConvTranspose2d      (I, O, kh, kw) -> (kh, kw, I, O)  (flip at apply)
  * BatchNorm weight/bias/running_mean/running_var ->
      params {scale, bias} + batch_stats {mean, var}

Each model family gets a key-mapping rule set keyed by regex; unmatched
keys raise (strict loading, like the reference's load_state_dict).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np


def _conv_w(x):
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _convT_w(x):
    return np.ascontiguousarray(np.transpose(x, (2, 3, 0, 1)))


def _ident(x):
    return np.asarray(x)


def _set(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def to_numpy_state_dict(obj) -> dict[str, np.ndarray]:
    """torch.load result -> flat numpy dict, unwrapping the reference's
    checkpoint formats ({'state_dict': ...}, {'model_state_dict': ...},
    raw state dicts, optional 'module.' DataParallel prefixes)."""
    if hasattr(obj, "items"):
        for wrapper in ("state_dict", "model_state_dict", "model"):
            if wrapper in obj and hasattr(obj[wrapper], "items"):
                obj = obj[wrapper]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


# ---------------------------------------------------------------------------
# Rule machinery
# ---------------------------------------------------------------------------

Rule = tuple[str, Callable[[re.Match, str], tuple[str, tuple[str, ...], Any]]]
# rule: (pattern over "name.attr", fn(match, attr) -> (collection, path, xform))


def _apply_rules(sd: dict[str, np.ndarray], rules: list[Rule]):
    params: dict = {}
    batch_stats: dict = {}
    for key, val in sd.items():
        for pattern, fn in rules:
            m = re.fullmatch(pattern, key)
            if m is None:
                continue
            res = fn(m)
            if res is None:
                break  # explicitly dropped
            coll, path, xform = res
            tree = params if coll == "params" else batch_stats
            _set(tree, path, xform(val))
            break
        else:
            raise KeyError(f"unmapped checkpoint key: {key}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _bn_leaf(attr: str):
    return {
        "weight": ("params", "scale", _ident),
        "bias": ("params", "bias", _ident),
        "running_mean": ("batch_stats", "mean", _ident),
        "running_var": ("batch_stats", "var", _ident),
    }[attr]


def _seq_block_rules(prefix_map: Callable[[str], tuple[str, ...]],
                     name_pattern: str,
                     deconv: bool = False) -> Rule:
    """Rule for the reference's Sequential conv()/deconv() blocks:
    `<name>.0.weight` (conv) and optional `<name>.1.*` (bn)."""

    sub = "deconv" if deconv else "conv"
    w_xform = _convT_w if deconv else _conv_w

    def fn(m):
        name = m.group(1)
        idx = m.group("idx")
        attr = m.group("attr")
        base = prefix_map(name)
        if idx == "0":
            if attr == "weight":
                return ("params", base + (sub, "kernel"), w_xform)
            return ("params", base + (sub, "bias"), _ident)
        coll, leaf, xform = _bn_leaf(attr)
        return (coll, base + ("bn", leaf), xform)

    return (
        rf"({name_pattern})\.(?P<idx>[01])\."
        rf"(?P<attr>weight|bias|running_mean|running_var)",
        fn,
    )


def _plain_conv_rule(name_pattern: str,
                     prefix_map: Callable[[str], tuple[str, ...]],
                     deconv: bool = False) -> Rule:
    w_xform = _convT_w if deconv else _conv_w

    def fn(m):
        base = prefix_map(m.group(1))
        if m.group("attr") == "weight":
            return ("params", base + ("kernel",), w_xform)
        return ("params", base + ("bias",), _ident)

    return (rf"({name_pattern})\.(?P<attr>weight|bias)", fn)


# ---------------------------------------------------------------------------
# FlowNet-family converters
# ---------------------------------------------------------------------------

_FLOWNET_DECODER_CONVT = r"upsampled_flow\d_to_\d"


def _flownet_encoder_decoder_rules(prefix: tuple[str, ...] = ()) -> list[Rule]:
    """Shared rules for FlowNetS/C-style nets built from submodules.py
    conv()/deconv()/predict_flow() (used standalone and inside FlowNet2)."""
    p = lambda name: prefix + (name,)
    return [
        _seq_block_rules(
            p,
            r"conv\d(?:_\d)?|conv_redir|conv0|inter_conv\d",
        ),
        _seq_block_rules(p, r"deconv\d", deconv=True),
        _plain_conv_rule(r"predict_flow\d", p),
        _plain_conv_rule(_FLOWNET_DECODER_CONVT, p, deconv=True),
    ]


def convert_flownet_s(sd: dict[str, np.ndarray]):
    """The factory's FlowNetS (= FlowNet2S class): nest under 'net'."""
    return _apply_rules(sd, _flownet_encoder_decoder_rules(("net",)))


def convert_flownet_c(sd: dict[str, np.ndarray]):
    return _apply_rules(sd, _flownet_encoder_decoder_rules())


def convert_flownet_c_flex(sd: dict[str, np.ndarray]):
    """FlowNetC_flexible_larger_field: 'convs1.0.0.weight' -> convs1_0;
    FlowNetC_predict_bias checkpoints use flat conv1/conv2/conv3 names and
    are covered by the base rules."""

    def flex_fn(m):
        base = (f"convs{m.group('stage')}_{m.group('rep')}",)
        if m.group("idx") == "0":
            if m.group("attr") == "weight":
                return ("params", base + ("conv", "kernel"), _conv_w)
            return ("params", base + ("conv", "bias"), _ident)
        coll, leaf, xform = _bn_leaf(m.group("attr"))
        return (coll, base + ("bn", leaf), xform)

    rules: list[Rule] = [
        (
            r"convs(?P<stage>[123])\.(?P<rep>\d)\.(?P<idx>[01])\."
            r"(?P<attr>weight|bias|running_mean|running_var)",
            flex_fn,
        )
    ] + _flownet_encoder_decoder_rules()
    return _apply_rules(sd, rules)


def convert_flownet_c_larger(sd: dict[str, np.ndarray]):
    """FlowNetC_larger_field (models/FlowNetC_larger_field.py:87-227):
    identical topology to FlowNetCFlex(kernel_size=5, number_of_reps=1)
    with flat stage names conv1/conv11/... — rename into the flex layout
    and delegate."""
    renamed = {}
    stage_map = {
        "conv1": "convs1.0", "conv11": "convs1.1",
        "conv2": "convs2.0", "conv21": "convs2.1",
        "conv3": "convs3.0", "conv31": "convs3.1",
    }
    for k, v in sd.items():
        head = k.split(".", 1)
        if head[0] in stage_map:
            k = stage_map[head[0]] + "." + head[1]
        renamed[k] = v
    return convert_flownet_c_flex(renamed)


def convert_flownet2(sd: dict[str, np.ndarray]):
    """FlowNet2 cascade: subnet-prefixed FlowNet-family keys."""

    def sub_fn_factory(deconv=False, seq=True):
        w = _convT_w if deconv else _conv_w

        def fn(m):
            base = (m.group("sub"), m.group("name"))
            attr = m.group("attr")
            idx = m.groupdict().get("idx")
            if seq:
                if idx == "0":
                    leaf = "deconv" if deconv else "conv"
                    if attr == "weight":
                        return ("params", base + (leaf, "kernel"), w)
                    return ("params", base + (leaf, "bias"), _ident)
                coll, leaf, xform = _bn_leaf(attr)
                return (coll, base + ("bn", leaf), xform)
            if attr == "weight":
                return ("params", base + ("kernel",), w)
            return ("params", base + ("bias",), _ident)

        return fn

    subs = r"(?P<sub>flownetc|flownets_1|flownets_2|flownets_d|flownetfusion)"
    rules: list[Rule] = [
        (
            rf"{subs}\.(?P<name>conv\d(?:_\d)?|conv_redir|conv0|inter_conv\d)"
            rf"\.(?P<idx>[01])\.(?P<attr>weight|bias|running_mean|running_var)",
            sub_fn_factory(deconv=False, seq=True),
        ),
        (
            rf"{subs}\.(?P<name>deconv\d)\.(?P<idx>[01])\."
            rf"(?P<attr>weight|bias|running_mean|running_var)",
            sub_fn_factory(deconv=True, seq=True),
        ),
        (
            rf"{subs}\.(?P<name>predict_flow\d)\.(?P<attr>weight|bias)",
            sub_fn_factory(deconv=False, seq=False),
        ),
        (
            rf"{subs}\.(?P<name>{_FLOWNET_DECODER_CONVT})"
            rf"\.(?P<attr>weight|bias)",
            sub_fn_factory(deconv=True, seq=False),
        ),
    ]
    return _apply_rules(sd, rules)


def convert_pwcnet(sd: dict[str, np.ndarray]):
    # deconv2 is a dead layer in the reference (defined at PWCNet.py:143,
    # never used in forward — the cascade stops at up_flow3); checkpoints
    # carry its params but our module has no counterpart.
    sd = {k: v for k, v in sd.items() if not k.startswith("deconv2.")}
    p = lambda name: (name,)

    def seq_conv_fn(m):
        base = (m.group(1),)
        if m.group("attr") == "weight":
            return ("params", base + ("kernel",), _conv_w)
        return ("params", base + ("bias",), _ident)

    rules: list[Rule] = [
        # Sequential(conv, LeakyReLU) blocks -> flat TorchConv in our PWC
        (
            r"(conv\d(?:aa|a|b)?|conv\d_\d|dc_conv[1-6])\.0\."
            r"(?P<attr>weight|bias)",
            seq_conv_fn,
        ),
        _plain_conv_rule(r"predict_flow\d|dc_conv7", p),
        _plain_conv_rule(r"deconv\d|upfeat\d", p, deconv=True),
    ]
    return _apply_rules(sd, rules)


def convert_raft(sd: dict[str, np.ndarray]):
    """RAFT checkpoints (raft-things.pth etc., 'module.' already stripped)."""

    def enc_fn(m):
        net = m.group("net")
        rest = m.group("rest")
        attr = m.group("attr")
        # layerX.Y.<leaf> -> layerX_Y/<leaf>
        lm = re.fullmatch(r"layer(\d)\.(\d)\.(.*)", rest)
        if lm:
            base: tuple[str, ...] = (net, f"layer{lm.group(1)}_{lm.group(2)}")
            rest = lm.group(3)
        else:
            base = (net,)
        # downsample.0 = conv, downsample.1 = norm3 (duplicate of normN key)
        if rest == "downsample.0":
            rest = "downsample"
        elif rest == "downsample.1":
            rest = "norm3"
        elif rest.endswith(".0"):
            # FlowNetCEncoder Sequential(conv, LeakyReLU) blocks
            # (models/raft/extractor.py:292-391)
            rest = rest[:-2]
        if rest.startswith("norm"):
            coll, leaf, xform = _bn_leaf(attr)
            return (coll, base + (rest, leaf), xform)
        if attr == "weight":
            return ("params", base + (rest, "kernel"), _conv_w)
        return ("params", base + (rest, "bias"), _ident)

    def upd_fn(m):
        name = m.group("name")
        attr = m.group("attr")
        name = name.replace("mask.0", "mask_0").replace("mask.2", "mask_2")
        parts = tuple(name.split("."))
        base = ("update_block",) + parts
        if attr == "weight":
            return ("params", base + ("kernel",), _conv_w)
        return ("params", base + ("bias",), _ident)

    rules: list[Rule] = [
        (
            r"(?P<net>fnet|cnet)\.(?P<rest>.+?)\."
            r"(?P<attr>weight|bias|running_mean|running_var)",
            enc_fn,
        ),
        (
            r"update_block\.(?P<name>.+?)\.(?P<attr>weight|bias)",
            upd_fn,
        ),
        _plain_conv_rule(r"conv_redir", lambda n: (n,)),
    ]
    return _apply_rules(sd, rules)


def convert_spynet_dir(weights_dir: str, nlevels: int = 6, strmodel: str = "F"):
    """Assemble SPyNet params from the per-level .pth.tar files
    (models/spynet.py:81-127).  Level index mapping: module level L loads
    file modelL{L+1}; chairs models ('3'/'4') reuse L5 files for L6."""
    import torch

    params: dict = {}
    for level in range(nlevels):
        file_level = level
        if level == 5 and strmodel in ("3", "4"):
            file_level = 4
        basic: dict = {}
        for k in range(5):
            stem = f"{weights_dir}/modelL{file_level + 1}_{strmodel}-{k + 1}"
            w = torch.load(f"{stem}-weight.pth.tar", map_location="cpu",
                           weights_only=False)
            b = torch.load(f"{stem}-bias.pth.tar", map_location="cpu",
                           weights_only=False)
            basic[f"conv{k}"] = {
                "kernel": _conv_w(np.asarray(w)),
                "bias": _ident(np.asarray(b)),
            }
        params[f"basic{level}"] = basic
    return {"params": params}


CONVERTERS = {
    "flownet_s": convert_flownet_s,
    "flownet_c": convert_flownet_c,
    "flownet_c_flex": convert_flownet_c_flex,
    "flownet_c_larger": convert_flownet_c_larger,
    "flownet2": convert_flownet2,
    "pwcnet": convert_pwcnet,
    "raft": convert_raft,
}
