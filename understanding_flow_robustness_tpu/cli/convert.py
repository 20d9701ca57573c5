"""Checkpoint converter CLI (`ufr-convert`) — torch zoo -> flax msgpack.

The registry converts reference ``.pth``/``.pth.tar`` checkpoints on every
load (models/convert.py: RAFT positional remap, SPyNet per-level files,
FlowNet2 nested modules, DataParallel prefixes — reference loading rules
at models/utils_model.py:100-156).  For production serving that repeats a
torch dependency and the conversion cost at every process start; this CLI
converts once, validates shapes against the model's initialized pytree
(strict load_state_dict semantics), and writes a ``.msgpack`` holding the
FULL variables dict (params + any batch_stats running averages) that
``fetch_model(name, pretrained_path="model.msgpack")``, ``ufr-evaluate
--model`` and ``ufr-infer --pretrained`` restore without torch.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to flax msgpack")
    p.add_argument("--flownet", required=True,
                   help="model ID (models.registry.fetch_model)")
    p.add_argument("--src", required=True,
                   help="torch checkpoint file (.pth/.pth.tar) or the "
                        "SpyNet per-level weight directory")
    p.add_argument("--dst", required=True, help="output .msgpack path")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not os.path.exists(args.src):
        raise SystemExit(f"checkpoint not found: {args.src}")
    if not args.dst.endswith(".msgpack"):
        raise SystemExit("--dst must end in .msgpack")

    from flax import serialization

    from ..models import fetch_model
    from ..models.registry import _merge_strict, load_checkpoint_variables

    model = fetch_model(args.flownet, pretrained_path=None)
    loaded = load_checkpoint_variables(args.flownet, args.src)
    variables = _merge_strict(model.variables, loaded, args.flownet)

    os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
    with open(args.dst, "wb") as f:
        f.write(serialization.to_bytes(dict(variables)))
    size = os.path.getsize(args.dst)
    print(f"{args.flownet}: {args.src} -> {args.dst} ({size / 1e6:.1f} MB)")
    return args.dst


if __name__ == "__main__":
    main()
