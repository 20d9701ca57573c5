"""Standalone evaluation CLI (reference: training/evaluate.py:395-427).

The reference's ``__main__`` block builds a RAFT from ``--small /
--mixed_precision / --alternate_corr``, restores ``--model`` (a checkpoint
path), and runs ``validate_{chairs,sintel,kitti}`` picked by ``--dataset``.
Here the same surface drives any registry architecture via ``--arch``
(default RAFT like the reference), loads either a converted reference
``.pth``/``.pth.tar`` checkpoint or a flax ``.msgpack``, and adds
``--submission`` for the two benchmark writers the reference keeps
commented out (evaluate.py:415-416) plus ``--n_devices`` for mesh-sharded
KITTI validation (the DataParallel analog, evaluate.py:410).

Example:
  python -m understanding_flow_robustness_tpu.cli.evaluate \\
      --model checkpoints/raft/raft.msgpack --dataset kitti
"""

from __future__ import annotations

import argparse
import json

from ..models.registry import fetch_model, load_checkpoint_variables
from ..training import evaluate as ev
from ..utils import enable_compilation_cache


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="restore checkpoint "
                   "(reference .pth/.pth.tar, converted on load, or flax "
                   ".msgpack)")
    p.add_argument("--dataset", required=True,
                   choices=["chairs", "sintel", "kitti"],
                   help="dataset for evaluation")
    p.add_argument("--arch", default="RAFT",
                   help="registry architecture ID (the reference hardcodes "
                        "RAFT here; any models.get_flownet_choices() entry "
                        "works)")
    p.add_argument("--small", action="store_true", help="use small model")
    p.add_argument("--mixed_precision", action="store_true",
                   help="use mixed precision (bf16 compute); like the "
                        "reference this CLI evaluates in f32 unless set — "
                        "note the registry/bench default for RAFT/PWC "
                        "elsewhere IS mixed precision")
    p.add_argument("--alternate_corr", action="store_true",
                   help="use efficient correlation implementation (the "
                        "fused on-demand Pallas lookup; default 'auto' "
                        "already picks it on TPU)")
    p.add_argument("--iters", type=int, default=None,
                   help="RAFT refinement iterations (reference defaults: "
                        "24 chairs/kitti, 32 sintel)")
    p.add_argument("--submission", choices=["sintel", "kitti"], default=None,
                   help="write a benchmark submission instead of "
                        "validating (evaluate.py:200-267)")
    p.add_argument("--output_path", default=None,
                   help="submission output dir")
    p.add_argument("--warm_start", action="store_true",
                   help="Sintel submission warm-start flow propagation")
    p.add_argument("--n_devices", type=int, default=None,
                   help="shard KITTI validation batches over a data mesh")
    p.add_argument("--data_roots", type=str, default=None,
                   help="JSON dict of dataset roots, e.g. "
                        '\'{"kitti": "/data/KITTI"}\'')
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    enable_compilation_cache()

    kwargs = {}
    if args.arch.startswith("RAFT"):
        if args.small:
            kwargs["small"] = True
        kwargs["mixed_precision"] = args.mixed_precision
        if args.alternate_corr:
            kwargs["corr_impl"] = "alt"
        # reference iters: 24 for chairs/kitti, 32 for sintel
        # (evaluate.py:273,301,349)
        kwargs["iters"] = args.iters if args.iters is not None else (
            32 if args.dataset == "sintel" else 24)

    model = fetch_model(args.arch, pretrained_path=None, **kwargs)
    if args.model.endswith(".msgpack"):
        # full-variables (ufr-convert) or params-only (training export)
        from ..training.checkpoint import load_variables

        model.variables = load_variables(args.model, model.variables)
    else:
        from ..models.registry import _merge_strict

        loaded = load_checkpoint_variables(args.arch, args.model)
        model.variables = _merge_strict(model.variables, loaded, args.arch)

    roots = json.loads(args.data_roots) if args.data_roots else {}

    if args.submission == "sintel":
        from ..data.datasets import MpiSintel

        def dataset_fn(dstype):
            kw = {"root": roots["sintel"]} if "sintel" in roots else {}
            return MpiSintel(split="test", dstype=dstype, **kw)

        ev.create_sintel_submission(
            model, dataset_fn,
            output_path=args.output_path or "sintel_submission",
            warm_start=args.warm_start,
        )
        return

    if args.submission == "kitti":
        from ..data.datasets import KITTI

        kw = {"root": roots["kitti"]} if "kitti" in roots else {}
        ev.create_kitti_submission(
            model, KITTI(split="testing", **kw),
            output_path=args.output_path or "kitti_submission",
        )
        return

    if args.dataset == "chairs":
        from ..data.datasets import FlyingChairs

        kw = {"root": roots["chairs"]} if "chairs" in roots else {}
        ev.validate_chairs(model, FlyingChairs(split="validation", **kw))
    elif args.dataset == "sintel":
        from ..data.datasets import MpiSintel

        kw = {"root": roots["sintel"]} if "sintel" in roots else {}
        ev.validate_sintel(model, lambda d: MpiSintel(dstype=d, **kw))
    elif args.dataset == "kitti":
        from ..data.datasets import KITTI

        kw = {"root": roots["kitti"]} if "kitti" in roots else {}
        mesh = None
        if args.n_devices:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(args.n_devices)
        ev.validate_kitti(model, KITTI(split="training", **kw), mesh=mesh)


if __name__ == "__main__":
    main()
