"""Training / adversarial fine-tuning CLI
(reference: training/train.py:355-636).

Stages: chairs/things/sintel/kitti with the reference aug params; RAFT or
FlowNetC-family/PWC architectures; --adversarial enables the per-batch
I-FGSM adversarial-training branch (train.py:171-221).  --synthetic N runs
on random data for smoke testing.

Example:
  python -m understanding_flow_robustness_tpu.cli.train --model RAFT \\
      --stage chairs --num_steps 100 --batch_size 2 --synthetic 4
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attacks.global_attacks import PerturbConfig
from ..training.trainer import TrainConfig, train


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="flow", help="experiment name")
    p.add_argument("--model", default="RAFT",
                   help="model ID (models.get_flownet_choices) or RAFT")
    p.add_argument("--stage", default="chairs",
                   choices=["chairs", "things", "sintel", "kitti"])
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs=2, default=[368, 496])
    p.add_argument("--wdecay", type=float, default=1e-4)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--val_freq", type=int, default=5000)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--trans_rot", action="store_true")
    p.add_argument("--adversarial", action="store_true")
    p.add_argument("--adv_method", default="ifgsm")
    p.add_argument("--adv_norm", type=float, default=0.02)
    p.add_argument("--adv_loss", default="l2")
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--data_roots", type=str, default=None,
                   help="JSON dict of dataset roots")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ..models import fetch_model
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    kwargs = {}
    if args.model.startswith("RAFT"):
        kwargs["iters"] = args.iters
    model = fetch_model(args.model, pretrained_path=None, **kwargs)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(model.variables["params"]))
    print(f"Parameter Count: {n_params}")  # training/train.py:102
    if args.restore_ckpt:
        from ..training.checkpoint import load_weights

        model.variables["params"] = load_weights(
            args.restore_ckpt, model.variables["params"]
        )

    is_flownetc_style = not model.is_raft
    cfg = TrainConfig(
        name=args.name, stage=args.stage,
        image_size=tuple(args.image_size), batch_size=args.batch_size,
        lr=args.lr, wdecay=args.wdecay, epsilon=args.epsilon,
        clip=args.clip, gamma=args.gamma, num_steps=args.num_steps,
        val_freq=args.val_freq,
        checkpoint_dir=os.path.join(args.checkpoint_dir, args.name),
        loss_type="sequence",
        flownetc=is_flownetc_style, pwc="PWC" in args.model,
        # train.py:130-137: BN frozen for non-chairs stages, but only for
        # RAFT-style models (flexible/FlowNetC/PWC are excluded there).
        freeze_bn=args.stage != "chairs" and model.is_raft,
        adversarial=args.adversarial,
        adv_config=PerturbConfig(
            perturb_method=args.adv_method, flow_loss=args.adv_loss,
            output_norm=args.adv_norm,
        ),
        n_devices=args.n_devices, seed=args.seed,
    )

    if args.synthetic:
        h, w = args.image_size

        def batches():
            rng = np.random.RandomState(args.seed)
            for _ in range(args.synthetic):
                yield {
                    "image1": rng.rand(args.batch_size, h, w, 3).astype(
                        np.float32),
                    "image2": rng.rand(args.batch_size, h, w, 3).astype(
                        np.float32),
                    "flow": rng.randn(args.batch_size, h, w, 2).astype(
                        np.float32),
                    "valid": np.ones((args.batch_size, h, w), np.float32),
                }
    else:
        import json

        from ..data import DataLoader, fetch_dataset

        roots = json.loads(args.data_roots) if args.data_roots else None
        dataset = fetch_dataset(args.stage, tuple(args.image_size),
                                trans_rot=args.trans_rot, roots=roots)

        def batches():
            loader = DataLoader(dataset, batch_size=args.batch_size,
                                shuffle=True, num_workers=4, seed=args.seed)
            yield from loader

    def logger(step, metrics):
        if step % 100 == 0 or step < 10:
            msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"step {step}: {msg}")

    params, stats, steps = train(cfg, model, batches, logger=logger)
    print(f"training done at step {steps}")


if __name__ == "__main__":
    main()
