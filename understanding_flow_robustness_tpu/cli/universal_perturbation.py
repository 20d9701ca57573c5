"""Universal perturbation training CLI
(reference: global_attacks/universal_perturbation.py:31-158 argparse,
:161-353 run()).

Trains a single shared two-frame perturbation with jitted n-step I-FGSM
descent toward the negated clean flow; per-epoch snapshots under
<output>/<name>/perturbations/ and validation EPE reporting.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import (
    UniversalConfig,
    make_universal_attack_step,
    train_universal_perturbation,
)
from ..attacks.losses import compute_epe


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="datasets/KITTI/2012_prepared")
    p.add_argument("--flownet", default="FlowNetC")
    p.add_argument("--pretrained_path", default="pretrained_models")
    p.add_argument("--perturb_method", default="ifgsm",
                   choices=["ifgsm", "ifgm"])
    p.add_argument("--perturb_mode", default="both",
                   choices=["both", "left", "right"])
    p.add_argument("--output_norm", type=float, default=0.02)
    p.add_argument("--n_step", type=int, default=40)
    p.add_argument("--learning_rate", type=float, default=2e-3)
    p.add_argument("--flow_loss", default="l2", choices=["l2", "l1", "cossim"])
    p.add_argument("--add_gaussian", action="store_true")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch-size", type=int, default=100)
    p.add_argument("--image-size", type=int, nargs=2, default=[256, 640])
    p.add_argument("--name", default="universal")
    p.add_argument("--output", default="output/universal")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)

    from ..models import fetch_model
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(args.flownet, pretrained_path=(
        args.pretrained_path if os.path.isdir(args.pretrained_path) else None
    ))
    predict = lambda a, b: model.predict(a, b)
    predict_jit = jax.jit(predict)

    cfg = UniversalConfig(
        perturb_method=args.perturb_method, perturb_mode=args.perturb_mode,
        output_norm=args.output_norm, n_step=args.n_step,
        learning_rate=args.learning_rate, flow_loss=args.flow_loss,
        add_gaussian=args.add_gaussian,
    )
    attack_step = make_universal_attack_step(predict, cfg)

    h, w = args.image_size
    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    def batches():
        if args.synthetic:
            rng = np.random.RandomState(args.seed)
            for _ in range(args.synthetic):
                yield (rng.rand(1, h, w, 3).astype(np.float32),
                       rng.rand(1, h, w, 3).astype(np.float32))
            return
        from ..data import Compose, Scale, SequenceFolder, ToFloat01

        ds = SequenceFolder(
            args.data, seed=args.seed, train=True, sequence_length=3,
            transform=Compose([Scale(h, w), ToFloat01()]),
        )
        for i in range(len(ds)):
            tgt, refs, _ = ds[i]
            yield tgt[None], refs[1][None]

    def on_epoch_end(epoch, n0, n1):
        # epoch-end validation: EPE degradation vs clean prediction on one
        # held-out-style batch (universal_perturbation.py:533+)
        tgt, fut = next(iter(batches()))
        tgt, fut = jnp.asarray(tgt), jnp.asarray(fut)
        clean = predict_jit(tgt, fut)
        gt = jnp.concatenate([clean, jnp.ones_like(clean[..., :1])], -1)
        adv = predict_jit(jnp.clip(tgt + n0, 0, 1), jnp.clip(fut + n1, 0, 1))
        print(f"epoch {epoch}: |noise|_max {np.abs(n0).max():.4f}  "
              f"adv-EPE vs clean flow {float(compute_epe(gt, adv)):.3f}")

    n0, n1 = train_universal_perturbation(
        predict_jit, attack_step, batches, (1, h, w, 3), cfg,
        epochs=args.epochs, epoch_size=args.epoch_size, save_dir=out_dir,
        rng=np.random.RandomState(args.seed), on_epoch_end=on_epoch_end,
    )
    print(f"saved perturbations under {out_dir}/perturbations")
    return n0, n1


if __name__ == "__main__":
    main()
