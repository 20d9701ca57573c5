"""Training / adversarial fine-tuning CLI
(reference: training/train.py:355-636).

Stages: chairs/things/sintel/kitti with the reference aug params; RAFT or
FlowNetC-family/PWC architectures; --adversarial (alias --adv_train)
enables the per-batch I-FGSM adversarial-training branch
(train.py:171-221).  --synthetic N runs on random data for smoke testing.

Model-architecture flags: the reference composes architectures from ~40
boolean flags (--flowNetC, --raft_small, --kernel_size, --numReps, ...);
here the composed variants are registry IDs passed via --model
(models.get_flownet_choices: FlowNetS, FlowNetC, FlowNet2,
FlowNetCFlexLarger_k3_reps3, FlowNetCFlexLarger_k5_reps0, SpyNet, PWCNet,
RAFT, RAFT_FlowNetCEncoder_WoContext, and the *_adv_* variants).

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
                   choices=["chairs", "things", "sintel", "kitti",
                            "kitti2015", "kitti2012"],
                   help="training stage; kitti2015/kitti2012 are the "
                        "Scale'd pair stages the reference's adversarial "
                        "branch requires (training/utils.py:245-272)")
    p.add_argument("--restore_ckpt", default=None)
    # reference defaults (training/train.py:370-373): lr 0.000125,
    # image_size 256x640 — NOT upstream RAFT's 4e-4 / 368x496
    p.add_argument("--lr", type=float, default=0.000125)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 640])
    p.add_argument("--data_list_dir", type=str,
                   default="datasets/KITTI/global_attacks/training",
                   help="path-list dir for the kitti2015/kitti2012 pair "
                        "stages (setup_dataset_kitti.py output)")
    p.add_argument("--wdecay", type=float, default=1e-4)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--val_freq", type=int, default=None,
                   help="default derives like train.py:143-148: 1000 "
                        "adversarial / 100 finetune / 5000 otherwise")
    p.add_argument("--validation", type=str, nargs="+", default=None,
                   choices=["chairs", "sintel", "kitti"],
                   help="validation sets run at every val_freq "
                        "(train.py:302-313); requires the datasets on disk")
    p.add_argument("--checkpoint_dir", "--ckpt_dir", dest="checkpoint_dir",
                   default="checkpoints")
    p.add_argument("--trans_rot", action="store_true")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16-compute mixed precision (the TPU analog of "
                        "the reference's GradScaler AMP, train.py:139); "
                        "RAFT/PWC registry entries default to it already — "
                        "this forces it on for a model that doesn't")
    p.add_argument("--multiscaleEPE", action="store_true",
                   help="use the multiscale EPE loss instead of the "
                        "default sequence loss (train.py:245-264)")
    p.add_argument("--no_excluding", action="store_true",
                   help="accepted for parity; a dead no-op upstream too "
                        "(training/utils.py:88-91 re-thresholds the "
                        "already-boolean mask)")
    p.add_argument("--add_noise", action="store_true",
                   help="per-batch gaussian image noise, stdv ~ U(0,5) on "
                        "the 0-255 scale (train.py:162-169)")
    p.add_argument("--finetune", action="store_true",
                   help="finetune mode: val_freq 100 (train.py:145-148)")
    p.add_argument("--adversarial", "--adv_train", dest="adversarial",
                   action="store_true")
    p.add_argument("--adv_method", "--perturb_method", dest="adv_method",
                   default="ifgsm")
    p.add_argument("--perturb_mode", default="both",
                   choices=["both", "left", "right"])
    p.add_argument("--adv_norm", "--output_norm", dest="adv_norm",
                   type=float, default=0.02)
    p.add_argument("--adv_loss", "--flow_loss", dest="adv_loss",
                   default="l2")
    p.add_argument("--perturb_n_step", type=int, default=40)
    p.add_argument("--perturb_learning_rate", type=float, default=2e-3)
    p.add_argument("--perturb_momentum", type=float, default=0.47)
    p.add_argument("--probability_diverse_input", type=float, default=0.0)
    p.add_argument("--arbitrary_gt", action="store_true",
                   help="targeted adversarial training toward a random "
                        "train sample's GT (train.py:151,188-199)")
    p.add_argument("--n_devices", "--gpus", dest="n_devices", type=int,
                   default=None,
                   help="devices in the data-parallel mesh (the reference's "
                        "--gpus list becomes a device count here)")
    # reference get_model() architecture flags (training/train.py:55-92);
    # they translate to registry IDs + module kwargs.  --model keeps
    # working and takes precedence only when no reference flag is given.
    p.add_argument("--flowNetC", action="store_true",
                   help="train a FlowNetC-family model (train.py:489)")
    p.add_argument("--flexible_larger_field", action="store_true",
                   help="FlowNetC_flexible_larger_field (train.py:503)")
    p.add_argument("--larger_field", action="store_true",
                   help="FlowNetC_larger_field (train.py:497; the k5/reps1 "
                        "flex alias)")
    p.add_argument("--kernel_size", type=int, default=5,
                   help="flex FlowNetC kernel size (train.py:508)")
    p.add_argument("--numReps", type=int, default=0,
                   help="flex FlowNetC conv repetitions (train.py:511)")
    p.add_argument("--dilation", type=int, default=1,
                   help="flex FlowNetC dilation (train.py:528)")
    p.add_argument("--div_flow", type=float, default=1,
                   help="flow scaling for FlowNetC variants (train.py:446)")
    p.add_argument("--pwc", action="store_true",
                   help="train PWC-Net (train.py:531)")
    p.add_argument("--pwcflex", action="store_true",
                   help="PWCNetFlex (train.py:89) — broken in the "
                        "reference itself (models/PWCNetFlex.py does not "
                        "exist; models/__init__.py:8 imports it anyway), "
                        "so this raises the equivalent error")
    p.add_argument("--pwc_correlations", nargs="+", default=None,
                   help="PWCNetFlex per-level correlation switches "
                        "(train.py:534; only meaningful with --pwcflex)")
    p.add_argument("--small", "--raft_small", dest="small",
                   action="store_true", help="small RAFT (train.py:424)")
    p.add_argument("--fnorm", default="instance",
                   choices=["none", "batch", "group", "instance"],
                   help="RAFT feature-encoder norm (train.py:401)")
    p.add_argument("--cnorm", default="batch",
                   choices=["none", "batch", "group", "instance"],
                   help="RAFT context-encoder norm (train.py:407)")
    p.add_argument("--no_separate_context", action="store_true",
                   help="RAFT conv_redir context variant")
    p.add_argument("--flowNetCEnc", action="store_true",
                   help="RAFT FlowNetC encoder variant")
    p.add_argument("--compute_spatial", action="store_true",
                   help="RAFT spatial-correlation mode")
    p.add_argument("--corr_levels", type=int, default=4)
    p.add_argument("--corr_radius", type=int, default=4)
    p.add_argument("--flownetc_weighing", action="store_true",
                   help="FlowNetC per-scale loss weights in multiscale_epe "
                        "(train.py:448, utils.py:119)")
    p.add_argument("--alternate_corr", action="store_true",
                   help="RAFT on-demand correlation (train.py:436; here "
                        "the fused Pallas lookup, the TPU alt_cuda_corr — "
                        "already the default on TPU, this forces it)")
    p.add_argument("--online_subset", type=int, nargs="+", default=None,
                   help="train on a fixed subset of dataset indices "
                        "(training/utils.py:275-283)")
    # Dead-upstream experimental flags: the reference PARSES these but
    # their model-construction code is commented out (train.py:66-84), the
    # module never reads them, or the live read crashes on a channel
    # mismatch (--update_no_motion_downsampling, raft/update.py:110-119:
    # skipping convc2 feeds 256+64 channels into a 256-input conv).
    # Accepted for flag-surface compatibility; selecting one raises.
    for flag in ("--flowNetCFlexible", "--larger_field2", "--relu_wo_out",
                 "--net_relu", "--no_residuals", "--no_sep_gru",
                 "--iterative", "--single", "--pinard", "--predict_bias",
                 "--raft_leaky_relu", "--raft_no_out_conv", "--corr_conv",
                 "--first_conv_5", "--relu",
                 "--update_no_motion_downsampling"):
        p.add_argument(flag, action="store_true",
                       dest=f"dead_{flag.lstrip('-')}",
                       help="dead in the reference (train.py:66-84 "
                            "commented out / never read); raises here")
    p.add_argument("--raft_kernel_size", type=int, default=3,
                   help="dead in the reference (only the commented-out "
                        "FlowNetCFlexible path reads it); raises if != 3")
    p.add_argument("--flowNetC_corrDepth", type=int, default=None,
                   help="dead in the reference; raises if set")
    p.add_argument("--flowNetC_separateContext", action="store_true",
                   dest="dead_flowNetC_separateContext",
                   help="dead in the reference; raises here")
    p.add_argument("--flowNetC_raftEncoder", action="store_true",
                   dest="dead_flowNetC_raftEncoder",
                   help="dead in the reference; raises here")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="encoder dropout (train.py:398; reference default "
                        "0 — nonzero is not supported here)")
    p.add_argument("--model_kwargs", type=str, default=None,
                   help="JSON dict of extra module kwargs (escape hatch "
                        "for registry build overrides)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--DEBUG", action="store_true",
                   help="iters=3, no checkpoint/logger writes "
                        "(train.py:140-141,235,286-289)")
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
    if args.dropout > 0:
        raise NotImplementedError(
            "--dropout > 0 is not supported (the reference default is 0; "
            "no released checkpoint trains with it)")
    dead = [k for k, v in vars(args).items() if k.startswith("dead_") and v]
    if args.raft_kernel_size != 3:
        dead.append("raft_kernel_size")
    if args.flowNetC_corrDepth is not None:
        dead.append("flowNetC_corrDepth")
    if dead:
        raise NotImplementedError(
            f"{sorted(dead)}: dead in the reference itself — the model "
            "construction for these flags is commented out "
            "(training/train.py:66-84), the modules never read them, or "
            "the live read crashes upstream "
            "(--update_no_motion_downsampling, models/raft/update.py:"
            "110-119 channel mismatch)")

    # reference get_model() dispatch (training/train.py:55-92)
    kwargs = {}
    if args.flowNetC:
        if args.flexible_larger_field:
            args.model = "FlowNetCFlexLarger_k3_reps3"
            kwargs.update(kernel_size=args.kernel_size,
                          number_of_reps=args.numReps,
                          dilation=args.dilation, div_flow=args.div_flow)
        elif args.larger_field:
            args.model = "FlowNetC_larger_field"
            kwargs.update(div_flow=args.div_flow)
        else:
            args.model = "FlowNetC"
            if args.div_flow != 1:
                kwargs.update(div_flow=args.div_flow)
    elif args.pwcflex:
        raise NotImplementedError(
            "PWCNetFlex does not exist in the reference repo either "
            "(models/PWCNetFlex.py is missing; its import at "
            "models/__init__.py:8 makes the reference's --pwcflex branch "
            "unrunnable) — use --pwc")
    elif args.pwc:
        args.model = "PWCNet"

    if args.model.startswith("RAFT"):
        kwargs["iters"] = 3 if args.DEBUG else args.iters  # train.py:235
        if jax.default_backend() == "tpu":
            # XLA picks a pathologically slow conv strategy at batch 2-4
            # on v5e (see RAFT.batched); tiling the encoder batch to >= 8
            # is value-identical (exactly duplicated samples leave batch
            # statistics unchanged) and ~3x faster
            kwargs.setdefault("batch_pad_encoders", True)
        if args.small:
            kwargs["small"] = True
        if args.fnorm != "instance":
            kwargs["fnorm"] = args.fnorm
        if args.cnorm != "batch":
            kwargs["cnorm"] = args.cnorm
        if args.no_separate_context:
            kwargs["no_separate_context"] = True
        if args.flowNetCEnc:
            kwargs["flownetc_encoder"] = True
        if args.compute_spatial:
            kwargs["compute_spatial"] = True
        if args.corr_levels != 4:
            kwargs["corr_levels"] = args.corr_levels
        if args.corr_radius != 4:
            kwargs["corr_radius"] = args.corr_radius
        if args.alternate_corr:
            # force the fused on-demand lookup (the TPU alt_cuda_corr);
            # on non-TPU backends the Pallas kernel cannot lower, and
            # corr_impl="auto" already picks the right path per backend
            if jax.default_backend() == "tpu":
                kwargs["corr_impl"] = "alt"
            else:
                print("--alternate_corr: no TPU backend; keeping "
                      "corr_impl='auto' (the volume path)")
    if args.mixed_precision:
        kwargs["mixed_precision"] = True
    if args.model_kwargs:
        import json as _json

        kwargs.update(_json.loads(args.model_kwargs))
    model = fetch_model(args.model, pretrained_path=None, **kwargs)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(model.variables["params"]))
    print(f"Parameter Count: {n_params}")  # training/train.py:102
    if args.restore_ckpt:
        from ..training.checkpoint import load_weights

        model.variables["params"] = load_weights(
            args.restore_ckpt, model.variables["params"]
        )

    if args.val_freq is None:
        # train.py:143-148
        args.val_freq = (1000 if args.adversarial
                         else 100 if args.finetune else 5000)

    is_flownetc_style = not model.is_raft
    cfg = TrainConfig(
        name=args.name, stage=args.stage,
        image_size=tuple(args.image_size), batch_size=args.batch_size,
        lr=args.lr, wdecay=args.wdecay, epsilon=args.epsilon,
        clip=args.clip, gamma=args.gamma, num_steps=args.num_steps,
        val_freq=args.val_freq,
        checkpoint_dir=os.path.join(args.checkpoint_dir, args.name),
        # train.py:245-264: sequence loss by default for EVERY model
        # (its flownetc/pwc flags handle the per-scale path); multiscale
        # only with --multiscaleEPE
        loss_type="multiscale" if args.multiscaleEPE else "sequence",
        flownetc=is_flownetc_style, pwc="PWC" in args.model,
        flownetc_weighing=args.flownetc_weighing,
        # train.py:130-137: BN frozen for non-chairs stages, but only for
        # RAFT-style models (flexible/FlowNetC/PWC are excluded there).
        freeze_bn=args.stage != "chairs" and model.is_raft,
        adversarial=args.adversarial,
        adv_config=PerturbConfig(
            perturb_method=args.adv_method, flow_loss=args.adv_loss,
            output_norm=args.adv_norm, perturb_mode=args.perturb_mode,
            n_step=args.perturb_n_step,
            learning_rate=args.perturb_learning_rate,
            momentum=args.perturb_momentum,
            probability_diverse_input=args.probability_diverse_input,
            targeted=args.arbitrary_gt,  # train.py:183
        ),
        n_devices=args.n_devices, seed=args.seed,
        add_noise=args.add_noise, arbitrary_gt=args.arbitrary_gt,
        not_excluding=args.no_excluding,
        save_checkpoints=not args.DEBUG,
    )

    def _finish_dataset(args, dataset):
        if args.online_subset is not None:
            # train on a fixed index subset (training/utils.py:275-276)
            from ..data.datasets import Subset

            dataset = Subset(dataset, list(args.online_subset))
        return dataset

    def _make_batches(loader, dataset):
        def batches():
            yield from loader

        def sample_gt_fn(rng):
            # a RANDOM train sample's GT (train.py:188-199)
            _, _, flow, valid = dataset[rng.randint(len(dataset))][:4]
            return np.asarray(flow)[None], np.asarray(valid)[None]

        return batches, sample_gt_fn

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

        def sample_gt_fn(rng):
            # random-sample GT for --arbitrary_gt in synthetic mode
            flow = rng.randn(args.batch_size, h, w, 2).astype(np.float32)
            valid = np.ones((args.batch_size, h, w), np.float32)
            return flow, valid
    elif args.stage in ("kitti2015", "kitti2012"):
        # the reference's adversarial-training data path
        # (training/utils.py:245-289): Scale'd KITTI pair dataset with the
        # SMALL (rescaled sparse-aware) GT as the training flow, batch 1
        if args.adversarial:
            assert args.batch_size == 1, "Only works for batch size 1!"
        from ..data import DataLoader
        from ..data.validation import KittiPairDataset

        class _PairView:
            """(img0, img1, gt_small, gt_full) -> loader 4-tuple with the
            small GT as the training target (kitti_datasets.py:112-118
            finetune return; the full-res GT only feeds the reference's
            epe_attacked metric)."""

            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                img0, img1, gt_small, _ = self.ds[i]
                # DataLoader._collate divides images by 255
                return (img0 * 255.0, img1 * 255.0,
                        gt_small[..., :2], gt_small[..., 2])

        dataset = _PairView(KittiPairDataset.from_lists(
            args.data_list_dir,
            year="2015" if args.stage == "kitti2015" else "2012",
            split="train",
            n_height=args.image_size[0], n_width=args.image_size[1],
        ))
        dataset = _finish_dataset(args, dataset)
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=True, num_workers=4, seed=args.seed)
        batches, sample_gt_fn = _make_batches(loader, dataset)
    else:
        import json

        from ..data import DataLoader, fetch_dataset

        roots = json.loads(args.data_roots) if args.data_roots else None
        if args.adversarial:
            raise SystemExit(
                "--adversarial needs --stage kitti2015 or kitti2012 (the "
                "reference's adv_train branch, training/utils.py:245-272, "
                "raises NotImplementedError for other stages)")
        dataset = _finish_dataset(args, fetch_dataset(
            args.stage, tuple(args.image_size),
            trans_rot=args.trans_rot, roots=roots))

        # ONE loader for the whole run: its RandomState advances across
        # epochs, so each batches() pass sees a fresh shuffle — torch's
        # DataLoader(shuffle=True) reshuffles per epoch the same way.
        # (Rebuilding the loader per epoch would replay the seed's first
        # permutation every epoch.)
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=True, num_workers=4, seed=args.seed)
        batches, sample_gt_fn = _make_batches(loader, dataset)

    validate_fn = None
    if args.validation:
        from ..training import evaluate as ev

        def validate_fn(params, batch_stats, step):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            model.variables = variables
            for valset in args.validation:
                try:
                    if valset == "kitti":
                        from ..data.datasets import KITTI

                        res = ev.validate_kitti(model, KITTI(split="training"))
                    elif valset == "sintel":
                        from ..data.datasets import MpiSintel

                        res = ev.validate_sintel(
                            model, lambda d: MpiSintel(dstype=d))
                    else:
                        from ..data.datasets import FlyingChairs

                        res = ev.validate_chairs(
                            model, FlyingChairs(split="validation"))
                    print(f"step {step} [{valset}]: " + " ".join(
                        f"{k}={v:.3f}" for k, v in res.items()))
                except (FileNotFoundError, OSError) as e:
                    print(f"step {step} [{valset}]: skipped ({e})")

    def logger(step, metrics):
        if step % 100 == 0 or step < 10:
            msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"step {step}: {msg}")

    params, stats, steps = train(
        cfg, model, batches, validate_fn=validate_fn,
        logger=None if args.DEBUG else logger,
        sample_gt_fn=sample_gt_fn if args.arbitrary_gt else None,
    )
    print(f"training done at step {steps}")


if __name__ == "__main__":
    main()
