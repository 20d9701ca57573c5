"""Feature-replacement analysis (paper Table 2; reference:
patch_attacks/test_replace_features.py:140-599).

For each sample: place a uniform patch and the test patch with IDENTICAL
transforms (circle_transform_two_patches); run the model on the
uniform-patch images capturing feature maps at the chosen keys (e.g.
``corr``, ``conv_redir``); run again on the test-patch images with those
captured maps INJECTED (``overrides``) — measuring how much of the attack
flows through each feature pathway.  Writes results.csv + the key-set
bookkeeping JSON (:171-191).

In the reference this needs forward hooks + globals; here capture and
injection are first-class functional arguments of the models.
"""

from __future__ import annotations

import itertools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.losses import compute_cossim, compute_epe
from ..attacks.patch import (
    circle_transform_two_patches,
    create_circular_mask,
    create_correlated_patch,
    create_random_patch,
)
from ..utils.meters import AverageMeter, CsvLogger
from .test_patch import _val_samples, build_parser as _base_parser


def build_parser():
    p = _base_parser()
    p.description = __doc__
    p.add_argument("-fk", "--feature_keys", nargs="+", default=["corr"],
                   help="feature maps to replace (conv3a conv3b corr "
                        "conv_redir conv3_1)")
    p.add_argument("--all_key_subsets", action="store_true",
                   help="sweep every non-empty subset of --feature_keys")
    p.add_argument("--uniform_patch", type=str, default="gray",
                   help="reference patch type for the captured features")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)

    from ..models import fetch_model
    from ..models.registry import checkpoint_arg as _ckpt_path
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    model = fetch_model(
        args.flownet,
        pretrained_path=_ckpt_path(args.pretrained_path),
        return_features=True,
    )

    @jax.jit
    def predict_with_features(img1, img2):
        return model.module.apply(model.variables, img1, img2)

    def predict_with_overrides(img1, img2, overrides):
        out = model.module.apply(
            model.variables, img1, img2, overrides=overrides
        )
        return out[0] if isinstance(out, tuple) else out

    if args.self_correlated_patch:
        patch = create_correlated_patch(args.self_correlated_patch,
                                        args.patch_size)
    elif args.patch_path:
        patch = np.load(args.patch_path)
    else:
        patch = create_random_patch(args.random_patch or "uniform",
                                    args.patch_size)
    uniform = create_random_patch(args.uniform_patch, patch.shape[1])
    m = create_circular_mask(patch.shape[1], patch.shape[2]).astype("float32")
    mask = np.tile(m[None, :, :, None], (1, 1, 1, 3))
    patch_shape = patch.shape

    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)

    key_sets = [tuple(args.feature_keys)]
    if args.all_key_subsets:
        key_sets = [
            s for r in range(1, len(args.feature_keys) + 1)
            for s in itertools.combinations(args.feature_keys, r)
        ]
    with open(os.path.join(out_dir, "key_sets.json"), "w") as f:
        json.dump([list(s) for s in key_sets], f)

    csv = CsvLogger(
        os.path.join(out_dir, "results.csv"),
        ["keys", "epe", "adv_epe", "replaced_epe", "cos_sim", "adv_cos_sim",
         "replaced_cos_sim"],
    )

    for keys in key_sets:
        errors = AverageMeter(i=6)
        for i, _past, tgt, fut, gt, _d, _c, _p in _val_samples(args):
            c_uni, c_test, mc, _, _, rx, ry, _ = circle_transform_two_patches(
                [uniform.copy(), patch.copy()], mask,
                [uniform.copy(), patch.copy()], tgt.shape, patch_shape,
                norotate=args.norotate,
            )

            def composite(canvas):
                a = np.clip((1 - mc) * tgt + mc * canvas, 0, 1)
                b = np.clip((1 - mc) * fut + mc * canvas, 0, 1)
                return (jnp.asarray(a, jnp.float32),
                        jnp.asarray(b, jnp.float32))

            uni_tgt, uni_fut = composite(c_uni)
            test_tgt, test_fut = composite(c_test)

            flow_clean = predict_with_features(
                jnp.asarray(tgt, jnp.float32), jnp.asarray(fut, jnp.float32)
            )[0]
            flow_adv, feats_uni = predict_with_features(uni_tgt, uni_fut)
            # replace the selected features of the test-patch forward with
            # the uniform-patch activations (test_replace_features.py:382-396)
            overrides = {k: feats_uni[k] for k in keys}
            flow_replaced = predict_with_overrides(
                test_tgt, test_fut, overrides
            )
            flow_test = predict_with_features(test_tgt, test_fut)[0]

            gt_j = jnp.asarray(gt)
            vals = [
                float(compute_epe(gt_j, flow_clean)),
                float(compute_epe(gt_j, flow_test)),
                float(compute_epe(gt_j, flow_replaced)),
                float(compute_cossim(gt_j, flow_clean)),
                float(compute_cossim(gt_j, flow_test)),
                float(compute_cossim(gt_j, flow_replaced)),
            ]
            errors.update(vals)
        csv.write(["+".join(keys)] + [round(v, 4) for v in errors.avg])
        print(f"keys={keys}: clean {errors.avg[0]:.3f} "
              f"adv {errors.avg[1]:.3f} replaced {errors.avg[2]:.3f}")
    return errors.avg


if __name__ == "__main__":
    main()
