"""Feature-embedding analysis (paper Fig. 3/9; reference:
patch_attacks/test_patch_embeddings.py).

Collects channel-mean feature maps with and without the patch
(:235-265), computes the Gaussian-kernel MMD per layer (:130-163), and
renders per-layer 2-D t-SNE scatters of clean vs patched embeddings as
PDFs (:417-441).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.patch import (
    circle_transform,
    create_circular_mask,
    create_correlated_patch,
    create_random_patch,
)
from ..utils.embedding import gaussian_mmd, tsne
from ..utils.meters import CsvLogger
from .test_patch import _val_samples, build_parser as _base_parser


def build_parser():
    p = _base_parser()
    p.description = __doc__
    p.add_argument("--feature_keys", nargs="+",
                   default=["conv3a", "corr", "conv_redir", "conv3_1"])
    p.add_argument("--max_samples", type=int, default=100)
    return p


def compute_feature_embedding(fm: np.ndarray) -> np.ndarray:
    """Spatial mean per channel (models/utils_model.py:562-624
    compute_feature_map semantics)."""
    return np.asarray(fm).mean(axis=(1, 2)).reshape(-1)


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
    def forward(img1, img2):
        out = model.module.apply(model.variables, img1, img2)
        return out[1]  # features dict

    if args.self_correlated_patch:
        patch = create_correlated_patch(args.self_correlated_patch,
                                        args.patch_size)
    elif args.patch_path:
        patch = np.load(args.patch_path)
    else:
        patch = create_random_patch(args.random_patch or "uniform",
                                    args.patch_size)
    m = create_circular_mask(patch.shape[1], patch.shape[2]).astype("float32")
    mask = np.tile(m[None, :, :, None], (1, 1, 1, 3))

    clean_embs: dict[str, list] = {k: [] for k in args.feature_keys}
    adv_embs: dict[str, list] = {k: [] for k in args.feature_keys}

    for i, _past, tgt, fut, gt, _disp, _calib, _poses in _val_samples(args):
        if i >= args.max_samples:
            break
        feats_clean = forward(jnp.asarray(tgt, jnp.float32),
                              jnp.asarray(fut, jnp.float32))
        pc, mc, _, _, _, _ = circle_transform(
            patch.copy(), mask, patch.copy(), tgt.shape, patch.shape,
            norotate=args.norotate, moving=True,
        )
        adv_tgt = np.clip((1 - mc) * tgt + mc * pc, 0, 1).astype(np.float32)
        adv_fut = np.clip((1 - mc) * fut + mc * pc, 0, 1).astype(np.float32)
        feats_adv = forward(jnp.asarray(adv_tgt), jnp.asarray(adv_fut))
        for k in args.feature_keys:
            clean_embs[k].append(compute_feature_embedding(feats_clean[k]))
            adv_embs[k].append(compute_feature_embedding(feats_adv[k]))

    out_dir = os.path.join(args.output, args.name)
    os.makedirs(out_dir, exist_ok=True)
    csv = CsvLogger(os.path.join(out_dir, "mmd.csv"), ["layer", "mmd"])

    for k in args.feature_keys:
        c = np.stack(clean_embs[k])
        a = np.stack(adv_embs[k])
        mmd = gaussian_mmd(c, a)
        csv.write([k, round(mmd, 6)])
        print(f"{k}: MMD {mmd:.6f}")

        emb2d = tsne(np.concatenate([c, a]), n_iter=300, seed=args.seed)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            n = len(c)
            plt.figure(figsize=(5, 5))
            plt.scatter(emb2d[:n, 0], emb2d[:n, 1], s=12, label="clean")
            plt.scatter(emb2d[n:, 0], emb2d[n:, 1], s=12, label="patched")
            plt.legend()
            plt.title(f"{args.flownet} {k}")
            plt.tight_layout()
            plt.savefig(os.path.join(out_dir, f"tsne_{k}.pdf"))
            plt.close()
        except Exception:
            np.save(os.path.join(out_dir, f"tsne_{k}.npy"), emb2d)
    return 0


if __name__ == "__main__":
    main()
