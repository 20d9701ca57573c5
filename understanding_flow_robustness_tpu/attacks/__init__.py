"""Adversarial attacks: global perturbations, patches, universal noise."""

from .global_attacks import (
    PerturbConfig,
    fgsm,
    gaussian_noise,
    ifgsm,
    make_jitted_attack,
    make_sharded_attack,
    make_spatial_attack,
    mifgsm,
    perturb,
    uniform_noise,
)
from .losses import (
    compute_cossim,
    compute_epe,
    compute_l1,
    cosine_similarity,
    flow_attack_loss,
    multiscale_cossim,
)

__all__ = [
    "PerturbConfig",
    "compute_cossim",
    "compute_epe",
    "compute_l1",
    "cosine_similarity",
    "fgsm",
    "flow_attack_loss",
    "gaussian_noise",
    "ifgsm",
    "make_jitted_attack",
    "make_sharded_attack",
    "make_spatial_attack",
    "mifgsm",
    "multiscale_cossim",
    "perturb",
    "uniform_noise",
]

from .patch import (  # noqa: E402
    circle_transform,
    circle_transform_different,
    create_circular_mask,
    create_correlated_patch,
    create_random_patch,
    get_patch_and_mask,
    get_self_correlated_patches,
    init_patch_circle,
    init_patch_from_image,
    init_patch_square,
    square_transform,
)
from .patch_attack import (  # noqa: E402
    PatchAttackConfig,
    make_patch_attack_step,
    train_patch_epoch,
    validate_patch,
)
from .universal import (  # noqa: E402
    UniversalConfig,
    make_universal_attack_step,
    train_universal_perturbation,
)

__all__ += [
    "PatchAttackConfig",
    "UniversalConfig",
    "circle_transform",
    "circle_transform_different",
    "create_circular_mask",
    "create_correlated_patch",
    "create_random_patch",
    "get_patch_and_mask",
    "get_self_correlated_patches",
    "init_patch_circle",
    "init_patch_from_image",
    "init_patch_square",
    "make_patch_attack_step",
    "make_universal_attack_step",
    "square_transform",
    "train_patch_epoch",
    "train_universal_perturbation",
    "validate_patch",
]

from . import corruptions, eval_utils, log_utils  # noqa: E402
from .perturb_runner import RunConfig, build_arbitrary_gt, run as run_perturbation_eval  # noqa: E402

__all__ += [
    "RunConfig",
    "build_arbitrary_gt",
    "corruptions",
    "eval_utils",
    "log_utils",
    "run_perturbation_eval",
]
