"""Adversarial attacks: global perturbations, patches, universal noise."""

from .global_attacks import (
    PerturbConfig,
    fgsm,
    gaussian_noise,
    ifgsm,
    make_jitted_attack,
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
    "mifgsm",
    "multiscale_cossim",
    "perturb",
    "uniform_noise",
]
