"""TPU-native rebuild of the optical-flow robustness suite.

A from-scratch JAX / XLA / Pallas framework with the capabilities of
``lmb-freiburg/understanding_flow_robustness`` (the official code of
"Towards Understanding Adversarial Robustness of Optical Flow Networks",
CVPR 2022): seven optical-flow model families, cost-volume / warping /
channel-norm operators as fused TPU kernels, KITTI / Sintel / FlyingChairs /
FlyingThings3D data pipelines, patch- and global-attack suites, and a
RAFT-style training loop -- all designed TPU-first:

* NHWC layouts and ``jax.lax`` convolutions tiled for the MXU,
* static shapes + valid masks instead of dynamic per-image shapes,
* attack inner loops as jitted ``lax`` loops with ``jax.grad`` w.r.t. images,
* data parallelism via ``jax.sharding.Mesh`` + collectives (not DataParallel).

Layout mirrors the reference's layer map (see SURVEY.md):
``ops/`` core + Pallas kernels, ``models/`` the seven architectures,
``data/`` datasets + augmentors, ``attacks/`` patch & global attacks,
``training/`` losses/optim/train loop, ``flowviz/`` flow I/O + visualization,
``parallel/`` mesh & sharding helpers.
"""

__version__ = "0.1.0"
