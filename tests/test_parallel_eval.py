"""Multi-chip eval + attack sharding on the virtual 8-device CPU mesh.

The reference evaluates under DataParallel (training/evaluate.py:410) and
its attack sweeps are the flagship workload; these tests validate the mesh
equivalents end-to-end (conftest forces an 8-device CPU backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from understanding_flow_robustness_tpu.attacks.global_attacks import (
    PerturbConfig,
    make_jitted_attack,
    make_sharded_attack,
)
from understanding_flow_robustness_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_predict,
)

RNG = np.random.RandomState(3)


def _toy_predict_fn(variables, a, b):
    w = variables["w"]
    x = jnp.concatenate([a, b], axis=-1)
    return jnp.einsum("bhwc,cd->bhwd", x, w)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_shard_predict_matches_single(mesh):
    variables = {"w": jnp.asarray(RNG.randn(6, 2).astype(np.float32))}
    a = jnp.asarray(RNG.rand(8, 16, 32, 3).astype(np.float32))
    b = jnp.asarray(RNG.rand(8, 16, 32, 3).astype(np.float32))
    pjit = shard_predict(_toy_predict_fn, mesh)
    with mesh:
        out = pjit(variables, shard_batch(mesh, a), shard_batch(mesh, b))
    ref = _toy_predict_fn(variables, a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_attack_matches_unsharded(mesh):
    variables = {"w": jnp.asarray(RNG.randn(6, 2).astype(np.float32))}
    cfg = PerturbConfig(perturb_method="ifgsm", n_step=3, output_norm=0.02)
    a = jnp.asarray(RNG.rand(8, 16, 32, 3).astype(np.float32))
    b = jnp.asarray(RNG.rand(8, 16, 32, 3).astype(np.float32))
    gt = jnp.asarray(
        np.concatenate(
            [RNG.randn(8, 16, 32, 2), np.ones((8, 16, 32, 1))], axis=-1
        ).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)

    sharded = make_sharded_attack(_toy_predict_fn, cfg, mesh)
    with mesh:
        n0, n1, adv0, adv1 = sharded(variables, a, b, gt, key)

    plain = make_jitted_attack(
        lambda x, y: _toy_predict_fn(variables, x, y), cfg
    )
    rn0, rn1, radv0, radv1 = plain(a, b, gt, key)

    np.testing.assert_allclose(np.asarray(adv0), np.asarray(radv0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv1), np.asarray(radv1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n0), np.asarray(rn0), atol=1e-5)
    assert float(jnp.max(jnp.abs(n0))) <= float(cfg.output_norm) + 1e-6


def test_perturb_runner_mesh_mode(tmp_path, mesh):
    """runner end-to-end in mesh mode on batched synthetic samples."""
    from understanding_flow_robustness_tpu.attacks.perturb_runner import (
        RunConfig,
        run,
    )

    variables = {"w": jnp.asarray(RNG.randn(6, 2).astype(np.float32))}
    H, W = 16, 32
    cfg = RunConfig(
        perturb=PerturbConfig(perturb_method="ifgsm", n_step=2),
        output_path=str(tmp_path / "mesh_run"),
    )

    def samples():
        for _ in range(2):
            img0 = RNG.rand(8, H, W, 3).astype(np.float32)
            img1 = RNG.rand(8, H, W, 3).astype(np.float32)
            gt = np.concatenate(
                [RNG.randn(8, H, W, 2), np.ones((8, H, W, 1))], axis=-1
            ).astype(np.float32)
            yield img0, img1, gt, gt

    with mesh:
        results = run(
            lambda a, b: _toy_predict_fn(variables, a, b),
            samples(), cfg,
            mesh=mesh, predict_fn=_toy_predict_fn, variables=variables,
        )
    # 2 batches x 8 samples each, every one logged individually
    assert np.isfinite(results["flow_epe"][0])
    assert np.isfinite(results["flow_epe_origin"][0])
    logf = tmp_path / "mesh_run" / "log0.txt"
    assert sum(
        1 for line in open(logf) if "epe" in line
    ) == 16


def test_perturb_runner_mesh_rejects_show_evolve(tmp_path, mesh):
    """show_evolve_path has no sharded trajectory variant; the runner must
    fail loudly instead of silently dropping the requested GIFs."""
    from understanding_flow_robustness_tpu.attacks.perturb_runner import (
        RunConfig,
        run,
    )

    variables = {"w": jnp.asarray(RNG.randn(6, 2).astype(np.float32))}
    cfg = RunConfig(
        perturb=PerturbConfig(perturb_method="ifgsm", n_step=2),
        output_path=str(tmp_path / "evo_run"),
        show_evolve_path=str(tmp_path / "evo_gifs"),
    )
    with pytest.raises(ValueError, match="show_evolve_path"):
        run(lambda a, b: _toy_predict_fn(variables, a, b), iter(()), cfg,
            mesh=mesh, predict_fn=_toy_predict_fn, variables=variables)


def test_validate_kitti_sharded_matches_sequential(mesh):
    """Mesh-batched KITTI validation == sequential on same-size samples."""
    from understanding_flow_robustness_tpu.training.evaluate import (
        validate_kitti,
    )

    class ToyModel:
        size_multiple = 8
        variables = {"w": jnp.asarray(RNG.randn(6, 2).astype(np.float32))}

        @property
        def predict_fn(self):
            return _toy_predict_fn

        def predict(self, a, b):
            return _toy_predict_fn(self.variables, a, b)

    class DS:
        def __init__(self, n):
            self.items = [
                (
                    RNG.rand(16, 32, 3).astype(np.float32) * 255,
                    RNG.rand(16, 32, 3).astype(np.float32) * 255,
                    RNG.randn(16, 32, 2).astype(np.float32),
                    np.ones((16, 32), np.float32),
                )
                for _ in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    model = ToyModel()
    ds = DS(10)  # ragged tail: 10 = 8 + 2
    seq = validate_kitti(model, ds)
    with mesh:
        par = validate_kitti(model, ds, mesh=mesh)
    assert abs(seq["kitti-epe"] - par["kitti-epe"]) < 1e-4
    assert abs(seq["kitti-f1"] - par["kitti-f1"]) < 1e-6
