"""Same-process A/B: space-to-depth encoder layer1 stage (round 5).

The round-5 train trace priced fnet+cnet layer1 (64-channel, half-res)
at 26 ms/step at ~38 TF/s effective; the s2d form runs the same math at
256 lanes / quarter spatial.  Measures the bench train step and both
inference operating points with encoder_s2d off/on.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/enc_s2d_ab.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from understanding_flow_robustness_tpu.models import fetch_model
from understanding_flow_robustness_tpu.models.raft_model import (
    scale_flow_head,
)
from understanding_flow_robustness_tpu.training import (
    fetch_optimizer,
    make_train_step,
)
from understanding_flow_robustness_tpu.utils import enable_compilation_cache
from understanding_flow_robustness_tpu.utils.benchmark import timed_loop

enable_compilation_cache()
rng = np.random.RandomState(0)
tb, th, tw = 4, 288, 960
tx, _ = fetch_optimizer(lr=1e-4, num_steps=1000)
targs = (
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.rand(tb, th, tw, 3).astype(np.float32)),
    jnp.asarray(rng.randn(tb, th, tw, 2).astype(np.float32)),
    jnp.ones((tb, th, tw), jnp.float32),
)

for s2d in (False, True):
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       batch_pad_encoders=True, encoder_s2d=s2d)
    tparams = raft.variables["params"]
    tstats = raft.variables.get("batch_stats", {})
    topt = tx.init(tparams)
    tstep = jax.jit(make_train_step(raft.module, tx, loss_type="sequence",
                                    is_raft=True))

    def train_once(i1, i2, fl, va, p, o, s):
        batch = {"image1": i1, "image2": i2, "flow": fl, "valid": va}
        np_, no_, _, m = tstep(p, o, s, batch)
        return np_, m["loss"]

    dt = timed_loop(train_once, targs + (tparams, topt, tstats), n=6)
    print(f"train s2d={int(s2d)}: {dt*1e3:7.2f} ms/step "
          f"({tb/dt:6.2f} frames/s)", flush=True)

B, H, W = 8, 384, 1280
img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
for s2d in (False, True):
    raft = fetch_model("RAFT", pretrained_path=None, init_size=(128, 128),
                       encoder_s2d=s2d)
    vcal = scale_flow_head(raft.variables, 0.05)
    dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                    (img1, img2, vcal), n=12)
    print(f"cal  s2d={int(s2d)}: {dt*1e3:7.2f} ms/batch "
          f"({B/dt:6.2f} pairs/s)", flush=True)
    dt = timed_loop(lambda a, b, v: raft.predict_fn(v, a, b),
                    (img1, img2, raft.variables), n=12)
    print(f"wild s2d={int(s2d)}: {dt*1e3:7.2f} ms/batch "
          f"({B/dt:6.2f} pairs/s)", flush=True)
