"""Per-slot bisect of the axon replay divergence: replay prefixes of the
recorded slots and print pixel (20,36)'s partial sums.  Run on both
backends and diff to find the slot (and op) where axon diverges."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels.replay import replay_render
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets

z = np.load("/tmp/overflow_axon.npz")
scene = load_scene("/root/reference/scenes/render.map").to_scene()
assets = load_default_assets()
cfg = RenderConfig(width=48, height=32, max_depth=4, engine="pallas",
                   chunk_size=0, loop="scan").replace(event_slots=1)
cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
             GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
basis = perspective_basis(cam, cfg.width, cfg.height)
print("backend:", jax.default_backend(), flush=True)
y, x = 20, 36
for s in range(1, 11):
    records = {"rec": jnp.asarray(z["rec"][:s]),
               "ssr": jnp.asarray(z["ssr"][:s]),
               "ev_idx": jnp.asarray(z["evi"]),
               "max_nodes": jnp.asarray(z["max_nodes"])}
    rep = np.asarray(replay_render(scene, assets, basis, records, cfg))
    print(f"s={s:2d} pix={rep[y, x]}", flush=True)
