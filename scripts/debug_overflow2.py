"""Cross-backend replay: load the records + kernel image dumped by
debug_overflow.py on the AXON backend and re-run ONLY the replay here
(run under JAX_PLATFORMS=cpu).  Separates 'axon miscompiles the replay'
from 'axon interpret-kernel produced an image inconsistent with its own
records'."""
import sys

import jax.numpy as jnp
import numpy as np

from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels.replay import replay_render
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/overflow_axon.npz"
z = np.load(src)
scene = load_scene("/root/reference/scenes/render.map").to_scene()
assets = load_default_assets()
cfg = RenderConfig(width=48, height=32, max_depth=4, engine="pallas",
                   chunk_size=0, loop="scan").replace(event_slots=1)
cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
             GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
basis = perspective_basis(cam, cfg.width, cfg.height)
records = {"rec": jnp.asarray(z["rec"]), "ssr": jnp.asarray(z["ssr"]),
           "ev_idx": jnp.asarray(z["evi"]),
           "max_nodes": jnp.asarray(z["max_nodes"])}
rep_here = np.asarray(replay_render(scene, assets, basis, records, cfg))
img_axon = z["img"]
rep_axon = z["rep"]
d_k = np.abs(rep_here - img_axon)
d_r = np.abs(rep_here - rep_axon)
print(f"cpu-replay(axon records) vs axon-KERNEL image: "
      f"mean={d_k.mean():.6f} max={d_k.max():.6f}")
print(f"cpu-replay(axon records) vs axon-REPLAY image: "
      f"mean={d_r.mean():.6f} max={d_r.max():.6f}")
y, x = 20, 36
print("pix (20,36): axon_img", img_axon[y, x], "axon_rep", rep_axon[y, x],
      "cpu_rep", rep_here[y, x])
