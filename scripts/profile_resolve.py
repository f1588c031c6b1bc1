"""Measure the kernel/resolve split and per-tile event-index coherence.

Evidence-gathering for the headline-perf work (ROADMAP item 1): at 1080p
depth-4 on render.map, how much of the render is the Pallas DFS kernel vs
the deferred texel-event resolve, and how wide is the spread of atlas
indices WITHIN one 8x128 tile per event slot (narrow spread => a windowed
Pallas resolve with per-tile dynamic-offset DMA + one-hot select can
replace the 7 ns/element XLA gather).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels import pallas_trace as pt
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets

W, H, D = 1920, 1080, 4

scene = load_scene("/root/reference/scenes/render.map").to_scene()
assets = load_default_assets()
cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
cfg = RenderConfig(width=W, height=H, max_depth=D, chunk_size=0)
basis = perspective_basis(cam, W, H)


def timed(fn, *a, n=8):
    r = fn(*a)
    jax.block_until_ready(r)
    # chain-free timing is fine here: these are single ops, and we only
    # need relative splits; the memory-note caveat applies to full renders
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


fwd = jax.jit(lambda s, a, b: pt._pallas_forward(s, a, b, cfg, False, 0.0))
out = fwd(scene, assets, basis)
c_blk, ev_idx, ev_w, over = out[:4]
atlas = pt.build_atlas(assets)
gx = -(-W // pt.LANES)
gy = -(-H // pt.SUBLANES)
K = cfg.resolved_event_slots()

t_kernel = timed(fwd, scene, assets, basis)
print(f"kernel only: {t_kernel*1e3:.2f} ms")

res = jax.jit(lambda c, ei, ew, ov: pt._resolve_events(
    c, ei, ew, ov, atlas, gx, gy, K, W, H))
t_res = timed(res, c_blk, ev_idx, ev_w, over)
print(f"resolve only: {t_res*1e3:.2f} ms")

full = jax.jit(lambda s, a, b: pt.render_pallas(s, a, b, cfg))
t_full = timed(full, scene, assets, basis)
print(f"full render: {t_full*1e3:.2f} ms  "
      f"({W*H/t_full/1e6:.1f} Mrays/s primary)")

# ---- event statistics --------------------------------------------------
ei = np.asarray(ev_idx)            # [gy, gx, K*S, L]
T = gy * gx
S, L = pt.SUBLANES, pt.LANES
ei = ei.reshape(T, K, S * L)
used = ei >= 0
per_slot_frac = used.any(axis=2).mean(axis=0)
total_events = int(used.sum())
print(f"\ntiles={T}  events total={total_events} "
      f"({total_events/(W*H):.2f}/pixel)")
print("fraction of tiles using slot k:",
      np.array2string(per_slot_frac[:8], precision=3))

# index spread within (tile, slot)
for s in range(min(K, 4)):
    m = used[:, s]
    if not m.any():
        break
    idx = np.where(m, ei[:, s], 2**31 - 1)
    lo = idx.min(axis=1)
    idx = np.where(m, ei[:, s], -1)
    hi = idx.max(axis=1)
    act = m.any(axis=1)
    spread = (hi - lo)[act]
    n = act.sum()
    print(f"slot {s}: active tiles {n}  spread p50={np.percentile(spread,50):.0f} "
          f"p90={np.percentile(spread,90):.0f} p99={np.percentile(spread,99):.0f} "
          f"max={spread.max()}  <=2048: {(spread<=2048).mean():.3f}  "
          f"<=8192: {(spread<=8192).mean():.3f}")

# how many (tile, slot) pairs total are active and narrow
act_ts = used.any(axis=2)
nts = int(act_ts.sum())
print(f"active (tile,slot) pairs: {nts} (dense gather elements "
      f"= {nts * S * L})")
