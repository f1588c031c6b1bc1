"""Row-gather feasibility: (a) issue rate for 16/32-wide rows, (b) how many
of render.map's real texel events are covered by 1-2 row fetches per group
of 8 consecutive-x pixels (per row width).

If rate stays ~7 ns/ROW and coverage is high, the event resolve can fetch
rows instead of elements and cut gather issues ~4x.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# ---- (a) row-width issue rate -------------------------------------------
key = jax.random.PRNGKey(0)
big = jax.random.randint(key, (12_600_000,), 0, 2**31 - 1, jnp.int32)
N_ROWS = 420_000
CHAIN = 8


def row_rate(width):
    rows = big[: (big.shape[0] // width) * width].reshape(-1, width)
    idx = jax.random.randint(key, (N_ROWS,), 0, rows.shape[0], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def take_n(t, ix, n):
        def body(i, acc):
            return acc + jnp.sum(jnp.take(t, (ix + i) % t.shape[0], axis=0))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), t.dtype))

    for n in (1, CHAIN):
        float(jnp.sum(take_n(rows, idx, n)))

    def best_of(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(take_n(rows, idx, n)))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best_of(CHAIN) - best_of(1)) / (CHAIN - 1)
    print(f"row width {width:3d}: {per*1e3:7.2f} ms for {N_ROWS} rows "
          f"-> {per/N_ROWS*1e9:6.2f} ns/row")


for w in (8, 16, 32, 64):
    row_rate(w)

# ---- (b) coverage of real events ----------------------------------------
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

fwd = jax.jit(lambda s, a, b: pt._pallas_forward(s, a, b, cfg, False, 0.0))
out = fwd(scene, assets, basis)
ev_idx = np.asarray(out[1])          # [gy, gx, K*S, L]
gy, gx = ev_idx.shape[0], ev_idx.shape[1]
K = cfg.resolved_event_slots()
S, L = pt.SUBLANES, pt.LANES
ei = ev_idx.reshape(gy, gx, K, S, L)

G = 8   # pixels per group (consecutive x within a lane row)
for width in (8, 16, 32):
    g = ei.reshape(gy, gx, K, S, L // G, G)
    used = g >= 0
    r = g // width
    r0 = r[..., 0:1]
    r7 = r[..., G - 1:G]
    cov = (r == r0) | (r == r7) | ~used
    grp_used = used.any(axis=-1)
    grp_cov = cov.all(axis=-1) & grp_used
    n_grp = grp_used.sum()
    n_cov = grp_cov.sum()
    n_ev = used.sum()
    n_ev_cov = (used & cov).sum()
    # tiles (gy, gx) with at least one uncovered (slot, sublane, group)
    unc = grp_used & ~grp_cov
    tile_unc = unc.any(axis=(2, 3, 4))
    print(f"width {width:3d}: groups used {n_grp}  covered {n_cov} "
          f"({n_cov/n_grp:.3f})  events covered {n_ev_cov/n_ev:.3f}  "
          f"tiles w/ residual {tile_unc.sum()}/{gy*gx} "
          f"({tile_unc.mean():.3f})")

# per-slot coverage at width 16
width = 16
g = ei.reshape(gy, gx, K, S, L // G, G)
used = g >= 0
r = g // width
cov = (r == r[..., 0:1]) | (r == r[..., G - 1:G]) | ~used
for s in range(6):
    u = used[:, :, s]
    if not u.any():
        break
    c = (u & cov[:, :, s]).sum() / u.sum()
    print(f"  slot {s}: events {u.sum():8d}  covered {c:.3f}")
