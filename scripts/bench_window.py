"""Window-gather design study for the event resolve.

(a) issue rate of wide 1-D row gathers (64..1024 texels/row) and 2-D
    window gathers (lax.gather slice_sizes) — looking for the DMA-fast
    path seen at width 64 (~2 ns/row vs ~7 ns/element);
(b) per-group (8 consecutive-x pixels, per slot) spread of render.map's
    real texel events, as 1-D flat-index spread and 2-D (dy, dx) texel
    spread — what window shape covers most groups.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
big = jax.random.randint(key, (12_600_000,), 0, 2**31 - 1, jnp.int32)
N_ROWS = 420_000
CHAIN = 8


def timed(fn, *args):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, *a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    for n in (1, CHAIN):
        float(run_n(n, *args))

    def best_of(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(n, *args))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best_of(CHAIN) - best_of(1)) / (CHAIN - 1)


def row_rate(width):
    rows = big[: (big.shape[0] // width) * width].reshape(-1, width)
    idx = jax.random.randint(key, (N_ROWS,), 0, rows.shape[0], jnp.int32)

    def fn(i, t, ix):
        return jnp.sum(jnp.take(t, (ix + i) % t.shape[0], axis=0))

    per = timed(fn, rows, idx)
    print(f"1D row width {width:4d}: {per/N_ROWS*1e9:7.2f} ns/row "
          f"({per*1e3:6.2f} ms)")


for w in (64, 128, 256, 512, 1024):
    row_rate(w)

# 2-D windows via lax.gather on a [Ny, Nx] table
table2d = big[:12_582_912].reshape(-1, 4096)   # 3072 x 4096


def win2d_rate(dy, dx):
    ny, nx = table2d.shape
    iy = jax.random.randint(key, (N_ROWS,), 0, ny - dy, jnp.int32)
    ix = jax.random.randint(key, (N_ROWS,), 0, nx - dx, jnp.int32)
    starts = jnp.stack([iy, ix], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def fn(i, t, st):
        st = (st + i) % jnp.asarray([ny - dy, nx - dx], jnp.int32)
        g = jax.lax.gather(t, st, dnums, slice_sizes=(dy, dx),
                           mode="clip")
        return jnp.sum(g)

    per = timed(fn, table2d, starts)
    print(f"2D window ({dy:2d},{dx:3d}): {per/N_ROWS*1e9:7.2f} ns/window "
          f"({per*1e3:6.2f} ms)")


for dy, dx in ((1, 64), (2, 64), (4, 64), (2, 128), (4, 32), (8, 64)):
    win2d_rate(dy, dx)

# ---- (b) real event group spreads ----------------------------------------
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
atlas = pt.build_atlas(assets)
print(f"\natlas: tex {atlas.n_textures}x{atlas.tex_h}x{atlas.tex_w} "
      f"sky_base={atlas.sky_base} sky {atlas.sky_h}x{atlas.sky_w}")

fwd = jax.jit(lambda s, a, b: pt._pallas_forward(s, a, b, cfg, False, 0.0))
out = fwd(scene, assets, basis)
ev = np.asarray(out[1])
gy, gx = ev.shape[0], ev.shape[1]
K = cfg.resolved_event_slots()
S, L = pt.SUBLANES, pt.LANES
G = 8
g = ev.reshape(gy, gx, K, S, L // G, G).reshape(-1, G)
used = g >= 0
act = used.any(axis=1)
g = g[act]
used = used[act]
print(f"groups {g.shape[0]}  events {used.sum()}")

# 1-D spread
lo = np.where(used, g, 2**31 - 1).min(axis=1)
hi = np.where(used, g, -1).max(axis=1)
spread = hi - lo
for w in (64, 128, 256, 512, 1024):
    print(f"1D window {w:5d}: groups covered {(spread < w).mean():.3f}")

# 2-D spread: decompose flat -> (y, x) in texel space.  Textures: width
# tex_w; sky: width sky_w.  A window must stay within ONE texture/sky
# region, so also require same region per group.
sky = g >= atlas.sky_base
twidth = np.where(sky, atlas.sky_w, atlas.tex_w)
base = np.where(sky, atlas.sky_base, 0)
rel = g - base
ty = rel // twidth
tx = rel % twidth
# same-region check: same width and same texture id (for textures)
tid = np.where(sky, -1, g // (atlas.tex_h * atlas.tex_w))
ref = tid[:, 0:1]
same = ((tid == ref) | ~used).all(axis=1)
ylo = np.where(used, ty, 2**31 - 1).min(axis=1)
yhi = np.where(used, ty, -1).max(axis=1)
xlo = np.where(used, tx, 2**31 - 1).min(axis=1)
xhi = np.where(used, tx, -1).max(axis=1)
dyv = yhi - ylo
dxv = xhi - xlo
for wy, wx in ((1, 64), (2, 64), (4, 64), (2, 128), (4, 128), (8, 64)):
    c = (same & (dyv < wy) & (dxv < wx)).mean()
    print(f"2D window ({wy},{wx:3d}): groups covered {c:.3f}")

# split by slot 0 vs rest
g_all = ev.reshape(gy, gx, K, S, L // G, G)
for s in (0, 1, 2):
    gs = g_all[:, :, s].reshape(-1, G)
    u = gs >= 0
    a = u.any(axis=1)
    gs, u = gs[a], u[a]
    skys = gs >= atlas.sky_base
    tw = np.where(skys, atlas.sky_w, atlas.tex_w)
    bs = np.where(skys, atlas.sky_base, 0)
    rl = gs - bs
    tys, txs = rl // tw, rl % tw
    tids = np.where(skys, -1, gs // (atlas.tex_h * atlas.tex_w))
    sm = ((tids == tids[:, 0:1]) | ~u).all(axis=1)
    dy2 = np.where(u, tys, 2**31 - 1).min(axis=1)
    dy2 = np.where(u, tys, -1).max(axis=1) - dy2
    dx2 = np.where(u, txs, 2**31 - 1).min(axis=1)
    dx2 = np.where(u, txs, -1).max(axis=1) - dx2
    c = (sm & (dy2 < 4) & (dx2 < 64)).mean()
    print(f"slot {s}: groups {gs.shape[0]:7d}  (4,64)-covered {c:.3f}")
