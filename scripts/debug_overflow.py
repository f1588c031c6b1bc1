"""Localize the replay/kernel divergence under event overflow (VERDICT r4
item 1): run the record forward + replay on the ACTIVE backend, dump all
intermediates to npz, and print per-pixel divergence diagnostics.

Run once on the axon backend (default env) and once on CPU
(JAX_PLATFORMS=cpu) and diff the dumps to separate backend miscompiles
from genuine drop-accounting divergence.

Usage: python scripts/debug_overflow.py [out.npz]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels.pallas_trace import render_pallas_record
from tpuray.kernels.replay import replay_render
from tpuray.sceneio import load_scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/overflow_dump.npz"
    scene = load_scene("/root/reference/scenes/render.map").to_scene()
    from tpuray.textures import load_default_assets
    assets = load_default_assets()
    cfg = RenderConfig(width=48, height=32, max_depth=4, engine="pallas",
                       chunk_size=0, loop="scan").replace(event_slots=1)
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                 GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
    basis = perspective_basis(cam, cfg.width, cfg.height)
    print("backend:", jax.default_backend(), flush=True)

    img, records = render_pallas_record(scene, assets, basis, cfg,
                                        interpret=True)
    rep = replay_render(scene, assets, basis, records, cfg)
    img = np.asarray(img)
    rep = np.asarray(rep)
    d = np.abs(img - rep)
    print(f"mean|d|={d.mean():.6f} max|d|={d.max():.6f}")
    bad = d.max(-1) > 0.05
    ys, xs = np.nonzero(bad)
    print(f"bad pixels: {bad.sum()} / {bad.size}")
    rec = np.asarray(records["rec"])     # [Krec, n_pix]
    ssr = np.asarray(records["ssr"])
    evi = np.asarray(records["ev_idx"])  # [K, n_pix]
    n_pix = cfg.width * cfg.height
    for y, x in list(zip(ys, xs))[:8]:
        p = y * cfg.width + x
        codes = rec[:, p] & 0xFF
        par = (rec[:, p] >> 8) & 0xFF
        print(f"pix ({y},{x}) d={d[y, x]}: img={img[y, x]} rep={rep[y, x]}")
        print(f"  codes={codes.tolist()}")
        print(f"  par  ={par.tolist()}")
        print(f"  evi  ={evi[:, p].tolist()}")
    np.savez(out, img=img, rep=rep, rec=rec, ssr=ssr, evi=evi,
             max_nodes=np.asarray(records["max_nodes"]))
    print("dumped ->", out)


if __name__ == "__main__":
    main()
