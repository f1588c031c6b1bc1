"""HBM-streamed triangle path benchmark (scenes above the 32k VMEM cap).

The r4 baseline for the 163,840-triangle scene at 512x384 depth-3 was
476 ms with cull-blind streaming (every tile DMA'd every block in
order); VERDICT r5 item 3's bar is <= 240 ms.  Same slope methodology as
benchmarks/stages.py.

    python benchmarks/stream.py [--order 6] [--width 512 --height 384]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stages import measure  # noqa: E402  (sibling module)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=6,
                    help="icosphere order (6 -> 81,920 tris)")
    ap.add_argument("--torus", default="256,160",
                    help="nu,nv torus resolution (256,160 -> 81,920)")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args(argv)

    from tpuray.camera import Camera, perspective_basis
    from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                               RenderConfig)
    from tpuray.meshes import mesh_benchmark_scene
    from tpuray.render import render_from_basis_pallas
    from tpuray.textures import load_default_assets

    nu, nv = (int(x) for x in args.torus.split(","))
    scene = mesh_benchmark_scene(args.order, torus_res=(nu, nv)).to_scene()
    assets = load_default_assets()
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.depth, chunk_size=0)
    basis = perspective_basis(cam, cfg.width, cfg.height)
    per = measure(render_from_basis_pallas.__wrapped__, scene, assets,
                  basis, cfg, args.chain)
    print(json.dumps({
        "config": f"{args.width}x{args.height}_d{args.depth}_"
                  f"tri{scene.num_triangles}_streamed",
        "ms_per_render": round(per * 1e3, 1),
        "mrays_per_s": round(cfg.num_pixels / per / 1e6, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
