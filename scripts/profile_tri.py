"""Decompose stage-5 mesh render time: closest-hit vs shadow feelers vs
cull effectiveness.  Run on TPU:

    python scripts/profile_tri.py [--variants base,noshadow,d1,nocull]

Same slope timing methodology as bench.py / benchmarks/stages.py.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(render_inner, scene, assets, basis, cfg, chain=4):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def render_n(basis, n):
        def body(i, acc):
            b = basis._replace(
                origin=basis.origin + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(render_inner(scene, assets, b, cfg))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (1, chain):
        float(render_n(basis, n))

    def best_of(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(render_n(basis, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(chain) - best_of(1)) / (chain - 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,noshadow,d1,nocull")
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args(argv)
    variants = args.variants.split(",")

    from tpuray.camera import Camera, perspective_basis
    from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                               RenderConfig)
    from tpuray.kernels import pallas_trace
    from tpuray.meshes import mesh_benchmark_scene
    from tpuray.render import render_from_basis_pallas
    from tpuray.textures import load_default_assets

    engine = render_from_basis_pallas.__wrapped__
    scene = mesh_benchmark_scene(args.order).to_scene()
    assets = load_default_assets()
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
    base_cfg = RenderConfig(width=args.width, height=args.height,
                            max_depth=args.depth, chunk_size=0)
    basis = perspective_basis(cam, base_cfg.width, base_cfg.height)

    def run(tag, cfg, cull=True):
        old = pallas_trace._TRI_CULL
        pallas_trace._TRI_CULL = cull
        try:
            per = measure(engine, scene, assets, basis, cfg)
        finally:
            pallas_trace._TRI_CULL = old
        print(json.dumps({
            "variant": tag, "ms": round(per * 1e3, 1),
            "mrays_per_s": round(cfg.num_pixels / per / 1e6, 2)}),
            flush=True)

    if "base" in variants:
        run("base", base_cfg)
    if "noshadow" in variants:
        run("noshadow", base_cfg.replace(shadow_samples=0))
    if "d1" in variants:
        run("d1", base_cfg.replace(max_depth=1))
    if "d1noshadow" in variants:
        run("d1noshadow", base_cfg.replace(max_depth=1, shadow_samples=0))
    if "s1" in variants:
        run("s1", base_cfg.replace(shadow_samples=1))
    if "notri" in variants:
        # cost floor: the same scene with the mesh removed (spheres /
        # planes / lights / DFS / resolve machinery only)
        from tpuray.meshes import mesh_benchmark_scene
        spec0 = mesh_benchmark_scene(args.order)
        spec0.triangles = []
        old, scene = scene, spec0.to_scene()
        run("notri", base_cfg)
        scene = old
    if "nocull" in variants:
        run("nocull", base_cfg, cull=False)


if __name__ == "__main__":
    main()
