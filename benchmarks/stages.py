"""Staged benchmark suite — the 5 BASELINE.json configurations.

Prints one JSON line per stage.  Same timing methodology as bench.py
(chained in-jit renders, scalar-readback sync, slope).

    python benchmarks/stages.py [--stages 1,2,3] [--chain 4]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(render_inner, scene, assets, basis, cfg, chain):
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

    per = (best_of(chain) - best_of(1)) / (chain - 1)
    # fast renders (stage 1 is sub-ms) need a longer chain than the
    # default 4 for the slope to rise above timer jitter — a noisy
    # chain-4 slope can read several ms high OR negative (the r5
    # validate run measured 5.7 ms for a 0.7 ms render), so any
    # sub-8ms estimate is re-measured at chain 64
    if per < 8e-3 and chain < 64:
        for n in (1, 64):
            float(render_n(basis, n))
        per = (best_of(64) - best_of(1)) / 63
    return per


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="1,2,3")
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args(argv)
    stages = {int(s) for s in args.stages.split(",")}

    import jax

    from tpuray.camera import Camera, perspective_basis
    from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                               RenderConfig)
    from tpuray.meshes import mesh_benchmark_scene
    from tpuray.render import render_from_basis_pallas, render_from_basis_xla
    from tpuray.sceneio import load_scene
    from tpuray.textures import load_default_assets

    on_tpu = jax.default_backend() != "cpu"
    pallas = (render_from_basis_pallas.__wrapped__ if on_tpu
              else render_from_basis_xla.__wrapped__)
    xla = render_from_basis_xla.__wrapped__

    scene = load_scene("/root/reference/scenes/render.map").to_scene()
    assets = load_default_assets()
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)

    # (stage, name, engine, scene, cfg)
    defs = {
        1: ("256x256_depth1_diffuse", pallas, scene,
            RenderConfig(width=256, height=256, max_depth=1,
                         shadow_samples=0, chunk_size=0)),
        2: ("800x600_depth15_reference", pallas, scene,
            RenderConfig(width=800, height=600, max_depth=15, chunk_size=0)),
        3: ("1920x1080_depth4", pallas, scene,
            RenderConfig(width=1920, height=1080, max_depth=4,
                         chunk_size=0)),
        4: ("3840x2160_depth6", pallas, scene,
            RenderConfig(width=3840, height=2160, max_depth=6,
                         chunk_size=0)),
        5: ("512x384_depth3_mesh7k", pallas,
            mesh_benchmark_scene(4).to_scene(),
            RenderConfig(width=512, height=384, max_depth=3, chunk_size=0)),
        # the full BASELINE config 5 (10k-triangle mesh, 4K, depth 6);
        # the multi-host sharding half of that config needs real v5e-16
        # hardware — this measures the single-chip render
        6: ("3840x2160_depth6_mesh10k", pallas,
            mesh_benchmark_scene(4, torus_res=(64, 40)).to_scene(),
            RenderConfig(width=3840, height=2160, max_depth=6,
                         chunk_size=0)),
    }

    for s in sorted(stages):
        name, engine, sc, cfg = defs[s]
        basis = perspective_basis(cam, cfg.width, cfg.height)
        per = measure(engine, sc, assets, basis, cfg, args.chain)
        print(json.dumps({
            "stage": s, "config": name,
            "ms_per_render": round(per * 1e3, 1),
            "mrays_per_s": round(cfg.num_pixels / per / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
