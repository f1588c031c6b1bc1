#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip at 1080p, depth 4, on scenes/render.map.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (SURVEY.md §6); its only timing hook is
raypng.c:85-96 (wall-clock ms for raygen+raytracer at 800x600 depth-15).
``vs_baseline`` is therefore measured against this project's BASELINE.json
north-star configuration (1080p depth-4 primary rays per second per chip),
with baseline 1.0 == 100 Mrays/s/chip (a strong GPU raytracer's throughput
on the same brute-force workload).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0


def main():
    from tpuray.camera import Camera
    from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                               RenderConfig)
    from tpuray.render import render
    from tpuray.sceneio import load_scene
    from tpuray.textures import load_default_assets

    scene = load_scene("/root/reference/scenes/render.map").to_scene()
    assets = load_default_assets()
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
    cfg = RenderConfig(width=1920, height=1080, max_depth=4, chunk_size=0)

    img = render(scene, assets, cam, cfg)
    img.block_until_ready()  # compile + warm-up

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        img = render(scene, assets, cam, cfg)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mrays = cfg.num_pixels / dt / 1e6
    print(json.dumps({
        "metric": "primary_mrays_per_s_1080p_depth4",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
