"""Inverse rendering: recover scene parameters by gradient descent.

No reference analog (the reference is forward-only); this is the north-star
differentiable-rendering demo.  A target image is rendered from a ground-
truth scene; the optimization starts from perturbed parameters and recovers
them by adam on the L2 image loss, with gradients flowing through the full
Whitted trace (the reverse-differentiable ``loop='scan'`` path).

    python -m tpuray.apps.invrender [--steps 200] [--width 64 --height 48]
        [--checkpoint out/invrender.npz] [--resume]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import diff
from ..camera import Camera, generate_rays, perspective_basis
from ..config import RenderConfig
from ..kernels.trace import trace_rays
from ..scene import (PLASTIC, LightSpec, PlaneSpec, SceneSpec, SphereSpec)
from ..textures import solid_assets
from ..utils.checkpoint import load_pytree, save_pytree


def demo_scene() -> SceneSpec:
    return SceneSpec(
        spheres=[SphereSpec((0.0, 1.0, 3.0), 1.0,
                            PLASTIC.replace(rgb=(0.9, 0.2, 0.1)))],
        planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                          PLASTIC.replace(rgb=(0.4, 0.4, 0.4)))],
        lights=[LightSpec((2.0, 4.0, 0.0), 0.1, 30.0, (1.0, 1.0, 1.0))],
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--checkpoint", default="out/invrender.npz")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--every", type=int, default=25)
    args = ap.parse_args(argv)

    cfg = RenderConfig(width=args.width, height=args.height, max_depth=2,
                       chunk_size=0, loop="scan", scan_iters=10,
                       shadow_samples=0)
    assets = solid_assets()
    cam = Camera((0.8, 2.5, -8.0), (0.2, 0.0, 1.0), 90.0, 1.0)
    basis = perspective_basis(cam, cfg.width, cfg.height)
    o, d = generate_rays(basis, cfg.width, cfg.height)
    ids = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)

    truth = demo_scene().to_scene()
    target = trace_rays(truth, assets, o, d, ids, cfg)

    # start from wrong material color + light intensity + sphere position
    start = demo_scene()
    start.spheres[0].material = start.spheres[0].material.replace(
        rgb=(0.3, 0.6, 0.8))
    start.spheres[0].origin = (0.25, 1.15, 3.2)
    start.lights[0].intensity = 12.0
    scene = start.to_scene()

    params, static = diff.partition(scene)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step0 = 0
    if args.resume:
        import os
        if os.path.exists(args.checkpoint):
            (params, opt_state), step0 = load_pytree(args.checkpoint,
                                                     (params, opt_state))
            print(f"resumed from {args.checkpoint} @ step {step0}")

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            rgb = trace_rays(diff.combine(p, static), assets, o, d, ids, cfg)
            return diff.l2_image_loss(rgb, target)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(step0, args.steps):
        params, opt_state, loss = train_step(params, opt_state)
        if step % args.every == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {float(loss):.6f}  "
                  f"({time.time() - t0:.1f}s)")

    import os
    os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)
    save_pytree(args.checkpoint, (params, opt_state), args.steps)

    rec = diff.combine(params, static)
    print("\nrecovered vs truth:")
    print("  sphere rgb   ", np.asarray(rec.sphere_mat.rgb[0]),
          "vs", np.asarray(truth.sphere_mat.rgb[0]))
    print("  sphere origin", np.asarray(rec.sphere_origin[0]),
          "vs", np.asarray(truth.sphere_origin[0]))
    print("  light int.   ", float(rec.light_intensity[0]),
          "vs", float(truth.light_intensity[0]))


if __name__ == "__main__":
    main()
