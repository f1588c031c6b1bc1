"""Chained-timing profile of the replay VJP at 512x384 d3 (BASELINE row).

    python scripts/profile_replay.py [depth] [--json] [width height]

Loop-carried dependency: each iteration perturbs sphere_radius by the
accumulated scalar so XLA cannot hoist the body (naive `x + 0*i` gets
constant-folded and the whole loop collapses to one iteration).
"""
import json, sys, time, functools
sys.path.insert(0, "/root/repo")
JSON_OUT = "--json" in sys.argv
if JSON_OUT:
    sys.argv.remove("--json")
import jax, jax.numpy as jnp, numpy as np
from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray import diff
from tpuray.kernels.pallas_trace import render_pallas_record
from tpuray.kernels.replay import replay_render
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets

W, H, D = 512, 384, 3
if len(sys.argv) > 1:          # e.g. `profile_replay.py 15` for depth 15
    D = int(sys.argv[1])
if len(sys.argv) > 3:
    W, H = int(sys.argv[2]), int(sys.argv[3])
scene = load_scene("/root/reference/scenes/render.map").to_scene()
assets = load_default_assets()
cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
cfg = RenderConfig(width=W, height=H, max_depth=D, shadow_samples=0)
basis = perspective_basis(cam, W, H)
print("record_slots:", cfg.resolved_record_slots(),
      "event_slots:", cfg.resolved_event_slots(), flush=True)

img0, records = jax.block_until_ready(
    jax.jit(lambda s: render_pallas_record(s, assets, basis, cfg))(scene))
target = jnp.zeros_like(img0)

d_scene, rest = diff.partition(scene)

CHAIN = 8
def timed(label, fn):
    # fn(scene_perturb_scalar, records) -> scalar.  records are threaded
    # through as a jit ARGUMENT: closed-over they bake into the HLO
    # (92 + 276 MB at 800x600 d15) and blow the compile relay's upload
    # limit (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, recs):
        def body(i, acc):
            return acc + fn(acc * 1e-20, recs)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    for n in (1, CHAIN):
        jax.block_until_ready(run_n(n, records))
    def best(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run_n(n, records))
            b = min(b, time.perf_counter() - t0)
        return b
    per = (best(CHAIN) - best(1)) / (CHAIN - 1)
    if per < 1e-3:
        # a grad step can't run in under a millisecond at these sizes:
        # the chain-slope collapsed (a slow best(1) outlier masks the
        # scaling — seen once in the r5 validate run as 0.0 ms rows).
        # Re-measure with a longer chain so the slope dominates noise
        for n in (1, 4 * CHAIN):
            jax.block_until_ready(run_n(n, records))
        per = (best(4 * CHAIN) - best(1)) / (4 * CHAIN - 1)
    if JSON_OUT:
        print(json.dumps({"what": label, "ms": round(per * 1e3, 2),
                          "config": f"{W}x{H}_d{D}"}), flush=True)
    else:
        print(f"{label:40s} {per*1e3:8.2f} ms", flush=True)

def scene_eps(eps):
    return scene._replace(sphere_radius=scene.sphere_radius + eps)

# 1. record-mode forward (kernel + resolve)
timed("record fwd (kernel+resolve)",
      lambda e, r: jnp.sum(
          render_pallas_record(scene_eps(e), assets, basis, cfg)[0]))

# 2. replay forward only
timed("replay fwd",
      lambda e, r: jnp.sum(
          replay_render(scene_eps(e), assets, basis, r, cfg)))

# 3. grad of replay (loss+grad through replay only)
def replay_loss(e, r):
    ds, _ = diff.partition(scene_eps(e))
    def f(d):
        return diff.l2_image_loss(
            replay_render(diff.combine(d, rest), assets, basis, r, cfg),
            target)
    l, g = jax.value_and_grad(f)(ds)
    return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
timed("replay loss+grad", replay_loss)

# 4. full custom-vjp step (record fwd + replay bwd)
def full_step(e, r):
    ds, _ = diff.partition(scene_eps(e))
    def f(d):
        img = diff.render_pallas_diff(diff.combine(d, rest), assets, basis,
                                      cfg)
        return diff.l2_image_loss(img, target)
    l, g = jax.value_and_grad(f)(ds)
    return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
timed("full custom-vjp loss+grad", full_step)
