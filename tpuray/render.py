"""Public forward-rendering API.

The analog of the reference's whole host pipeline (raypng.c:11-100):
camera perspective -> raygen -> raytracer -> image, except the "runtime
wrapper" layer (opencl_wrap.c) is subsumed by ``jax.jit`` — the first call
traces + compiles (the analog of clBuildProgram, opencl_wrap.c:85-105) and
subsequent calls with new camera/scene *values* reuse the executable, which
is what makes interactive param-swap re-render cheap (rayinteractive.c
re-binds 6 camera scalars per keypress; here we re-call the jitted function
with a new ``PerspectiveBasis`` pytree).

Renders run chunked: rays are traced in ``cfg.chunk_size`` pixel blocks via
``lax.map`` so HBM stays bounded and each chunk's DFS while-loop terminates
on its own worst case.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, PerspectiveBasis, generate_rays, perspective_basis
from .config import RenderConfig
from .kernels.trace import quantize_image, trace_rays
from .scene import Scene
from .textures import SceneAssets


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _use_pallas(scene: Scene, cfg: RenderConfig) -> bool:
    from .kernels.pallas_trace import (TRI_STREAM_MAX_TRIANGLES,
                                       pallas_supported)
    if cfg.engine == "pallas":
        return True
    if cfg.engine == "xla":
        return False
    supported = pallas_supported(scene, cfg)
    if not supported:
        # never downgrade silently: the XLA tracer is ~100x slower
        import warnings
        warnings.warn(
            f"engine='auto' fell back to the XLA tracer: the scene's "
            f"{scene.num_triangles} triangles exceed the megakernel's "
            f"HBM-streamed table cap ({TRI_STREAM_MAX_TRIANGLES}); "
            f"expect a ~100x slower render",
            RuntimeWarning, stacklevel=3)
    return supported and jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_from_basis_xla(scene: Scene, assets: SceneAssets,
                          basis: PerspectiveBasis, cfg: RenderConfig):
    """Jitted end-to-end render: basis -> primary rays -> traced rgb.

    Returns float32 linear rgb [H, W, 3] (pre-quantization)."""
    width, height = cfg.width, cfg.height
    n_pix = width * height
    origins, dirs = generate_rays(basis, width, height)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.uint32)

    chunk = cfg.chunk_size or n_pix
    chunk = min(chunk, n_pix)
    n_chunks = -(-n_pix // chunk)
    padded = n_chunks * chunk

    origins = _pad_to(origins, padded).reshape(n_chunks, chunk, 3)
    dirs = _pad_to(dirs, padded).reshape(n_chunks, chunk, 3)
    pixel_ids = _pad_to(pixel_ids, padded).reshape(n_chunks, chunk)

    def run(args):
        o, d, ids = args
        return trace_rays(scene, assets, o, d, ids, cfg)

    if n_chunks == 1:
        rgb = run((origins[0], dirs[0], pixel_ids[0]))
    else:
        rgb = jax.lax.map(run, (origins, dirs, pixel_ids)).reshape(-1, 3)
        rgb = rgb[:n_pix]
    return rgb.reshape(height, width, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_from_basis_pallas(scene: Scene, assets: SceneAssets,
                             basis: PerspectiveBasis, cfg: RenderConfig):
    from .kernels.pallas_trace import render_pallas
    return render_pallas(scene, assets, basis, cfg)


def render_from_basis(scene: Scene, assets: SceneAssets,
                      basis: PerspectiveBasis, cfg: RenderConfig):
    """Engine-dispatching forward render (cfg.engine: auto|pallas|xla).

    The Pallas tile megakernel is the fast path on TPU hardware; the XLA
    tracer is the differentiable/portable path and covers triangle scenes.
    """
    if _use_pallas(scene, cfg):
        return render_from_basis_pallas(scene, assets, basis, cfg)
    return render_from_basis_xla(scene, assets, basis, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_pallas_checked_jit(scene: Scene, assets: SceneAssets,
                               basis: PerspectiveBasis, cfg: RenderConfig):
    from .kernels.pallas_trace import render_pallas_checked
    return render_pallas_checked(scene, assets, basis, cfg)


def render_from_basis_checked(scene: Scene, assets: SceneAssets,
                              basis: PerspectiveBasis, cfg: RenderConfig,
                              max_retries: int = 2):
    """Megakernel render with the event-overflow feedback loop.

    The Pallas engine defers texel (sky/texture) contributions to a
    bounded per-pixel event buffer; deep reflect/refract chains can exceed
    it, silently dropping terminal contributions with tiny throughput.
    This wrapper reads the kernel's overflow counters and re-renders with
    the exact needed capacity (host-side control flow — each retry is a
    recompile, which only offline/once-per-config paths should pay).

    Returns (img, info) with info = {dropped, retries, event_slots}:
    ``dropped`` > 0 after ``max_retries`` means the scene needs more than
    64 slots (the 6-bit event addressing cap) and the image is degraded —
    callers should surface that loudly.
    """
    if not _use_pallas(scene, cfg):
        img = render_from_basis_xla(scene, assets, basis, cfg)
        return img, {"dropped": 0, "retries": 0,
                     "event_slots": 0, "engine": "xla"}
    dropped = 0
    for attempt in range(max_retries + 1):
        img, dropped_a, needed_a = _render_pallas_checked_jit(
            scene, assets, basis, cfg)
        dropped = int(dropped_a)
        if dropped == 0 or attempt == max_retries:
            break
        cfg = cfg.replace(event_slots=min(int(needed_a), 64))
    return img, {"dropped": dropped, "retries": attempt,
                 "event_slots": cfg.resolved_event_slots(),
                 "engine": "pallas"}


def render(scene: Scene, assets: SceneAssets, camera: Camera,
           cfg: RenderConfig) -> jnp.ndarray:
    """Render to float32 linear rgb [H, W, 3]."""
    basis = perspective_basis(camera, cfg.width, cfg.height)
    return render_from_basis(scene, assets, basis, cfg)


def render_u8(scene: Scene, assets: SceneAssets, camera: Camera,
              cfg: RenderConfig) -> np.ndarray:
    """Render and quantize exactly like the reference output path
    (clamp * 255, truncate; raytracing.cl:193-194)."""
    rgb = render(scene, assets, camera, cfg)
    img = quantize_image(rgb.reshape(-1, 3), cfg.width, cfg.height)
    return np.asarray(jax.device_get(img))
