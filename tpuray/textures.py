"""Texture atlas + cubemap skybox loading.

TPU-native equivalent of ``cl_wrap_load_images`` (opencl_wrap.c:189-349),
which loads N same-size RGB8 PNGs into one OpenCL ``image2d_array``.  Here
the atlas is a single ``[N, H, W, 3] uint8`` device array; texel fetches are
XLA gathers (or in-kernel Pallas gathers), and the u8 -> float normalization
(/255) happens after the gather exactly like the reference's manual cast
(raytracing.cl:71-76, primitives.cl:250-256).

The skybox is a 4x3 horizontal-cross cubemap in a single image
(face_size = width/4, raytracing.cl:62-63); the direction -> texel mapping
lives in :mod:`tpuray.kernels.primitives` (``map_to_cube``).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

REFERENCE_ASSETS = "/root/reference/assets"

# Texture load order used by both reference apps (raypng.c:74-78,
# rayinteractive.c:170-174): the ground plane's texture_id=2 is check.png.
DEFAULT_TEXTURES = ("cobblestone.png", "sand.png", "check.png", "grass.png")
DEFAULT_SKYBOX = "bg/stormydays.png"


class SceneAssets(NamedTuple):
    """Device-resident image data for one render.

    ``atlas_rows`` is the precomputed row view of the packed texel atlas
    (textures ++ skybox as 0x00RRGGBB u32, padded to a multiple of 64 and
    reshaped to [R, 64]) used by the megakernel's event resolve.  Packing
    it once at load time keeps the ~50 MB u8->u32 convert + reshape out
    of the per-render jit graph (it cost ~1.5 ms/render when traced).
    ``None`` falls back to packing inside the trace (tests building raw
    assets)."""
    textures: jnp.ndarray  # [N, H, W, 3] u8 plane-texture atlas
    skybox: jnp.ndarray    # [Hs, Ws, 3] u8 4x3-cross cubemap
    atlas_rows: "jnp.ndarray | None" = None  # [R, 64] u32 packed texels


def pack_atlas_rows(textures, skybox) -> jnp.ndarray:
    """Host-side (numpy) texel-atlas packing: 0x00RRGGBB u32 rows [R, 64].

    The flat layout is textures (layer-major) then skybox, matching the
    megakernel's event indices (kernels/pallas_trace.py build_atlas)."""
    def pack(img):
        u = np.asarray(img, np.uint32)
        return (u[..., 0] << 16) | (u[..., 1] << 8) | u[..., 2]

    flat = np.concatenate([pack(textures).reshape(-1),
                           pack(skybox).reshape(-1)])
    pad = (-flat.shape[0]) % 64
    return jnp.asarray(np.pad(flat, (0, pad)).reshape(-1, 64))


def _read_png_rgb(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_textures(paths: Sequence[str]) -> jnp.ndarray:
    """Load same-size RGB8 PNGs into a [N, H, W, 3] u8 atlas."""
    imgs = [_read_png_rgb(p) for p in paths]
    shape = imgs[0].shape
    for p, im in zip(paths, imgs):
        if im.shape != shape:
            raise ValueError(f"texture size mismatch: {p} has {im.shape}, "
                             f"expected {shape} (all atlas layers must match, "
                             "as in opencl_wrap.c:223-231)")
    return jnp.asarray(np.stack(imgs))


def load_skybox(path: str) -> jnp.ndarray:
    im = _read_png_rgb(path)
    if im.shape[1] % 4 or im.shape[0] * 4 != im.shape[1] * 3:
        raise ValueError(f"skybox {path} is {im.shape[1]}x{im.shape[0]}; "
                         "expected a 4x3 horizontal-cross cubemap layout")
    return jnp.asarray(im)


def load_default_assets(asset_dir: str = REFERENCE_ASSETS,
                        skybox: str = DEFAULT_SKYBOX) -> SceneAssets:
    """The exact asset set the reference apps bind (raypng.c:74-81).

    ``skybox``: cross-layout cubemap path relative to ``asset_dir`` —
    the reference ships two (``bg/stormydays.png``, used, and
    ``bg/lake.png``, the unused alternative; both load here)."""
    tex = load_textures([os.path.join(asset_dir, t) for t in DEFAULT_TEXTURES])
    sky = load_skybox(os.path.join(asset_dir, skybox))
    return SceneAssets(textures=tex, skybox=sky,
                       atlas_rows=pack_atlas_rows(tex, sky))


def solid_assets(n_textures: int = 1, tex_size: int = 8,
                 sky_face: int = 4, rgb=(0, 0, 0)) -> SceneAssets:
    """Minimal flat-color assets for tests/scenes without textures."""
    col = np.asarray(rgb, np.uint8)
    tex = np.broadcast_to(col, (n_textures, tex_size, tex_size, 3))
    sky = np.broadcast_to(col, (sky_face * 3, sky_face * 4, 3))
    return SceneAssets(textures=jnp.asarray(np.ascontiguousarray(tex)),
                       skybox=jnp.asarray(np.ascontiguousarray(sky)),
                       atlas_rows=pack_atlas_rows(tex, sky))
