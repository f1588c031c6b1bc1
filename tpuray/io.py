"""Image I/O + golden-image comparison.

``write_png``/``read_png`` are the analog of png_dump (cpu_ray.c:108-165)
and the wrapper's PNG loader (opencl_wrap.c:241-320).  A native libpng
codec lives in ``tpuray/native``; PIL is the portable fallback.

``image_diff_stats`` quantifies closeness to the committed golden render
``/root/reference/out/scene.png`` (the reference's only validation artifact;
SURVEY.md §4).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def write_png(path: str, img_u8: np.ndarray) -> None:
    from . import native_lib
    if native_lib.available():
        native_lib.write_png(path, img_u8)
        return
    from PIL import Image
    Image.fromarray(np.asarray(img_u8, np.uint8), "RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


@dataclass
class DiffStats:
    mean_abs: float          # mean |a-b| over all channels, 0..255 scale
    max_abs: float
    frac_within_1: float     # fraction of channel values within +-1
    frac_within_4: float
    frac_within_8: float
    psnr: float

    def __str__(self):
        return (f"mean|d|={self.mean_abs:.3f} max|d|={self.max_abs:.0f} "
                f"<=1:{self.frac_within_1:.4f} <=4:{self.frac_within_4:.4f} "
                f"<=8:{self.frac_within_8:.4f} psnr={self.psnr:.1f}dB")


def image_diff_stats(a: np.ndarray, b: np.ndarray) -> DiffStats:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    d = np.abs(a - b)
    mse = float(np.mean(d * d))
    psnr = 99.0 if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)
    return DiffStats(mean_abs=float(d.mean()), max_abs=float(d.max()),
                     frac_within_1=float((d <= 1).mean()),
                     frac_within_4=float((d <= 4).mean()),
                     frac_within_8=float((d <= 8).mean()),
                     psnr=psnr)


GOLDEN_PNG = "/root/reference/out/scene.png"
