"""Render configuration.

The reference's config surface is all compile-time ``#define``s: WIDTH/HEIGHT
(raypng.c:8-9), MAX_DEPTH=15 and MAX_SOFT_SHADOWS=2 (raytracing.cl:9-11),
EPSILON=0.001 and TRANSPERENT_THROUGH=0.8 (primitives.cl:5-7).  Here it is a
single frozen dataclass whose defaults equal the reference constants, so the
golden-image comparison runs with an identically configured pipeline.

``RenderConfig`` is hashable and is passed as a static argument to jitted
renderers (a new config triggers a recompile — the analog of rebuilding the
OpenCL program with different #defines).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 800                  # raypng.c:8
    height: int = 600                 # raypng.c:9
    max_depth: int = 15               # raytracing.cl:9
    shadow_samples: int = 2           # MAX_SOFT_SHADOWS, raytracing.cl:11
    epsilon: float = 1e-3             # primitives.cl:5
    transparent_through: float = 0.8  # primitives.cl:7
    default_n: float = 1.0            # raytracing.cl:7

    # --- TPU execution knobs (no reference analog) ---
    # Pixels per traced chunk; chunks run sequentially via lax.map so HBM
    # footprint and while-loop straggler cost stay bounded.  0 = whole image.
    chunk_size: int = 65536
    # Hard cap on DFS iterations per chunk (safety only; the while_loop exits
    # as soon as every lane finishes).  Worst-case node visits for a binary
    # reflect/refract tree of depth D is 2^D, and each node costs at most two
    # iterations (visit + pop).
    max_iters: int = 8192
    # 'while' = lax.while_loop fast forward path (not reverse-differentiable);
    # 'scan'  = fixed-trip lax.scan, reverse-mode differentiable.
    loop: str = "while"
    # Iteration count for loop='scan'.  0 = auto (2 * 2^max_depth, capped).
    scan_iters: int = 0
    # Rendering engine: 'pallas' = tile megakernel (fastest forward path),
    # 'xla' = the whole-image while/scan tracer (differentiable, supports
    # triangles), 'auto' = pallas when supported else xla.
    engine: str = "auto"
    # Deferred texel-event slots per pixel in the Pallas engine (sky + plane
    # texture contributions resolved by one gather outside the kernel).
    # 0 = auto: exact bound 2^(depth+1)-1 for shallow traces, capped at 16
    # (the kernel reports overflow; raise for pathological scenes).
    event_slots: int = 0

    def resolved_event_slots(self) -> int:
        if self.event_slots:
            return self.event_slots
        return min(2 ** (self.max_depth + 1) - 1, 24)


    # --- active-lane compaction (XLA 'while' engine) ---
    # After `compact_after` full-width DFS steps (which finish the bulk of
    # lanes), still-active lanes are repeatedly gathered into a buffer of
    # `P * compact_frac` lanes and advanced `compact_steps` steps at a time.
    # Exact per-lane semantics (incl. RNG sequence) are preserved — only
    # the schedule changes.  compact_frac = 0 (default) disables compaction:
    # on backends with high per-op dispatch overhead the gather/scatter
    # rounds cost more than the masked-lane waste they save; enable on
    # backends where vector work, not op count, dominates.
    compact_after: int = 3
    compact_frac: float = 0.0
    compact_steps: int = 8

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def resolved_scan_iters(self) -> int:
        if self.scan_iters:
            return self.scan_iters
        return min(2 * (2 ** self.max_depth), self.max_iters)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# Reference camera for the golden render (raypng.c:17-21).
GOLDEN_CAMERA_ORIGIN = (0.8, 2.5, -8.0)
GOLDEN_CAMERA_LOOKDIR = (0.2, 0.0, 1.0)
GOLDEN_CAMERA_FOV = 90.0
GOLDEN_CAMERA_FOCAL = 1.0
