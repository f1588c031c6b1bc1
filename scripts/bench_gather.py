"""Microbenchmark: XLA:TPU gather issue rate vs table size / index order.

Decides whether the event resolve can beat ~7 ns/element by (a) gathering
textures from a small table, (b) sorting indices, or (c) gathering wider
rows.  Chained-in-one-jit timing with per-iteration index perturbation and
scalar readback (axon async dispatch makes block_until_ready lie).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_IDX = 3_300_000
CHAIN = 8


def rate(table, idx, label):
    @functools.partial(jax.jit, static_argnames=("n",))
    def take_n(t, ix, n):
        def body(i, acc):
            ix2 = (ix + i) % t.shape[0]
            return acc + jnp.sum(jnp.take(t, ix2, axis=0,
                                          unique_indices=False))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), t.dtype))

    for n in (1, CHAIN):
        jax.block_until_ready(take_n(table, idx, n))
        float(jnp.sum(take_n(table, idx, n)))

    def best_of(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(take_n(table, idx, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (best_of(CHAIN) - best_of(1)) / (CHAIN - 1)
    n_el = idx.shape[0]
    print(f"{label:44s} {per*1e3:8.2f} ms  {per/n_el*1e9:6.2f} ns/el")
    return per


key = jax.random.PRNGKey(0)
big = jax.random.randint(key, (12_600_000,), 0, 2**31 - 1, jnp.int32)
small = big[:262_144]
tiny = big[:65_536]

idx_big = jax.random.randint(key, (N_IDX,), 0, big.shape[0], jnp.int32)
idx_small = idx_big % small.shape[0]
idx_tiny = idx_big % tiny.shape[0]
idx_sorted = jnp.sort(idx_big)

rate(big, idx_big, "12.6M-entry table, random idx")
rate(big, idx_sorted, "12.6M-entry table, sorted idx")
rate(small, idx_small, "262K-entry table (1 MB), random idx")
rate(tiny, idx_tiny, "64K-entry table (256 KB), random idx")

# row gather: [N/8, 8] table, fetch full rows (is wide-gather cheaper/row?)
rows = big[: (big.shape[0] // 8) * 8].reshape(-1, 8)
idx_rows = idx_big[: N_IDX // 8] % rows.shape[0]
per = rate(rows, idx_rows, "row gather [1.6M, 8] u32, N/8 random rows")
