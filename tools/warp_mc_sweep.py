"""Sweep the mc warp kernel's channel group size on the v2 contextnet
shapes (C=32 @ 544x960, C=64 @ 272x480, B=4 — the dominant v2.3 warps).

Run: python -u tools/warp_mc_sweep.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops import warp_pallas as W

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    for c, h, w in ((32, 544, 960), (64, 272, 480)):
        img = jnp.asarray(rng.normal(size=(4, h, w, c)), jnp.bfloat16)
        yy = np.linspace(0, 6.28, h, dtype=np.float32)[:, None]
        xx = np.linspace(0, 6.28, w, dtype=np.float32)[None, :]
        flow = np.broadcast_to(np.stack(
            [3.0 * np.sin(3 * yy + 1.7 * xx),
             2.0 * np.cos(2.2 * yy - 1.1 * xx)], -1)[None],
            (4, h, w, 2)).copy()
        df = jnp.asarray(flow, jnp.bfloat16)
        for gs, tall in (("1", "0"), ("8", "0"), ("16", "0"),
                         ("8", "1"), ("16", "1")):
            # gs=1 routes to the single-pair kernel (per-pair grid)
            os.environ["RIFE_TPU_WARP_MC_GS"] = gs
            os.environ["RIFE_TPU_WARP_MC_TALL"] = tall
            g = jax.jit(functools.partial(W._warp_pallas_packed_impl))
            dt = timeit(g, img, df)
            print(f"C={c} {h}x{w} gs={gs:>4s} tall={tall}: "
                  f"{dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
