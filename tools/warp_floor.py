"""Current u8 warp variant standings at the production shape (B=24 1080p,
mix-synthesis-like smooth flows) — the VERDICT round-3 target is <=5 ms.

Run: python -u tools/warp_floor.py [B] [H W]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops.warp_pallas import warp_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1920

    # smooth flow, ~RIFE-like stats: low-freq sin field, std ~4 px
    yy = np.linspace(0, 6.28, H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 6.28, W, dtype=np.float32)[None, :]
    fx = 4.0 * np.sin(3 * yy + 1.7 * xx)
    fy = 3.0 * np.cos(2.2 * yy - 1.1 * xx)
    flow = np.broadcast_to(
        np.stack([fx, fy], -1)[None], (B, H, W, 2)
    ).copy()
    img = (np.random.default_rng(0)
           .integers(0, 256, (1, H, W, 3)).astype(np.float32) / 255.0)
    img = np.broadcast_to(img, (B, H, W, 3)).copy()

    di = jnp.asarray(img)
    df = jnp.asarray(flow)

    def timeit(fn, iters=10):
        out = fn()
        np.asarray(out[(0,) * out.ndim])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[(0,) * out.ndim])
        return (time.perf_counter() - t0) / iters

    import functools
    for var in ["band", "delta", "slab", "sdelta"]:
        # image/flow as jit ARGUMENTS: closing over them embeds them as
        # HLO constants, which the remote-compile tunnel rejects (413)
        f = jax.jit(functools.partial(
            warp_pallas, u8_origin=True, u8_variant=var))
        try:
            dt = timeit(lambda f=f: f(di, df))
            print(f"{var:7s}: {dt*1e3:7.2f} ms  "
                  f"({dt*1e3/B:5.3f} ms/frame)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{var:7s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
