"""Warp-kernel stripe height (TH) sweep — amortize the per-cell fixed cost.

The u8-quad warp's grid is (B, H/TH); per-cell fixed costs (DMA issue,
band-walk setup) put a floor under every warp.  Larger stripes cut the
cell count while the halo overhead per output row shrinks.  TH is a
module global resolved at trace time; jax caches are cleared per setting.

Run: python -u tools/th_sweep.py [B]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
H, W = 1088, 1920


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops import warp_pallas as WP

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[0])

    img = jnp.asarray(
        rng.integers(0, 256, (B, H, W, 3)).astype(np.float32) / 255.0,
        jnp.bfloat16)
    gy = np.linspace(0, 4, H, dtype=np.float32)
    gx = np.linspace(0, 4, W, dtype=np.float32)
    fl = np.stack(np.broadcast_arrays(
        np.sin(gx)[None, None, :] * 3, np.cos(gy)[None, :, None] * 3,
    ), -1).astype(np.float32)
    flow = jnp.asarray(np.broadcast_to(fl, (B, H, W, 2)).copy())

    ref = None
    for th in (8, 16, 32):
        WP.TH = th
        jax.clear_caches()
        try:
            fn = jax.jit(
                lambda i, f: WP.warp_pallas(i, f, u8_origin=True))
            out = fn(img, flow)
            o0 = np.asarray(out[:1]).astype(np.float32)
            if ref is None:
                ref = o0
            err = float(np.abs(o0 - ref).max())
            iters = 6
            t0 = time.perf_counter()
            r = None
            for _ in range(iters):
                r = fn(img, flow)
            sync(r)
            dt = (time.perf_counter() - t0) / iters
            print(f"TH={th:3d}: {dt*1e3:8.2f} ms/warp  (maxdiff vs TH8: "
                  f"{err:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"TH={th:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    WP.TH = 8
    jax.clear_caches()


if __name__ == "__main__":
    main()
