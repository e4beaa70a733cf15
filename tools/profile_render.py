"""Decompose the v4.6 render tail (warp pair + sigmoid blend + postproc).

profile_b3.py measured the render+post marginal at 80.8 ms (B=24) while
the roofline is ~45 (warp pair ~39 + ~1 ms of elementwise).  This times
the pieces in isolation on device data:

  1. one u8-quad full-res warp (the render warps warp_6/7)
  2. blend+postprocess from bf16 NHWC warped tensors
  3. blend+postprocess from plane-major (B*C, H, W) warped tensors
     (what the warp kernel produces BEFORE its NHWC transpose)

Run: python -u tools/profile_render.py [B]
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

    from rife_tpu.ops import frame
    from rife_tpu.ops.warp_pallas import warp_pallas

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[0])  # device-side slice, tiny readback

    def timeit(fn, *args, iters=6):
        sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    img = jnp.asarray(
        rng.integers(0, 256, (B, H, W, 3)).astype(np.float32) / 255.0,
        jnp.bfloat16)
    # smooth flow like the mix weights produce
    gy = np.linspace(0, 4, H, dtype=np.float32)
    gx = np.linspace(0, 4, W, dtype=np.float32)
    fl = np.stack(np.broadcast_arrays(
        np.sin(gx)[None, None, :] * 3, np.cos(gy)[None, :, None] * 3,
    ), -1).astype(np.float32)
    flow = jnp.asarray(np.broadcast_to(fl, (B, H, W, 2)).copy())

    wp = jax.jit(lambda i, f: warp_pallas(i, f, u8_origin=True))
    t = timeit(wp, img, flow)
    print(f"1 u8-quad full-res warp        : {t*1e3:8.1f} ms")

    w0 = jnp.asarray(
        rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(
        rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32), jnp.bfloat16)
    mask = jnp.asarray(
        rng.normal(size=(B, H, W, 1)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def blend_post(w0, w1, m):
        m = jax.nn.sigmoid(m)
        out = w0 * m + w1 * (1 - m)
        return frame.postprocess(out, 1080, 1920)

    t = timeit(blend_post, w0, w1, mask)
    print(f"blend+postproc (NHWC bf16)     : {t*1e3:8.1f} ms")

    p0 = jnp.asarray(
        rng.uniform(0, 1, (B * 3, H, W)).astype(np.float32), jnp.bfloat16)
    p1 = jnp.asarray(
        rng.uniform(0, 1, (B * 3, H, W)).astype(np.float32), jnp.bfloat16)
    mp = jnp.asarray(
        rng.normal(size=(B, 1, H, W)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def blend_post_planes(p0, p1, m):
        m = jax.nn.sigmoid(m)  # (B,1,H,W)
        a = p0.reshape(B, 3, H, W)
        bb = p1.reshape(B, 3, H, W)
        out = a * m + bb * (1 - m)
        out = out.transpose(0, 2, 3, 1)
        return frame.postprocess(out, 1080, 1920)

    t = timeit(blend_post_planes, p0, p1, mp)
    print(f"blend+postproc (plane-major)   : {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
