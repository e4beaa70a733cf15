"""A/B: two separate slab-tall-inflow warp calls vs ONE pair pallas_call.

Uses real frames + a calibrated-smooth synthetic flow pair (the headline
workload's statistics).  Checks exactness (pair vs two calls) and times
both forms, plus the render (pair+blend) form vs two calls + XLA blend.

Run: python -u tools/warp_pair_ab.py [B]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(x):
    return np.asarray(x.ravel()[0])


def timeit(fn, iters=10, warm=2):
    for _ in range(warm):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rife_tpu.ops.warp_pallas import warp_pallas, warp_pallas_pair

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    H, W = 1088, 1920

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8)

    f0 = np.broadcast_to(load("/root/reference/images/0.png"),
                         (B, H, W, 3)).copy()
    f1 = np.broadcast_to(load("/root/reference/images/1.png"),
                         (B, H, W, 3)).copy()
    img_a = jnp.asarray(f0, jnp.bfloat16) / 255.0
    img_b = jnp.asarray(f1, jnp.bfloat16) / 255.0

    # smooth flows like the calibrated synthetic weights produce (~2-6 px
    # std, low spatial frequency)
    yy = np.linspace(0, 4 * np.pi, H)[:, None]
    xx = np.linspace(0, 4 * np.pi, W)[None, :]
    zz = np.zeros((H, W))
    fa = np.stack([3.0 * np.sin(yy + 0.5 * xx) + zz, 2.0 * np.cos(xx) + zz],
                  -1)
    fb = np.stack([-2.5 * np.cos(0.7 * yy) + zz,
                   3.5 * np.sin(0.6 * xx + yy) + zz], -1)
    flow_a = jnp.asarray(np.broadcast_to(fa, (B, H, W, 2)), jnp.float32)
    flow_b = jnp.asarray(np.broadcast_to(fb, (B, H, W, 2)), jnp.float32)
    mask = jnp.asarray(
        np.broadcast_to(0.5 + 0.4 * np.sin(yy + xx), (B, H, W)),
        jnp.float32)

    two = jax.jit(lambda: (
        warp_pallas(img_a, flow_a, u8_origin=True, u8_variant="slab"),
        warp_pallas(img_b, flow_b, u8_origin=True, u8_variant="slab"),
    ))
    pair = jax.jit(lambda: warp_pallas_pair(img_a, flow_a, img_b, flow_b))

    (ra, rb) = two()
    (pa, pb) = pair()
    da = np.abs(np.asarray(ra, np.float32) - np.asarray(pa, np.float32))
    db = np.abs(np.asarray(rb, np.float32) - np.asarray(pb, np.float32))
    print(f"pair exactness: max|d| a={da.max():.3e} b={db.max():.3e}")

    t_two = timeit(lambda: two()[1])
    t_pair = timeit(lambda: pair()[1])
    print(f"two calls: {t_two:8.2f} ms   pair call: {t_pair:8.2f} ms  "
          f"({t_two - t_pair:+.2f})")

    # render form
    m4 = mask[..., None].astype(jnp.bfloat16)
    two_r = jax.jit(lambda: (
        warp_pallas(img_a, flow_a, u8_origin=True, u8_variant="slab")
        * m4
        + warp_pallas(img_b, flow_b, u8_origin=True, u8_variant="slab")
        * (1.0 - m4)
    ))
    rend = jax.jit(lambda: warp_pallas_pair(
        img_a, flow_a, img_b, flow_b, mask, blend=True))
    rr = np.asarray(two_r(), np.float32)
    pr = np.asarray(rend(), np.float32)
    print(f"render exactness: max|d|={np.abs(rr - pr).max():.3e}")
    t_two_r = timeit(lambda: two_r())
    t_rend = timeit(lambda: rend())
    print(f"two+blend: {t_two_r:8.2f} ms   render call: {t_rend:8.2f} ms  "
          f"({t_two_r - t_rend:+.2f})")


if __name__ == "__main__":
    main()
