"""Cost split of the PAIR warp kernel: structural floor vs gather work.

Times warp_pallas_pair on the headline shape (B x 1088 x 1920) under three
flow regimes:

  zero    flow == 0 everywhere: every stripe's band range collapses to its
          own source band and the x-tile span to ~1 tile, so the gather
          loop runs its minimum iteration count.  What remains is the
          structural floor: per-cell fixed cost, operand loads, in-kernel
          corner math, band DMA, accumulator zero/writes, output writes.
  smooth  the calibrated-synthetic statistics (~2-6 px, low spatial
          frequency) — the headline workload.
  rough   RIFE_TPU_SYNTH_MODE=iid-like spatially-white +-8 px flow — the
          adversarial regime (routes to the band kernel in production via
          the auto probe; timed here on the pair kernel for the split).

The smooth-minus-zero delta is the gather work a smarter inner loop could
still win; zero is the floor no gather change can cross.

Run: python -u tools/warp_floor.py [B]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(x):
    return np.asarray(x[0].ravel()[0])


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

    from rife_tpu.ops.warp_pallas import warp_pallas_pair

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

    yy = np.linspace(0, 4 * np.pi, H)[:, None]
    xx = np.linspace(0, 4 * np.pi, W)[None, :]
    zz = np.zeros((H, W))
    regimes = {
        "zero": (np.zeros((H, W, 2)), np.zeros((H, W, 2))),
        "smooth": (
            np.stack([3.0 * np.sin(yy + 0.5 * xx) + zz,
                      2.0 * np.cos(xx) + zz], -1),
            np.stack([-2.5 * np.cos(0.7 * yy) + zz,
                      3.5 * np.sin(0.6 * xx + yy) + zz], -1),
        ),
        "rough": (
            np.random.default_rng(0).uniform(-8, 8, (H, W, 2)),
            np.random.default_rng(1).uniform(-8, 8, (H, W, 2)),
        ),
    }

    # flows/images must be jit ARGUMENTS: closed-over arrays embed as
    # program constants and blow the dev tunnel's compile-request limit
    pair = jax.jit(lambda ia, fa, ib, fb: warp_pallas_pair(ia, fa, ib, fb))
    for name, (fa, fb) in regimes.items():
        flow_a = jnp.asarray(np.broadcast_to(fa, (B, H, W, 2)), jnp.bfloat16)
        flow_b = jnp.asarray(np.broadcast_to(fb, (B, H, W, 2)), jnp.bfloat16)
        t = timeit(lambda: pair(img_a, flow_a, img_b, flow_b)[0])
        print(f"{name:7s}: {t:8.2f} ms")


if __name__ == "__main__":
    main()
