"""A/B: tall abs_pos WarpDs4Pair (+ external downsample) vs the SHEARED
phase-split ds4 pair kernel that emits the final 1/4-res planes.

Composed reference = exactly what jax_ops._op_warp_ds4_pair builds on the
round-4 default path: `_ds4_abs_positions` tap grid -> warp_pallas_pair(
abs_pos=True) -> `_downsample_axis(..., 2, 1)` -> `_downsample_axis(..., 2,
2)`.  The sheared kernel must match it bit-exactly (same corner algebra,
same storage-dtype 0.5/0.5 tap averages) at lane-aligned and unaligned
shapes, smooth and adversarial iid flows, then win on time.

Run: python -u tools/warp_ds4_ab.py [B] [TS]
"""

from __future__ import annotations

import os
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

    from rife_tpu.ops import jax_ops
    from rife_tpu.ops.warp_pallas import warp_pallas_ds4_pair, warp_pallas_pair

    ds4_raw = warp_pallas_ds4_pair.__wrapped__
    pair_raw = warp_pallas_pair.__wrapped__

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    if len(sys.argv) > 2:
        os.environ["RIFE_TPU_WARP_DS4_TS"] = sys.argv[2]
    H, W = 1088, 1920

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8)

    base0 = jnp.asarray(load("/root/reference/images/0.png"))
    base1 = jnp.asarray(load("/root/reference/images/1.png"))

    def make_operands(b0, b1, b, h, w):
        @jax.jit
        def mk(b0, b1):
            img_a = jnp.tile(
                b0[None, :h, :w].astype(jnp.bfloat16) / 255.0, (b, 1, 1, 1))
            img_b = jnp.tile(
                b1[None, :h, :w].astype(jnp.bfloat16) / 255.0, (b, 1, 1, 1))
            yy = jnp.linspace(0.0, 4 * jnp.pi, h)[:, None]
            xx = jnp.linspace(0.0, 4 * jnp.pi, w)[None, :]
            z = jnp.zeros((h, w), jnp.float32)
            fa = jnp.stack([3.0 * jnp.sin(yy + 0.5 * xx) + z,
                            2.0 * jnp.cos(xx) + z], -1)
            fb = jnp.stack([-2.5 * jnp.cos(0.7 * yy) + z,
                            3.5 * jnp.sin(0.6 * xx + yy) + z], -1)
            flow_a = jnp.tile(fa[None].astype(jnp.bfloat16), (b, 1, 1, 1))
            flow_b = jnp.tile(fb[None].astype(jnp.bfloat16), (b, 1, 1, 1))
            return img_a, img_b, flow_a, flow_b

        return jax.block_until_ready(mk(b0, b1))

    def composed(ia, fa, ib, fb):
        sxa, sya = jax_ops._ds4_abs_positions(ia, fa)
        sxb, syb = jax_ops._ds4_abs_positions(ib, fb)
        y_a, y_b = pair_raw(
            ia, jnp.stack([sxa, sya], axis=-1),
            ib, jnp.stack([sxb, syb], axis=-1), abs_pos=True)
        ds = jax_ops._downsample_axis
        return ds(ds(y_a, 2, 1), 2, 2), ds(ds(y_b, 2, 1), 2, 2)

    comp_f = jax.jit(composed)
    shear_f = jax.jit(lambda ia, fa, ib, fb: ds4_raw(ia, fa, ib, fb))

    def dmax(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))

    # exactness at an awkward small shape first (fast trace): 4-aligned but
    # lane/stripe-unaligned final grid (148/4=37 rows, 404/4=101 cols)
    ia, ib, fa, fb = make_operands(base0, base1, 2, 148, 404)
    ca, cb = comp_f(ia, fa, ib, fb)
    sa, sb = shear_f(ia, fa, ib, fb)
    print(f"small unaligned exactness: a={dmax(ca, sa):.3e} "
          f"b={dmax(cb, sb):.3e}", flush=True)

    ia, ib, fa, fb = make_operands(base0, base1, B, H, W)
    print("1080p operands on device", flush=True)
    t0 = time.perf_counter()
    ca, cb = comp_f(ia, fa, ib, fb)
    sa, sb = shear_f(ia, fa, ib, fb)
    print(f"traced ({time.perf_counter() - t0:.0f}s); 1080p exactness: "
          f"a={dmax(ca, sa):.3e} b={dmax(cb, sb):.3e}", flush=True)
    del ca, cb, sa, sb

    t_c = timeit(lambda: comp_f(ia, fa, ib, fb)[1])
    t_s = timeit(lambda: shear_f(ia, fa, ib, fb)[1])
    print(f"smooth ds4 pair: tall+ds {t_c:8.2f} ms   sheared {t_s:8.2f} ms"
          f"  ({t_c / t_s:.2f}x)", flush=True)

    # adversarial iid flow
    @jax.jit
    def make_iid():
        key = jax.random.PRNGKey(7)
        f = jax.random.uniform(key, (H, W, 2), jnp.float32, -24.0, 24.0)
        return jnp.tile(f[None].astype(jnp.bfloat16), (B, 1, 1, 1))

    fiid = jax.block_until_ready(make_iid())
    cia, _ = comp_f(ia, fiid, ib, fiid)
    sia, _ = shear_f(ia, fiid, ib, fiid)
    print(f"iid exactness: {dmax(cia, sia):.3e}", flush=True)
    del cia, sia
    t_ci = timeit(lambda: comp_f(ia, fiid, ib, fiid)[1], iters=2, warm=1)
    t_si = timeit(lambda: shear_f(ia, fiid, ib, fiid)[1], iters=2, warm=1)
    print(f"iid ds4 pair:    tall+ds {t_ci:8.2f} ms   sheared {t_si:8.2f} ms"
          f"  ({t_ci / t_si:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
