"""Cost of candidate host-side formats for the planar conv kernel.

The full 2x2 phase split (planar_s2d) costs ~40 ms at the v4.6 encoder
shapes because the W deinterleave crosses lanes.  Candidates:

  T1  BCHW -> BHCW pad+transpose (s1 kernel's native diet; W minor kept)
  T2  BCHW -> H-phase-only split (B, H/2, C*2, W) pad+transpose
      (W minor kept; W deinterleave would move INTO the kernel)
  T3  full planar_s2d + pad + transpose (current s2 path, for reference)
  T4  strided lane slice x[..., 0::2] in XLA (W deinterleave alone)

Run: python -u tools/planar_fmt.py [B]
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

    from rife_tpu.ops import conv_planar as CP

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(0)

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(out[(0,) * out.ndim])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[(0,) * out.ndim])
        return (time.perf_counter() - t0) / iters

    for (cin, h, w, label) in [
        (12, 1088, 1920, "v4.6 convrelu_6 in"),
        (32, 544, 960, "v4.6 convrelu_7 in"),
    ]:
        x = jnp.ones((B, cin, h, w), jnp.bfloat16)  # timing only

        wp = CP._round_up(w, CP.LANE) + CP.LANE
        hp = CP._round_up(h, CP.TH) + 2
        f1 = jax.jit(lambda x: jnp.pad(
            x, ((0, 0), (0, CP._round_up(cin, 8) - cin), (1, hp - h - 1),
                (1, wp - w - 1))).transpose(0, 2, 1, 3))
        t1 = timeit(f1, x)

        c2 = cin * 2
        hp2 = CP._round_up(h // 2, CP.TH) + 1
        wp2 = CP._round_up(w, CP.LANE) + CP.LANE

        def hsplit(x):
            b, c, hh, ww = x.shape
            y = x.reshape(b, c, hh // 2, 2, ww)
            y = y.transpose(0, 2, 3, 1, 4).reshape(b, hh // 2, c * 2, ww)
            return jnp.pad(
                y, ((0, 0), (0, hp2 - hh // 2), (0, CP._round_up(c2, 8) - c2),
                    (1, wp2 - ww - 1)))

        f2 = jax.jit(hsplit)
        t2 = timeit(f2, x)

        cin4 = CP._round_up(cin * 4, CP.TH)
        oh, ow = h // 2, w // 2
        wo_pad = CP._round_up(ow, CP.LANE)
        wp4 = wo_pad + CP.LANE
        hp4 = CP._round_up(oh, CP.TH) + 1
        f3 = jax.jit(lambda x: jnp.pad(
            CP.planar_s2d(x),
            ((0, 0), (0, cin4 - cin * 4), (1, hp4 - oh - 1),
             (1, wp4 - ow - 1))).transpose(0, 2, 1, 3))
        t3 = timeit(f3, x)

        f4 = jax.jit(lambda x: x[..., 0::2] + 0)
        t4 = timeit(f4, x)

        gb = x.size * 2 / 1e9
        print(f"{label} C={cin} @{h}x{w} B={B} ({gb:.2f} GB):")
        print(f"  T1 BHCW pad+transpose : {t1*1e3:7.1f} ms")
        print(f"  T2 H-phase split      : {t2*1e3:7.1f} ms")
        print(f"  T3 full s2d (current) : {t3*1e3:7.1f} ms")
        print(f"  T4 lane-strided slice : {t4*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
