"""Chained BHCW planar convs (kernel-to-kernel, no NCHW round trips).

Serial chain of same-C 3x3 s1 convs staying in the BHCW interchange
format (each step: lane/row re-pad + kernel).  Marginal ms/conv =
(t12 - t4) / 8.  XLA NHWC baselines (tools/conv_chain.py, B=24):
C=32@540x960: 26.2   C=48: 13.6   C=64@272x480: 3.25   C=128: 19.1

Run: python -u tools/planar_chain.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B = 24
TH, LANE = 8, 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops.conv_planar import conv_planar_bhcw, pack_weights

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[0])

    for h, w, c in ((1088, 1920, 8), (1088, 1920, 16), (540, 960, 32),
                    (540, 960, 48), (272, 480, 64)):
        wo_pad = _round_up(w, LANE)
        wp = wo_pad + LANE
        hp = _round_up(h, TH) + 2
        k = jnp.asarray(
            rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05,
            jnp.bfloat16)
        wm = pack_weights(k, c)
        bias = jnp.zeros((c, 1), jnp.float32)

        def chain(n):
            @jax.jit
            def f(xp):
                y = xp
                for _ in range(n):
                    y = conv_planar_bhcw(y, wm, bias, kh=3, kw=3, out_h=h)
                    y = y * jnp.asarray(0.05, y.dtype)
                    # re-pad to the kernel's input frame (rows + lane slack)
                    y = jnp.pad(
                        y[:, :h, :, :w],
                        ((0, 0), (1, hp - h - 1), (0, 0), (1, wp - w - 1)),
                    )
                return y
            return f

        xp = jnp.zeros((B, hp, c, wp), jnp.bfloat16)
        ts = {}
        for n in (4, 12):
            fn = chain(n)
            sync(fn(xp))
            iters = 5
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(xp)
            sync(out)
            ts[n] = (time.perf_counter() - t0) / iters
        per = (ts[12] - ts[4]) / 8
        fl = B * h * w * 9 * c * c * 2
        print(f"planar chain {h}x{w} C={c:3d}: {per*1e3:7.3f} ms/conv "
              f"{fl/per/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
