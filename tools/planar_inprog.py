"""Why does the planar conv lose IN-PROGRAM while winning isolated chains?

Times the v4.6 encoder conv shapes (convrelu_6: 3x3 s2 12->32 @1088x1920,
convrelu_7: 3x3 s2 32->64 @544x960, B=24 bf16) three ways:

  A. XLA NHWC conv (from an NHWC input)              — production baseline
  B. conv_planar from BCHW (what RegionExecutor does) — includes the
     planar_s2d phase relayout + BCHW->BHCW transpose + out transpose
  C. conv_planar_bhcw from a PRE-FORMATTED BHCW phase input — kernel-only
     (what the round-2 'chained' numbers measured)

Run: python -u tools/planar_inprog.py [B]
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
    from rife_tpu.ops import jax_ops as J

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters

    for (cin, cout, h, w, label) in [
        (12, 32, 1088, 1920, "convrelu_6"),
        (32, 64, 544, 960, "convrelu_7"),
    ]:
        x_nchw = jnp.asarray(
            rng.standard_normal((B, cin, h, w)), jnp.bfloat16
        )
        x_nhwc = x_nchw.transpose(0, 2, 3, 1)
        whwio = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.bfloat16
        )
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)

        fa = jax.jit(lambda x: J.apply_activation(
            J.conv2d(x, whwio, bias, stride=2, pad=1), 2, (0.2,)))
        ta = timeit(fa, x_nhwc)

        fb = jax.jit(lambda x: CP.conv_planar(
            x, whwio, bias, stride=2, pad=1, act=CP.ACT_LEAKY))
        tb = timeit(fb, x_nchw)

        # C: pre-formatted BHCW phase input (the kernel's native diet)
        wm = CP.pack_weights(CP._remap_s2_weights(whwio), cin * 4,
                             jnp.bfloat16)
        oh, ow = h // 2, w // 2
        wo_pad = CP._round_up(ow, CP.LANE)
        wp = wo_pad + CP.LANE
        hp = CP._round_up(oh, CP.TH) + 1  # kh=2
        cin4 = CP._round_up(cin * 4, CP.TH)
        xs = CP.planar_s2d(x_nchw)
        xp = jnp.pad(
            jnp.asarray(xs),
            ((0, 0), (0, cin4 - cin * 4), (1, hp - oh - 1), (1, wp - ow - 1)),
        ).transpose(0, 2, 1, 3)
        xp = jax.device_put(xp, dev)
        bb = bias.reshape(cout, 1)
        fc = jax.jit(lambda x: CP.conv_planar_bhcw(
            x, wm, bb, kh=2, kw=2, out_h=oh, act=CP.ACT_LEAKY))
        tc = timeit(fc, xp)

        # D: just the host-side format change (s2d + pad + transpose)
        fd = jax.jit(lambda x: jnp.pad(
            CP.planar_s2d(x),
            ((0, 0), (0, cin4 - cin * 4), (1, hp - oh - 1), (1, wp - ow - 1)),
        ).transpose(0, 2, 1, 3))
        td = timeit(fd, x_nchw)

        print(f"{label} {cin}->{cout} @{h}x{w} B={B}:")
        print(f"  A xla-nhwc        : {ta*1e3:7.1f} ms")
        print(f"  B planar from BCHW: {tb*1e3:7.1f} ms")
        print(f"  C kernel-only BHCW: {tc*1e3:7.1f} ms")
        print(f"  D format change   : {td*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
