"""Does a Pallas call consuming an XLA conv's narrow-NHWC output force a
layout copy?

The render-PS fusion idea feeds the block-2 deconv output (B, 544, 960, 24)
straight into the render kernel (in-kernel PixelShuffle recomposition).
Pallas inputs must be standard-layout; if XLA's chosen conv output layout
differs, layout assignment inserts a relayout copy as expensive as the
pixel_shuffle transpose the fusion wants to delete.  This probe compiles
  conv(3x3, 64 -> 24ch NHWC) -> pallas(sum over a block)
and prints every copy in the optimized HLO plus the timed cost.

Run: python -u tools/pallas_layout_probe.py [B]
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    H2, W2, C = 544, 960, 24

    def kernel(x_ref, o_ref):
        # consume a (1, 4, W2, C) NHWC block; write an (8, 1024) row tile
        blk = x_ref[0]  # (4, W2, C)
        v = blk.astype(jnp.float32).sum(axis=-1)  # (4, W2)
        v2 = jnp.concatenate([v, v], axis=0)  # (8, W2)
        o_ref[0] = jnp.pad(v2, ((0, 0), (0, 1024 - W2)))

    def fn(x, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out = pl.pallas_call(
            kernel,
            grid=(B, H2 // 4),
            in_specs=[pl.BlockSpec((1, 4, W2, C), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 1024), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H2 // 4 * 8, 1024),
                                           jnp.float32),
        )(y)
        return out

    x = jnp.zeros((B, H2, W2, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 64, C), jnp.bfloat16)
    lowered = jax.jit(fn).lower(x, w)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_copy = 0
    for ln in txt.splitlines():
        m = re.match(r"\s*%?(copy[.\w]*) = (\S+)", ln)
        if m and "fusion" not in ln.split("=")[0]:
            n_copy += 1
            print("COPY:", ln.strip()[:220])
    print(f"total standalone copies: {n_copy}")

    xr = jax.device_put(x)
    wr = jax.device_put(w)
    f = jax.jit(fn)
    r = f(xr, wr)
    np.asarray(r[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(xr, wr)
    np.asarray(r[0, 0, 0])
    print(f"conv+pallas: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
