"""Microbenchmark Pallas/Mosaic primitive costs on the real chip.

Times a grid of identical kernels whose inner loop repeats ONE primitive on
(8,128) vregs; the per-op cost is the slope vs repetition count.  Grounds
the warp-kernel redesign: is take_along_axis (lane gather) actually the
delta kernel's bottleneck, and are roll / dynamic-offset slices cheap?

Run:  python -u tools/prim_sweep.py
"""

from __future__ import annotations

import functools
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

    GRID = 2048
    REPS = 32

    def make(op_name):
        def kernel(x_ref, idx_ref, o_ref, buf):
            buf[...] = x_ref[0]
            idx = idx_ref[0]
            acc = jnp.zeros((8, 128), jnp.int32)

            def body(k, acc):
                if op_name == "take_along":
                    g = jnp.take_along_axis(buf[:8, :128], (idx + k) & 127, axis=1)
                elif op_name == "roll_lane":
                    g = pltpu.roll(buf[:8, :128], shift=k, axis=1)
                elif op_name == "roll_sublane":
                    g = pltpu.roll(buf[:16, :128], shift=k, axis=0)[:8]
                elif op_name == "dyn_slice_sublane":
                    g = buf[pl.ds(k & 7, 8), :128]
                elif op_name == "dyn_slice_lane":
                    g = buf[:8, pl.ds(k & 127, 128)]
                elif op_name == "dyn_slice_2d":
                    g = buf[pl.ds(k & 7, 8), pl.ds(k & 127, 128)]
                elif op_name == "cmp_sel":
                    g = jnp.where(idx == k, buf[:8, :128], acc)
                else:
                    raise ValueError(op_name)
                return acc + g

            acc = lax.fori_loop(0, REPS, body, acc)
            o_ref[0] = acc

        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (GRID, 16, 256)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 128, (GRID, 8, 128)), jnp.int32)

    def sync(v):
        return np.asarray(v.ravel()[0])

    base = None
    names = sys.argv[1:] or ["cmp_sel", "take_along", "roll_lane", "roll_sublane",
                             "dyn_slice_sublane", "dyn_slice_lane", "dyn_slice_2d"]
    for name in names:
        f = pl.pallas_call(
            make(name),
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, 16, 256), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((16, 256), jnp.int32)],
        )
        jf = jax.jit(lambda a, b, f=f: f(a[:, 0:1] * 0 + a[:, :16], b))

        def run(a, b, f=f):
            return f(a, b)

        jr = jax.jit(run)
        sync(jr(x, idx))
        t0 = time.perf_counter()
        for _ in range(10):
            out = jr(x, idx)
        sync(out)
        dt = (time.perf_counter() - t0) / 10
        per_op = dt / GRID / REPS
        print(f"{name:18s}: {dt*1e3:7.2f} ms total  {per_op*1e9:8.1f} ns/op "
              f"({per_op*0.94e9:6.1f} cyc @0.94GHz)")


if __name__ == "__main__":
    main()
