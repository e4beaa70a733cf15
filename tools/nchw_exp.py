"""NCHW vs NHWC for the narrow-channel hot spots (true in-program times).

The compiled v4.6 step stores every narrow-C bf16 tensor C-minor with C
lane-padded to 128 (12ch concat: 10.7x HBM bloat; 6-8ch flow resizes:
16-21x; even the 12ch INPUT ARRAY is 12.8 GB on device at B=24) — the
conv consumers anchor the layout.  If convs fed NCHW (W on lanes, ~0
padding at W=1920/960) are fast, the whole narrow-channel glue (warp
outputs, concat, flow resizes, blend) can ride W-lane layouts.

Each experiment allocates only its own arrays (narrow-C NHWC device
arrays are themselves lane-padded monsters).  Run one by name, or all:

  python -u tools/nchw_exp.py [substring]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B = 24


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[0])

    def marginal(op, mkx, label, n_lo=2, n_hi=6):
        if only is not None and only not in label:
            return
        x = mkx()
        ts = {}
        for n in (n_lo, n_hi):
            @jax.jit
            def f(x, n=n):
                acc = jnp.zeros((), jnp.float32)
                for i in range(n):
                    xi = x + jnp.asarray(i * 1e-3, x.dtype)
                    acc = acc + op(xi).astype(jnp.float32).ravel()[0]
                return acc

            sync(f(x))
            iters = 5
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f(x)
            sync(out)
            ts[n] = (time.perf_counter() - t0) / iters
        per = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)
        print(f"{label:46s}: {per*1e3:7.3f} ms", flush=True)

    def kmat(kh, kw, ci, co):
        return jnp.asarray(
            rng.standard_normal((kh, kw, ci, co), dtype=np.float32) * 0.05,
            jnp.bfloat16)

    def mk(shape):
        def f():
            return jnp.asarray(
                rng.standard_normal(shape, dtype=np.float32), jnp.bfloat16)
        return f

    def conv(x, k, dn, s=1, p=1):
        return lax.conv_general_dilated(
            x, k, (s, s), [(p, p), (p, p)],
            dimension_numbers=(dn, "HWIO", dn),
            preferred_element_type=jnp.float32).astype(x.dtype)

    # --- 1. encoder conv 12->32 s2 -----------------------------------------
    k = kmat(3, 3, 12, 32)
    marginal(lambda xi: conv(xi, k, "NHWC", s=2),
             mk((B, 1088, 1920, 12)), "enc 12->32 s2 NHWC")
    marginal(lambda xi: conv(xi, k, "NCHW", s=2),
             mk((B, 12, 1088, 1920)), "enc 12->32 s2 NCHW")

    # --- 2. body conv 64->64 control ---------------------------------------
    k2 = kmat(3, 3, 64, 64)
    marginal(lambda xi: conv(xi, k2, "NHWC"),
             mk((B, 272, 480, 64)), "body 64->64 NHWC", 4, 12)
    marginal(lambda xi: conv(xi, k2, "NCHW"),
             mk((B, 64, 272, 480)), "body 64->64 NCHW", 4, 12)

    # --- 3. x2 bilinear upsample of 6ch ------------------------------------
    from rife_tpu.ops.jax_ops import resize2d

    marginal(lambda xi: resize2d(xi, 1088, 1920),
             mk((B, 544, 960, 6)), "up2 6ch NHWC resize2d")

    def up2_axis(x, axis):
        n = x.shape[axis]
        lo = jnp.concatenate(
            [lax.slice_in_dim(x, 0, 1, axis=axis),
             lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
        hi = jnp.concatenate(
            [lax.slice_in_dim(x, 1, n, axis=axis),
             lax.slice_in_dim(x, n - 1, n, axis=axis)], axis)
        q = jnp.asarray(0.25, x.dtype)
        h = jnp.asarray(0.75, x.dtype)
        y = jnp.stack([h * x + q * lo, h * x + q * hi], axis=axis + 1)
        shp = list(x.shape)
        shp[axis] *= 2
        return y.reshape(shp)

    marginal(lambda xi: up2_axis(up2_axis(xi, 2), 3),
             mk((B, 6, 544, 960)), "up2 6ch NCHW interleave")

    # --- 4. deconv 64->24 --------------------------------------------------
    kd = kmat(4, 4, 64, 24)

    def deconv(x, k, dn):
        return lax.conv_transpose(
            x, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=(dn, "HWIO", dn),
            preferred_element_type=jnp.float32).astype(x.dtype)

    marginal(lambda xi: deconv(xi, kd, "NHWC"),
             mk((B, 272, 480, 64)), "deconv 64->24 NHWC", 4, 12)
    marginal(lambda xi: deconv(xi, kd, "NCHW"),
             mk((B, 64, 272, 480)), "deconv 64->24 NCHW", 4, 12)

    # --- 5. residual body chain (serial, C=64) ------------------------------
    def chain(dn):
        def f(xi):
            y = xi
            for _ in range(4):
                y = conv(y, k2, dn) * jnp.asarray(0.05, xi.dtype)
            return y
        return f

    marginal(chain("NHWC"), mk((B, 272, 480, 64)), "4x body chain NHWC", 1, 3)
    marginal(chain("NCHW"), mk((B, 64, 272, 480)), "4x body chain NCHW", 1, 3)


if __name__ == "__main__":
    main()
