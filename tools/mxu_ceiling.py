"""What does this chip actually sustain? (matmul ceiling + conv formulations)

1. Dense bf16 matmul at MXU-friendly shapes -> practical TFLOP/s ceiling.
2. 3x3 conv three ways at C=128: lax.conv, 9 shifted matmuls (dot_general
   per tap, accumulated), and conv expressed as 1x1 over an im2col-free
   shifted-concat.  If shifted-matmul beats lax.conv, the IFBlock conv
   lowering is leaving real speed on the table.

Run: python -u tools/mxu_ceiling.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def bench(fn, *args, iters=10):
    import numpy as np

    def sync(x):
        return np.asarray(x.ravel()[0])

    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    # 1. dense matmul ceiling
    for m, k, n in ((4096, 4096, 4096), (8192, 8192, 8192),
                    (2 ** 18, 1152, 128)):
        a = jnp.asarray(
            rng.standard_normal((m, k), dtype=np.float32), jnp.bfloat16)
        b = jnp.asarray(
            rng.standard_normal((k, n), dtype=np.float32), jnp.bfloat16)
        mm = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dt = bench(mm, a, b, iters=5)
        fl = 2 * m * k * n
        print(f"matmul {m}x{k}x{n}: {dt*1e3:8.3f} ms  "
              f"{fl/dt/1e12:6.1f} TF/s", flush=True)

    # 2. conv formulations at C=128, 544x960, B=4
    B, H, W, C = 4, 544, 960, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32), jnp.bfloat16)
    k9 = jnp.asarray(rng.standard_normal((3, 3, C, C), dtype=np.float32) * 0.05, jnp.bfloat16)
    fl = B * H * W * 9 * C * C * 2

    conv = jax.jit(lambda x, k: lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype))
    dt = bench(conv, x, k9)
    print(f"lax.conv        : {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s",
          flush=True)

    @jax.jit
    def shifted(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros(x.shape[:3] + (k.shape[-1],), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                win = lax.dynamic_slice(
                    xp, (0, ky, kx, 0), x.shape)
                acc = acc + jnp.dot(
                    win.reshape(-1, C), k[ky, kx],
                    preferred_element_type=jnp.float32,
                ).reshape(acc.shape)
        return acc.astype(x.dtype)

    dt = bench(shifted, x, k9)
    print(f"9 shifted matmul: {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s",
          flush=True)

    # 3. 1x3 followed by 3x1? (separable structure is NOT exact for general
    # 3x3 — skip; instead: conv as single GEMM over width-3 patches only)
    @jax.jit
    def conv_kw(x, k):
        # contract kw and C in one GEMM: patches (.., 3C) built by concat
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        rows = []
        for ky in range(3):
            rows.append(lax.dynamic_slice(xp, (0, ky, 0, 0), x.shape))
        xcat = jnp.concatenate(rows, axis=-1)  # (B,H,W,3C) ky-major
        kk = k.transpose(0, 2, 1, 3).reshape(3 * C, 3, C)  # (ky*C, kx, C)
        kk = kk.transpose(1, 0, 2)[None]  # (1, kx, ky*C, C)
        return lax.conv_general_dilated(
            xcat, kk,
            (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    dt = bench(conv_kw, x, k9)
    print(f"ky-concat 1x3   : {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
