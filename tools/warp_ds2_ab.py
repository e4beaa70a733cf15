"""Standalone A/B: fused WarpDs2 kernel vs unfused warp+resize at the
headline shape (B=24 1080p bf16, smooth synthetic flow)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from rife_tpu.ops import jax_ops
from rife_tpu.ops.warp_pallas import warp_pallas, warp_ds2_pallas

B, H, W = 24, 1088, 1920
rng = np.random.default_rng(0)
u8 = rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8)
img = jnp.asarray(u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
yy, xx = np.mgrid[0:H, 0:W]
fx = (6.0 * np.sin(yy / 97.0) + 4.0 * np.cos(xx / 131.0)).astype(np.float32)
fy = (5.0 * np.cos(yy / 113.0) - 3.0 * np.sin(xx / 89.0)).astype(np.float32)
flow = jnp.asarray(np.broadcast_to(np.stack([fx, fy], -1), (B, H, W, 2)).copy())

@jax.jit
def unfused(img, flow):
    y = warp_pallas(img, flow, u8_origin=True, u8_variant="slab")
    return jax_ops.resize2d(y, H // 2, W // 2)

@jax.jit
def fused(img, flow):
    return warp_ds2_pallas(img, flow)

for name, fn in [("unfused", unfused), ("fused_ds2", fused)]:
    out = fn(img, flow)
    np.asarray(out[0, 0, 0, 0])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(img, flow)
    np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms  out={out.shape} {out.dtype}")

ref = np.asarray(unfused(img, flow), np.float32)
got = np.asarray(fused(img, flow), np.float32)
print("max abs diff:", np.abs(ref - got).max())
