"""Validate + time the delta-roll u8 warp kernel vs the band kernel on TPU.

Correctness: bit-exact equality against the band kernel (both are
shader-exact by construction) on random smooth and adversarial flows,
including border-clamping cases.  Timing: 1080p 3ch at several flow
regimes.  Run: python -u tools/delta_kernel_test.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(x):
    return np.asarray(x.ravel()[0])


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops.warp_pallas import warp_pallas

    rng = np.random.default_rng(0)

    # -- correctness on small shapes, several flow regimes -----------------
    for (h, w), kind, mag in [
        ((64, 256), "smooth", 3.0),
        ((64, 256), "smooth", 40.0),
        ((64, 256), "iid", 25.0),
        ((64, 256), "iid", 300.0),   # everything clamps
        ((40, 200), "smooth", 5.0),  # unaligned h/w
    ]:
        img = (rng.integers(0, 256, (2, h, w, 3)) / 255.0).astype(np.float32)
        if kind == "smooth":
            base = rng.normal(0, mag, (2, 1, 1, 2))
            ramp = np.linspace(-mag / 4, mag / 4, w)[None, None, :, None]
            flow = (base + ramp).astype(np.float32) * np.ones((2, h, w, 2), np.float32)
        else:
            flow = rng.normal(0, mag, (2, h, w, 2)).astype(np.float32)
        ji, jf = jnp.asarray(img), jnp.asarray(flow)
        band = np.asarray(warp_pallas(ji, jf, u8_origin=True, u8_variant="band"))
        delta = np.asarray(warp_pallas(ji, jf, u8_origin=True, u8_variant="delta"))
        md = float(np.abs(band.astype(np.float32) - delta.astype(np.float32)).max())
        ok = md < 1e-5  # accumulation-order float rounding only
        print(f"{h}x{w} {kind:6s} mag={mag:5.0f}: ok={ok} maxdiff={md:.2e}",
              flush=True)
        if not ok:
            sys.exit(1)

    # -- timing at 1080p -----------------------------------------------------
    h, w = 1080, 1920
    img = (rng.integers(0, 256, (1, h, w, 3)) / 255.0).astype(np.float32)
    ji = jnp.asarray(img)
    for kind, mag in [("zero", 0.0), ("smooth", 6.0), ("smooth", 20.0),
                      ("iid", 6.0), ("iid", 15.0)]:
        if kind == "zero":
            flow = np.zeros((1, h, w, 2), np.float32)
        elif kind == "smooth":
            gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
            flow = np.stack(
                [mag * np.sin(gy / 200) * np.cos(gx / 300),
                 mag * np.cos(gy / 250)], -1
            )[None].astype(np.float32)
        else:
            flow = rng.normal(0, mag, (1, h, w, 2)).astype(np.float32)
        jf = jnp.asarray(flow)
        tb = timeit(lambda i, f: warp_pallas(i, f, u8_origin=True, u8_variant="band"), ji, jf)
        td = timeit(lambda i, f: warp_pallas(i, f, u8_origin=True, u8_variant="delta"), ji, jf)
        print(f"1080p {kind:6s} mag={mag:4.0f}: band {tb*1e3:7.2f} ms  "
              f"delta {td*1e3:7.2f} ms  ({tb/td:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
