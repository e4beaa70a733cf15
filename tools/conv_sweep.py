"""MXU efficiency of 3x3 convs vs channel count / spatial size (real chip).

Answers: is padding the narrow-channel IFBlock convs (32/48/64/96) up to
the 128-lane tile worth it? If time is flat in C until 128, yes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print("device:", dev.platform)

    def sync(x):
        return np.asarray(x.ravel()[0])

    @jax.jit
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    rng = np.random.default_rng(0)
    for h, w in ((136, 240), (272, 480), (544, 960)):
        for c in (32, 48, 64, 96, 128, 192, 256):
            x = jnp.asarray(rng.normal(size=(4, h, w, c)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
            sync(conv(x, k))
            iters = 10
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = conv(x, k)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            fl = 4 * h * w * 9 * c * c * 2
            print(
                f"{h}x{w} C={c:4d}: {dt*1e3:7.3f} ms  "
                f"{fl/dt/1e12:6.1f} TF/s ({fl/dt/1.97e14*100:4.1f}% peak)"
            )


if __name__ == "__main__":
    main()
