"""TRUE in-program conv cost: N dependent convs inside one jit.

Cross-call microbenchmarks on this chip are floored by a multi-ms dispatch
overhead (tunnel RPC); the fused step is one XLA program, so what matters
is the in-program marginal cost of a conv.  Chain K dependent 3x3 convs
(same C) in one jit; (time(K2) - time(K1)) / (K2 - K1) = marginal ms/conv.

Run: python -u tools/conv_chain.py [B] — default B=24, block3/block2 sizes.
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

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    def sync(x):
        return np.asarray(x.ravel()[0])

    def chain(n, c):
        def f(x, k):
            y = x
            for _ in range(n):
                y = lax.conv_general_dilated(
                    y, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                # keep magnitudes sane so bf16 doesn't overflow down-chain
                y = y * jnp.asarray(0.05, x.dtype)
            return y

        return jax.jit(f)

    for h, w in ((540, 960), (270, 480)):
        for c in (32, 48, 64, 96, 128):
            x = jnp.asarray(
                rng.standard_normal((B, h, w, c), dtype=np.float32),
                jnp.bfloat16)
            k = jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.2,
                jnp.bfloat16)
            ts = {}
            for n in (4, 12):
                fn = chain(n, c)
                sync(fn(x, k))
                iters = 6
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn(x, k)
                sync(out)
                ts[n] = (time.perf_counter() - t0) / iters
            per = (ts[12] - ts[4]) / 8
            fl = B * h * w * 9 * c * c * 2
            print(
                f"B={B} {h}x{w} C={c:4d}: {per*1e3:7.3f} ms/conv  "
                f"{fl/per/1e12:6.1f} TF/s  "
                f"(chain4 {ts[4]*1e3:.1f} ms, chain12 {ts[12]*1e3:.1f} ms)",
                flush=True,
            )
        print()


if __name__ == "__main__":
    main()
