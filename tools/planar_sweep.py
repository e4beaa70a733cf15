"""Planar Pallas conv vs XLA NHWC conv on the zoo's hot shapes (real chip).

In-program marginal protocol (2-vs-6 replicas derived in-fusion).
XLA baselines from tools/conv_chain.py / nchw_exp.py at B=24:
  enc 12->32 s2 @1088x1920: 35.8 ms     square 32 @540x960: 26.2 ms
  body 64->64 s1 @272x480 :  3.2 ms     square 48 @540x960: 13.6 ms

Run: python -u tools/planar_sweep.py [substring]
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

    from rife_tpu.ops.conv_planar import ACT_LEAKY, conv_planar

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
        print(f"{label:44s}: {per*1e3:7.3f} ms", flush=True)

    def mk(shape):
        def f():
            return jnp.asarray(
                rng.standard_normal(shape, dtype=np.float32), jnp.bfloat16)
        return f

    def kw(kh, kw_, ci, co):
        return jnp.asarray(
            rng.standard_normal((kh, kw_, ci, co), dtype=np.float32) * 0.05,
            jnp.float32)

    cases = [
        ("planar enc 12->32 s2 1088x1920", (B, 12, 1088, 1920),
         kw(3, 3, 12, 32), 2),
        ("planar 32->64 s2 544x960", (B, 32, 544, 960),
         kw(3, 3, 32, 64), 2),
        ("planar body 64->64 s1 272x480", (B, 64, 272, 480),
         kw(3, 3, 64, 64), 1),
        ("planar sq 32->32 s1 540x960", (B, 32, 540, 960),
         kw(3, 3, 32, 32), 1),
        ("planar sq 48->48 s1 540x960", (B, 48, 540, 960),
         kw(3, 3, 48, 48), 1),
        ("planar sq 16->16 s1 1088x1920", (B, 16, 1088, 1920),
         kw(3, 3, 16, 16), 1),
    ]
    for label, shape, k, s in cases:
        if s == 2 and shape[2] % 2:
            continue
        bias = jnp.zeros((k.shape[-1],), jnp.float32)
        marginal(
            lambda xi, k=k, s=s, bias=bias: conv_planar(
                xi, k, bias, stride=s, act=ACT_LEAKY),
            mk(shape), label,
        )


if __name__ == "__main__":
    main()
