"""Which narrow-channel conv shapes are pathological, and does zero-padding
the channel dims to 64 fix them? (true in-program marginal times)

Marginal cost protocol: run N independent copies of the op inside ONE jit
(inputs derived in-fusion from a single buffer, outputs reduced to a
scalar), N=4 vs N=12; marginal = (t12 - t4) / 8.  This removes both the
cross-call dispatch floor and the one-off input staging.

Shapes measured (all B=24, bf16, f32 accumulation):
  a. square 3x3 s1 C->C at 540x960 for C in (24, 32) — native vs padded-64
  b. 32->64 and 64->32 at 540x960 — which side triggers the pathology
  c. block3 encoder convrelu_6: (1088,1920,12) -> s2 -> (544,960,32):
     native vs Cout padded to 64
  d. deconv_63: conv_transpose 4x4 s2 (272,480,64) -> (544,960,24):
     native vs Cout padded to 64

Run: python -u tools/narrow_conv_exp.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

B = 24


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(x.ravel()[0])

    def marginal(make_op, x, label, fl):
        """make_op() -> fn(x_i) with x_i derived from x; N-replica timing."""
        def build(n):
            op = make_op()

            @jax.jit
            def f(x):
                acc = jnp.zeros((), jnp.float32)
                for i in range(n):
                    xi = x + jnp.asarray(i * 1e-3, x.dtype)
                    acc = acc + op(xi).astype(jnp.float32).ravel()[0]
                return acc

            return f

        ts = {}
        for n in (4, 12):
            fn = build(n)
            sync(fn(x))
            iters = 5
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(x)
            sync(out)
            ts[n] = (time.perf_counter() - t0) / iters
        per = (ts[12] - ts[4]) / 8
        print(f"{label:44s}: {per*1e3:7.3f} ms  {fl/per/1e12:6.1f} TF/s",
              flush=True)
        return per

    def conv(x, k, stride=1, pad=1):
        return lax.conv_general_dilated(
            x, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def kmat(kh, kw, ci, co):
        return jnp.asarray(
            rng.standard_normal((kh, kw, ci, co), dtype=np.float32) * 0.05,
            jnp.bfloat16)

    # --- a. square narrow convs, native vs padded ---------------------------
    for c in (24, 32, 48):
        x = jnp.asarray(
            rng.standard_normal((B, 540, 960, c), dtype=np.float32),
            jnp.bfloat16)
        fl = B * 540 * 960 * 9 * c * c * 2
        k = kmat(3, 3, c, c)
        marginal(lambda: (lambda xi: conv(xi, k)), x,
                 f"square {c}->{c} 540x960 native", fl)

        kp = jnp.zeros((3, 3, 64, 64), jnp.bfloat16).at[:, :, :c, :c].set(k)

        def padded(xi, kp=kp, c=c):
            xi = jnp.pad(xi, ((0, 0),) * 3 + ((0, 64 - c),))
            return conv(xi, kp)[..., :c]

        marginal(lambda: padded, x,
                 f"square {c}->{c} 540x960 pad64", fl)

    # --- b. which side is pathological --------------------------------------
    x32 = jnp.asarray(
        rng.standard_normal((B, 540, 960, 32), dtype=np.float32),
        jnp.bfloat16)
    x64 = jnp.asarray(
        rng.standard_normal((B, 540, 960, 64), dtype=np.float32),
        jnp.bfloat16)
    k3264 = kmat(3, 3, 32, 64)
    k6432 = kmat(3, 3, 64, 32)
    marginal(lambda: (lambda xi: conv(xi, k3264)), x32,
             "32->64 540x960 (narrow Cin)",
             B * 540 * 960 * 9 * 32 * 64 * 2)
    marginal(lambda: (lambda xi: conv(xi, k6432)), x64,
             "64->32 540x960 (narrow Cout)",
             B * 540 * 960 * 9 * 64 * 32 * 2)

    # --- c. block3 encoder convrelu_6 ---------------------------------------
    xe = jnp.asarray(
        rng.standard_normal((B, 1088, 1920, 12), dtype=np.float32),
        jnp.bfloat16)
    ke = kmat(3, 3, 12, 32)
    fle = B * 544 * 960 * 9 * 12 * 32 * 2
    marginal(lambda: (lambda xi: conv(xi, ke, stride=2)), xe,
             "enc 12->32 s2 1088x1920 native", fle)
    kep = jnp.zeros((3, 3, 12, 64), jnp.bfloat16).at[:, :, :, :32].set(ke)
    marginal(lambda: (lambda xi: conv(xi, kep, stride=2)[..., :32]), xe,
             "enc 12->32 s2 1088x1920 Cout pad64", fle)

    # --- d. deconv_63 -------------------------------------------------------
    xd = jnp.asarray(
        rng.standard_normal((B, 272, 480, 64), dtype=np.float32),
        jnp.bfloat16)
    kd = kmat(4, 4, 64, 24)  # HWIO for transpose via conv_transpose

    def deconv(xi, k):
        return lax.conv_transpose(
            xi, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(xi.dtype)

    fld = B * 272 * 480 * 16 * 64 * 24 * 2
    marginal(lambda: (lambda xi: deconv(xi, kd)), xd,
             "deconv 64->24 4x4s2 272x480 native", fld)
    kdp = jnp.zeros((4, 4, 64, 64), jnp.bfloat16).at[:, :, :, :24].set(kd)
    marginal(lambda: (lambda xi: deconv(xi, kdp)[..., :24]), xd,
             "deconv 64->24 4x4s2 272x480 Cout pad64", fld)


if __name__ == "__main__":
    main()
