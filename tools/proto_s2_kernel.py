"""Prototype: stride-2 planar conv consuming H-phase-split BHCW input with
the W deinterleave done IN-KERNEL (lane-strided lax.slice), vs the current
kernel that needs the expensive 4-phase HBM relayout.

Input format (B, hp2, 2*Cin, Wpf): free reshape of a padded BHCW tensor —
rows 2y/2y+1 stacked on channels ([py][c] order), W still interleaved.

Run: python -u tools/proto_s2_kernel.py [B]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANE = 128
TH = 8


def _round_up(v, m):
    return (v + m - 1) // m * m


def _kernel(x_hbm, w_ref, b_ref, o_ref, band, sem, *,
            c2: int, cout: int, wo_pad: int, wpf: int, alpha: float):
    """H phases ride channels (free reshape); W stays INTERLEAVED through
    the GEMM: every tap kx, sliced at ds(kx), lands output x' at rhs
    column 2x'+1, so one odd-column extraction per (small) output row
    replaces any deinterleave of the (wider) input."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[i, pl.ds(j * TH, TH + 1)], band, sem)
    cp.start()
    cp.wait()

    w2 = 2 * wo_pad
    jj = lax.broadcasted_iota(jnp.int32, (cout, LANE), 1)
    idx_a = jnp.minimum(2 * jj + 1, LANE - 1)
    idx_b = jnp.maximum(2 * jj + 1 - LANE, 0)
    sel_a = (2 * jj + 1) < LANE

    for r in range(TH):
        acc = None
        for t in range(6):  # (a, kx) taps: 2 H-phases x 3 W-taps
            a, kx = divmod(t, 3)
            d = lax.dot_general(
                w_ref[t], band[r + a, :, pl.ds(kx, w2)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        acc = acc + b_ref[:]
        acc = jnp.where(acc >= 0, acc, acc * alpha)
        # odd columns of acc (cout, 2*wo_pad) -> (cout, wo_pad)
        for ot in range(wo_pad // LANE):
            src_a = acc[:, 2 * ot * LANE : (2 * ot + 1) * LANE]
            src_b = acc[:, (2 * ot + 1) * LANE : (2 * ot + 2) * LANE]
            ga = jnp.take_along_axis(src_a, idx_a, axis=1)
            gb = jnp.take_along_axis(src_b, idx_b, axis=1)
            o_ref[0, 0, r, :, pl.ds(ot * LANE, LANE)] = jnp.where(
                sel_a, ga, gb
            ).astype(o_ref.dtype)


def conv_s2_bhcw(xs, wmat, bias, out_h, alpha=0.2):
    """xs (B, hp2, C2p, Wpf) H-split padded input (W interleaved); wmat
    (6, Cout, C2p) (a, kx) taps over [py][c] channels; returns
    (B, n_h*TH, Cout, wo_pad)."""
    b, hp2, c2, wpf = xs.shape
    cout = wmat.shape[1]
    wo_pad = (wpf - LANE) // 2
    n_h = _round_up(out_h, TH) // TH
    out = pl.pallas_call(
        functools.partial(_kernel, c2=c2, cout=cout, wo_pad=wo_pad,
                          wpf=wpf, alpha=alpha),
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, cout, c2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, cout, wo_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h, TH, cout, wo_pad), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 1, c2, wpf), xs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xs, wmat, bias)
    return out.reshape(b, n_h * TH, cout, wo_pad)


def _pack_s2_weights(w_hwio, c2p):
    """3x3 s2 p1 -> (6, Cout, C2p): taps (a, kx), channels [py][c]."""
    kh, kw, ci, co = w_hwio.shape
    w_np = np.asarray(w_hwio, np.float32)
    wk = np.zeros((6, co, c2p), np.float32)
    for ky in range(3):
        py = (ky - 1) % 2
        a = (ky - 1 - py) // 2 + 1
        for kx in range(3):
            wk[a * 3 + kx, :, py * ci : (py + 1) * ci] += w_np[ky, kx].T
    return wk


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(0)

    def timeit(fn, *a, iters=10):
        out = fn(*a)
        np.asarray(out[(0,) * out.ndim])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(out[(0,) * out.ndim])
        return (time.perf_counter() - t0) / iters

    for (cin, cout, h, w, label) in [
        (12, 32, 1088, 1920, "convrelu_6"),
        (32, 64, 544, 960, "convrelu_7"),
    ]:
        oh, ow = h // 2, w // 2
        wo_pad = _round_up(ow, LANE)
        wpf = 2 * wo_pad + LANE
        hp2 = _round_up(oh, TH) + 1
        c2p = _round_up(2 * cin, TH)

        # correctness: small numeric input vs XLA NCHW conv
        x_small = rng.standard_normal((2, cin, 64, 128)).astype(np.float32)
        w_hwio = (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(
            np.float32)
        bias = rng.standard_normal(cout).astype(np.float32)
        from rife_tpu.ops.conv_planar import conv_planar_ref, ACT_LEAKY

        ref = conv_planar_ref(jnp.asarray(x_small), jnp.asarray(w_hwio),
                              jnp.asarray(bias), stride=2, pad=1,
                              act=ACT_LEAKY)

        def prep_pad(x_nchw, WPF, HP2, C2P):
            # BHCW, rows/cols at [2, ...): after the free H reshape the
            # first split-row / even-odd col are the phase-plane pad slots
            b, c, hh, ww = x_nchw.shape
            xb = jnp.pad(
                x_nchw.transpose(0, 2, 1, 3),
                ((0, 0), (2, 2 * HP2 - hh - 2), (0, 0), (2, WPF - ww - 2)),
            )
            xb = xb.reshape(b, HP2, 2 * c, WPF)
            if 2 * c < C2P:
                xb = jnp.pad(xb, ((0, 0), (0, 0), (0, C2P - 2 * c), (0, 0)))
            return xb

        wo_s = _round_up(64, LANE)
        wpf_s = 2 * wo_s + LANE
        hp2_s = _round_up(32, TH) + 1
        c2p_s = _round_up(2 * cin, TH)
        xs = prep_pad(jnp.asarray(x_small), wpf_s, hp2_s, c2p_s)
        wk = _pack_s2_weights(w_hwio, c2p_s)
        out = conv_s2_bhcw(xs, jnp.asarray(wk),
                           jnp.asarray(bias.reshape(cout, 1)), 32)
        got = out[:, :32, :, :64].transpose(0, 2, 1, 3)
        err = np.abs(np.asarray(got) - np.asarray(ref)).max()
        print(f"{label}: max err vs XLA = {err:.2e}", flush=True)

        # perf at full shape, bf16
        xb = jnp.ones((B, hp2, c2p, wpf), jnp.bfloat16)
        wkb = jnp.asarray(wk, jnp.bfloat16)
        bb2 = jnp.asarray(bias.reshape(cout, 1))
        f = jax.jit(lambda x: conv_s2_bhcw(x, wkb, bb2, oh))
        dt = timeit(f, xb)
        print(f"{label} {cin}->{cout} B={B}: {dt*1e3:7.1f} ms "
              f"(kernel-only target was ~10/7 ms)", flush=True)


if __name__ == "__main__":
    main()
