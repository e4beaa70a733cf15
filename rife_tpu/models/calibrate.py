"""Calibration of synthetic-weight scales (dev tool).

The mount ships no flownet weights (see /root/reference/.MISSING_LARGE_BLOBS),
so synthetic weights stand in.  Per-layer gain compounds through ~20
unnormalized layers, so an uncalibrated forward either collapses to ~0 or
explodes to unphysical ~1e4 px "flows"; this script binary-searches a single
global multiplier on the flownet's conv/deconv/dense weights so the final
flow std lands at a realistic ~6 px, and the result is baked into
``rife_tpu.graph.weights.SYNTHETIC_FLOWNET_SCALE``.

Calibration runs at 544x960 — near the bench resolution, because gain is
mildly input-smoothness-dependent even in ``mix`` synthesis mode (inputs are
real frames, resized).  The forward is jitted ONCE per model with the
prepared weights as a traced argument, so the 12-step scale search costs 12
cheap re-executions, not 12 compiles; it runs on whatever backend is active
(TPU preferred — CPU at this resolution takes hours).

Run:  PYTHONPATH=. python -u -m rife_tpu.models.calibrate
"""

from __future__ import annotations

import numpy as np

TARGET_FLOW_STD = 6.0
TEST_HW = (544, 960)


def _frames(h: int, w: int):
    from PIL import Image

    def load(path):
        with Image.open(path) as im:
            return (
                np.asarray(
                    im.convert("RGB").resize((w, h), Image.BILINEAR),
                    np.float32,
                )
                / 255.0
            )

    return (
        load("/root/reference/images/0.png")[None],
        load("/root/reference/images/1.png")[None],
    )


def _make_eval(model_name: str):
    """Returns (eval_fn: scale -> flow std).  One jit per model."""
    import jax
    import jax.numpy as jnp

    from ..graph.executor import Executor
    from ..graph.weights import synthesize_weights
    from ..models.zoo import load_model
    from ..ops import jax_ops

    m = load_model(model_name)
    net = m.flownet
    base = synthesize_weights(net.graph, f"{model_name}/flownet")
    # neutralize the currently-baked global scale so eval_scale(s) measures
    # the ABSOLUTE multiplier we would bake, not a delta on top of it
    from ..graph.weights import _weight_scale_for

    baked = _weight_scale_for(f"{model_name}/flownet")
    ex = Executor(net.graph, jax_ops.OP_TABLE, net.weights, ctx={})
    h, w = TEST_HW
    i0_np, i1_np = _frames(h, w)
    i0 = jnp.asarray(i0_np)
    i1 = jnp.asarray(i1_np)
    tap = "flow3" if m.family == "v4" else "flow"

    if m.family == "v4":
        def fwd(W, a, b):
            ins = {"in0": a, "in1": b, "in2": jnp.full((1, h, w, 1), 0.5)}
            return ex.run(ins, [tap], {"w": W})[0]
    else:
        def fwd(W, a, b):
            return ex.run({"input0": a, "input1": b}, [tap], {"w": W})[0]

    jfwd = jax.jit(fwd)

    def eval_scale(scale: float) -> float:
        import copy

        weights = {k: copy.copy(v) for k, v in base.items()}
        for lw in weights.values():
            if lw.weight is not None:
                lw.weight = lw.weight * (scale / baked)
        prep = jax_ops.prepare_weights(net.graph, weights)
        flow = np.asarray(jfwd(prep, i0, i1), np.float32)[..., :4]
        return float(flow.std())

    return eval_scale


def calibrate(model_name: str) -> float:
    eval_scale = _make_eval(model_name)
    lo, hi = 0.05, 1.5
    for _ in range(12):
        mid = (lo * hi) ** 0.5
        std = eval_scale(mid)
        if std > TARGET_FLOW_STD:
            hi = mid
        else:
            lo = mid
    final = round((lo * hi) ** 0.5, 4)
    return final, eval_scale(final)


TARGET_OUT_STD = 60.0  # image-like u8 output contrast


def calibrate_fusionnet(model_name: str):
    """Binary-search the fusionnet weight multiplier so the end-to-end u8
    output std is image-like (the uncalibrated U-Net either collapses —
    clip(residual-1) = black frame — or saturates).  Runs the full session
    step jitted once, with the weight pytree as a traced argument."""
    import jax

    from ..engine.session import RIFE, pad_to
    from ..models.zoo import load_model

    if load_model(model_name).family == "v4":
        return None, None
    h, w = TEST_HW
    session = RIFE(model_name, dtype="float32")
    step = jax.jit(session.build_step_fn(pad_to(h), pad_to(w)))
    i0, i1 = _frames(h, w)
    in0 = (i0 * 255).astype(np.uint8)
    in1 = (i1 * 255).astype(np.uint8)
    ts = np.full((1,), 0.5, np.float32)

    def scale_fusion(W, s):
        fus = {
            layer: {
                k: (v * s if k in ("hwio", "dense") and v is not None else v)
                for k, v in entry.items()
            }
            for layer, entry in W["fusionnet"].items()
        }
        return {**W, "fusionnet": fus}

    def eval_scale(s: float) -> float:
        out = np.asarray(step(scale_fusion(session.weights, s), in0, in1, ts))
        return float(out.std())

    # the response is NON-monotone: tiny scale collapses to the black
    # clip(residual-1) frame (std~0), huge scale saturates to a constant
    # frame (std~0 again), with an image-like sweet region in between —
    # sweep a log grid and refine around the best point
    def sweep(points):
        best_s, best_err, best_std = None, float("inf"), 0.0
        for s in points:
            std = eval_scale(float(s))
            err = abs(std - TARGET_OUT_STD)
            if err < best_err:
                best_s, best_err, best_std = float(s), err, std
        return best_s, best_std

    coarse, _ = sweep(np.geomspace(0.05, 32.0, 14))
    fine, std = sweep(np.geomspace(coarse / 1.6, coarse * 1.6, 7))
    # fold in whatever scale is currently baked (session weights already
    # include it, so the searched value is a multiplier on top of it)
    from ..graph.weights import SYNTHETIC_FUSIONNET_SCALE

    baked = SYNTHETIC_FUSIONNET_SCALE.get(model_name, 1.0)
    return round(baked * fine, 4), std


def main():
    import sys

    from ..models.zoo import MODEL_NAMES

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flownet"):
        results = {}
        for name in MODEL_NAMES:
            scale, std = calibrate(name)
            results[name] = scale
            print(f"{name}: scale={scale} -> flow std {std:.1f}px", flush=True)
        print("\nSYNTHETIC_FLOWNET_SCALE =", results)
    if which in ("all", "fusionnet"):
        results = {}
        for name in MODEL_NAMES:
            scale, std = calibrate_fusionnet(name)
            if scale is None:
                continue
            results[name] = scale
            print(f"{name}: fusion scale={scale} -> out std {std:.1f}",
                  flush=True)
        print("\nSYNTHETIC_FUSIONNET_SCALE =", results)


if __name__ == "__main__":
    main()
