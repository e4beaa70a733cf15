"""Calibration of synthetic-weight scales (dev tool).

The mount ships no flownet weights (see /root/reference/.MISSING_LARGE_BLOBS),
so synthetic weights stand in.  Raw He-init explodes through the residual
trunks — the v4.6 pyramid amplifies flow std ~15x per level, ending at
~3e4 px, which is unphysical and makes every flow-adaptive kernel walk the
whole frame.  This script binary-searches a single global multiplier on the
flownet's conv/deconv/dense weights so the final flow std lands at a
realistic ~10 px, and the result is baked into
``rife_tpu.graph.weights.SYNTHETIC_FLOWNET_SCALE``.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=. python -m rife_tpu.models.calibrate
"""

from __future__ import annotations

import numpy as np

TARGET_FLOW_STD = 6.0
TEST_HW = (128, 224)


def _final_flow_std(model_name: str, scale: float) -> float:
    import jax.numpy as jnp

    from ..graph.executor import Executor
    from ..graph.weights import synthesize_weights
    from ..models.zoo import load_model
    from ..ops import jax_ops

    m = load_model(model_name)
    net = m.flownet
    weights = synthesize_weights(net.graph, f"{model_name}/flownet")
    for lw in weights.values():
        if lw.weight is not None:
            lw.weight = lw.weight * scale
    prep = jax_ops.prepare_weights(net.graph, weights)
    ex = Executor(net.graph, jax_ops.OP_TABLE, weights, ctx={"w": prep})
    h, w = TEST_HW
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    i1 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    if m.family == "v4":
        ins = {"in0": i0, "in1": i1, "in2": jnp.full((1, h, w, 1), 0.5)}
        flow = np.asarray(ex.run(ins, ["flow3"])[0])[..., :4]
    else:
        ins = {"input0": i0, "input1": i1}
        flow = np.asarray(ex.run(ins, ["flow"])[0])
    return float(flow.std())


def calibrate(model_name: str) -> float:
    lo, hi = 0.05, 1.5
    for _ in range(12):
        mid = (lo * hi) ** 0.5
        std = _final_flow_std(model_name, mid)
        if std > TARGET_FLOW_STD:
            hi = mid
        else:
            lo = mid
    return round((lo * hi) ** 0.5, 4)


def main():
    from ..models.zoo import MODEL_NAMES

    results = {}
    for name in MODEL_NAMES:
        scale = calibrate(name)
        std = _final_flow_std(name, scale)
        results[name] = scale
        print(f"{name}: scale={scale} -> flow std {std:.1f}px", flush=True)
    print("\nSYNTHETIC_FLOWNET_SCALE =", results)


if __name__ == "__main__":
    main()
