"""NumPy full-pipeline oracle (test support).

An independent, loop-level end-to-end implementation of the non-TTA
interpolation pipelines using only the NumPy op backend — the "fake backend"
of SURVEY.md §4.  The JAX engine is validated against this at small sizes;
TTA paths are covered separately by the algebraic property tests.
"""

from __future__ import annotations

import numpy as np

from ..graph.executor import Executor
from ..models.zoo import LoadedModel
from ..ops import numpy_ref


def _preprocess(img_u8, pad_h, pad_w):
    h, w = img_u8.shape[1:3]
    x = img_u8.astype(np.float32) / 255.0
    return np.pad(x, ((0, 0), (0, pad_h - h), (0, pad_w - w), (0, 0)))


def _postprocess(x, h, w):
    v = x[:, :h, :w, :].astype(np.float32) * 255.0 + 0.5
    return np.clip(np.floor(v), 0, 255).astype(np.uint8)


def interpolate(model: LoadedModel, in0_u8, in1_u8, timestep: float = 0.5,
                uhd: bool = False):
    """(B,H,W,3) u8 pair -> u8 midpoint frame. Mirrors the reference's
    non-TTA control flow (rife.cpp:878-1183 / 3136-3145)."""
    h, w = in0_u8.shape[1:3]
    ph, pw = (h + 31) // 32 * 32, (w + 31) // 32 * 32
    img0 = _preprocess(in0_u8, ph, pw)
    img1 = _preprocess(in1_u8, ph, pw)

    execs = {
        name: Executor(net.graph, numpy_ref.OP_TABLE, net.weights)
        for name, net in model.nets.items()
    }

    if model.family == "v4":
        t = np.full((img0.shape[0], ph, pw, 1), timestep, np.float32)
        out = execs["flownet"].run(
            {"in0": img0, "in1": img1, "in2": t}, ["out0"]
        )[0]
        return _postprocess(out, h, w)

    flownet = execs["flownet"]
    if uhd:
        i0d = numpy_ref.resize_bilinear(img0, ph // 2, pw // 2)
        i1d = numpy_ref.resize_bilinear(img1, ph // 2, pw // 2)
        flow_ds = flownet.run({"input0": i0d, "input1": i1d}, ["flow"])[0]
        flow = numpy_ref.resize_bilinear(
            flow_ds, flow_ds.shape[1] * 2, flow_ds.shape[2] * 2
        ) * np.float32(2.0)
    else:
        flow = flownet.run({"input0": img0, "input1": img1}, ["flow"])[0]

    v2 = model.family == "v2"
    ctx = execs["contextnet"]
    if v2:
        ctx0 = ctx.run({"input.1": img0, "flow.0": flow[..., 0:2]},
                       ["f1", "f2", "f3", "f4"])
        ctx1 = ctx.run({"input.1": img1, "flow.0": flow[..., 2:4]},
                       ["f1", "f2", "f3", "f4"])
    else:
        ctx0 = ctx.run({"input.1": img0, "flow.0": flow},
                       ["f1", "f2", "f3", "f4"])
        ctx1 = ctx.run({"input.1": img1, "flow.1": flow},
                       ["f1", "f2", "f3", "f4"])

    inputs = {"img0": img0, "img1": img1, "flow": flow}
    for i, f in enumerate(list(ctx0) + list(ctx1)):
        inputs[str(3 + i)] = f
    out = execs["fusionnet"].run(inputs, ["output"])[0]
    return _postprocess(out, h, w)
