"""Graph executor — the TPU-native replacement for ncnn::Net/Extractor.

A single topological interpreter drives either backend:

* the JAX op table (``rife_tpu.ops.jax_ops``) — traced under ``jax.jit`` this
  flattens the whole model into one XLA program (the reference records one
  Vulkan command buffer per frame, /root/reference/src/rife.cpp:1196; here the
  compiler sees everything at once and fuses across layer boundaries);
* the NumPy oracle (``rife_tpu.ops.numpy_ref``) for tests.

``Executor.run`` mirrors ncnn Extractor semantics: callers provide input
blobs (any blob may be pinned, not just graph inputs — the v4 TTA pyramid
re-injects flow0..flow3 exactly this way, /root/reference/src/rife.cpp:2657-2669)
and request any named blobs as outputs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence

from .ir import Graph
from .weights import LayerWeights


class Executor:
    def __init__(
        self,
        graph: Graph,
        op_table: Mapping[str, Any],
        raw_weights: Mapping[str, LayerWeights],
        ctx: Dict[str, Any] | None = None,
    ):
        self.graph = graph
        self.op_table = op_table
        self.raw_weights = raw_weights
        self.ctx = ctx or {}

    def run(
        self,
        inputs: Mapping[str, Any],
        outputs: Sequence[str],
        ctx: Dict[str, Any] | None = None,
    ) -> List[Any]:
        """Execute; ``ctx`` entries override the constructor context (lets
        jitted callers pass the prepared weight pytree as a traced argument
        instead of baking it into the program as constants)."""
        ctx = {**self.ctx, **ctx} if ctx else self.ctx
        blobs: Dict[str, Any] = dict(inputs)
        needed = self.graph.required_nodes(outputs, list(inputs.keys()))
        for idx in needed:
            node = self.graph.nodes[idx]
            if node.type == "Input":
                if node.tops[0] not in blobs:
                    raise KeyError(f"graph input {node.tops[0]!r} not provided")
                continue
            # a node may be "needed" while all its tops are already pinned
            if all(t in blobs for t in node.tops):
                continue
            fn = self.op_table.get(node.type)
            if fn is None:
                raise NotImplementedError(f"layer type {node.type!r}")
            ins = [blobs[b] for b in node.bottoms]
            outs = fn(node, ins, self.raw_weights.get(node.name), ctx)
            if len(outs) != len(node.tops):
                raise RuntimeError(
                    f"{node.type} {node.name}: produced {len(outs)} outputs, "
                    f"graph expects {len(node.tops)}"
                )
            for top, val in zip(node.tops, outs):
                if top not in blobs:  # pinned blobs always win
                    blobs[top] = val
        return [blobs[b] for b in outputs]


class PlanarExecutor(Executor):
    """Executor whose blobs are carried as (B, C, H, W) planes internally.

    Callers keep the NHWC convention at the boundary: 4D inputs are
    transposed to planes on entry and extracted blobs back to NHWC on
    exit.  The op table must be ``planar_ops.OP_TABLE_PLANAR``.  Why: on
    TPU, XLA lane-pads feature-minor narrow-channel tensors to 128 — the
    planar table keeps W on lanes and routes narrow convs to the Pallas
    planar kernel (see ops/planar_ops.py).
    """

    def run(self, inputs, outputs, ctx=None):
        pin = {
            k: (v.transpose(0, 3, 1, 2) if getattr(v, "ndim", 0) == 4
                else v)
            for k, v in inputs.items()
        }
        outs = super().run(pin, outputs, ctx)
        return [
            o.transpose(0, 2, 3, 1) if getattr(o, "ndim", 0) == 4 else o
            for o in outs
        ]
