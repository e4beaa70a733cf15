"""Graph IR for ncnn-format model graphs.

A thin, typed intermediate representation of the computation graphs shipped in
the reference model zoo (text ``.param`` files under /root/reference/models/;
format notes in SURVEY.md §2.3).

The IR is deliberately minimal: a list of layer nodes in file order (which is
always topological in ncnn param files) plus blob-name bookkeeping.  Execution,
weight binding and TPU lowering live elsewhere (``rife_tpu.graph.executor``,
``rife_tpu.graph.weights``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Set, Tuple, Union

ParamValue = Union[int, float, List[int], List[float]]


@dataclass
class LayerNode:
    """One layer line of a .param file.

    ``params`` maps the integer param id to its value.  Array params use the
    ncnn convention of negative ids (-233xx) and decode to Python lists.
    """

    type: str
    name: str
    bottoms: List[str]
    tops: List[str]
    params: Dict[int, ParamValue] = field(default_factory=dict)

    def p(self, pid: int, default: ParamValue = 0) -> ParamValue:
        return self.params.get(pid, default)


@dataclass
class Graph:
    """A parsed model graph.

    * ``nodes`` — layers in param-file order (topological).
    * ``producer`` — blob name -> (node index, output slot).
    * ``input_blobs`` — blobs produced by ``Input`` layers.
    """

    nodes: List[LayerNode]
    producer: Dict[str, Tuple[int, int]]
    input_blobs: List[str]

    @property
    def blob_names(self) -> List[str]:
        return list(self.producer.keys())

    def required_nodes(
        self,
        outputs: Sequence[str],
        provided: Sequence[str],
    ) -> List[int]:
        """Node indices (topological order) needed to compute ``outputs``.

        ``provided`` blobs are treated as already materialised: traversal stops
        there.  This mirrors ncnn Extractor semantics
        (/root/reference/src/rife.cpp:2657-2669 relies on it to re-inject
        pyramid taps flow0..flow3 in the v4 TTA path).
        """
        provided_set: Set[str] = set(provided)
        needed: Set[int] = set()
        stack: List[str] = [b for b in outputs if b not in provided_set]
        visited_blobs: Set[str] = set(provided_set)
        while stack:
            blob = stack.pop()
            if blob in visited_blobs:
                continue
            visited_blobs.add(blob)
            if blob not in self.producer:
                raise KeyError(f"blob {blob!r} has no producer and was not provided")
            node_idx, _ = self.producer[blob]
            if node_idx in needed:
                continue
            needed.add(node_idx)
            node = self.nodes[node_idx]
            for b in node.bottoms:
                if b not in visited_blobs:
                    stack.append(b)
        return sorted(needed)

    def value_copies_of(self, seeds: Sequence[str]) -> Set[str]:
        """Blobs that carry the exact same values as one of ``seeds``.

        Transitive closure through ``Split`` layers only (ncnn Split is a
        pure fan-out copy).  Used to tag u8-exact image blobs so the warp op
        can take the quad-packed u8 kernel for them.
        """
        copies: Set[str] = {s for s in seeds if s in self.producer or s in self.input_blobs}
        changed = True
        while changed:
            changed = False
            for node in self.nodes:
                if node.type != "Split":
                    continue
                if node.bottoms[0] in copies:
                    for t in node.tops:
                        if t not in copies:
                            copies.add(t)
                            changed = True
        return copies

    def layers_of_type(self, type_name: str) -> List[LayerNode]:
        return [n for n in self.nodes if n.type == type_name]

    def type_histogram(self) -> Dict[str, int]:
        hist: Dict[str, int] = {}
        for n in self.nodes:
            hist[n.type] = hist.get(n.type, 0) + 1
        return hist
