"""Model zoo: the 11 shipped RIFE model directories and their loaders.

Family sniffing mirrors the reference CLI (/root/reference/src/main.cpp:637-668):
a path containing ``rife-v2``/``rife-v3`` selects the v2 engine path, ``rife-v4``
the v4 (single-net, timestep-conditioned) path, bare ``rife`` the v1 path.

Weights: real ``.bin`` files are used when present; the mount ships only the
nine contextnet.bin files (/root/reference/.MISSING_LARGE_BLOBS lists the
rest), so absent streams fall back to deterministic synthetic weights — the
graphs, shapes and compute are identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from ..graph.ir import Graph
from ..graph.param import parse_param
from ..graph.weights import LayerWeights, load_bin, synthesize_weights

DEFAULT_MODEL_ROOT = Path("/root/reference/models")

MODEL_NAMES = [
    "rife", "rife-HD", "rife-UHD", "rife-anime",
    "rife-v2", "rife-v2.3", "rife-v2.4",
    "rife-v3.0", "rife-v3.1",
    "rife-v4", "rife-v4.6",
]


def sniff_family(model_path: str) -> str:
    """'v1' | 'v2' | 'v4' from the model dir name (reference semantics:
    v3 models use the v2 engine path)."""
    name = str(model_path)
    if "rife-v2" in name or "rife-v3" in name:
        return "v2"
    if "rife-v4" in name:
        return "v4"
    if "rife" in name:
        return "v1"
    raise ValueError(f"unknown model dir type: {model_path!r}")


@dataclass
class LoadedNet:
    graph: Graph
    weights: Dict[str, LayerWeights]
    synthetic: bool


@dataclass
class LoadedModel:
    name: str
    family: str  # v1 | v2 | v4
    nets: Dict[str, LoadedNet] = field(default_factory=dict)

    @property
    def flownet(self) -> LoadedNet:
        return self.nets["flownet"]

    @property
    def contextnet(self) -> Optional[LoadedNet]:
        return self.nets.get("contextnet")

    @property
    def fusionnet(self) -> Optional[LoadedNet]:
        return self.nets.get("fusionnet")

    @property
    def any_synthetic(self) -> bool:
        return any(n.synthetic for n in self.nets.values())


def resolve_model_dir(model: str, root: Optional[Path] = None) -> Path:
    """Use ``model`` as a path if it exists, else look it up under the zoo
    root (reference resolves relative to the executable,
    /root/reference/src/filesystem_utils.h:175-181; we resolve relative to
    the zoo root)."""
    p = Path(model)
    if p.is_dir():
        return p
    rooted = (root or DEFAULT_MODEL_ROOT) / model
    if rooted.is_dir():
        return rooted
    raise FileNotFoundError(f"model dir {model!r} not found (tried {p}, {rooted})")


def net_names_for_family(family: str) -> List[str]:
    # v4 loads flownet only (/root/reference/src/rife.cpp:152-164)
    return ["flownet"] if family == "v4" else ["flownet", "contextnet", "fusionnet"]


def load_model(model: str, root: Optional[Path] = None) -> LoadedModel:
    model_dir = resolve_model_dir(model, root)
    # sniff the FULL resolved path, not just the leaf dir name, so the
    # result always agrees with the CLI's sniff of the user string (the
    # reference sniffs the full path once, main.cpp:658-673) — e.g.
    # ``-m /data/rife-v4-stuff/m/`` must not pass CLI validation as v4 and
    # then raise here
    family = sniff_family(str(model_dir))
    loaded = LoadedModel(name=model_dir.name, family=family)
    for net in net_names_for_family(family):
        param_path = model_dir / f"{net}.param"
        bin_path = model_dir / f"{net}.bin"
        graph = parse_param(param_path)
        if bin_path.exists():
            weights = load_bin(graph, bin_path)
            synthetic = False
        else:
            weights = synthesize_weights(graph, f"{model_dir.name}/{net}")
            synthetic = True
        loaded.nets[net] = LoadedNet(graph=graph, weights=weights, synthetic=synthetic)
    return loaded
