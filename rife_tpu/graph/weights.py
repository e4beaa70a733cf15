"""Reader for ncnn ``.bin`` weight streams + deterministic synthetic fallback.

Binary format (byte-exact verification in SURVEY.md §2.3 against
/root/reference/models/rife-v2.3/contextnet.bin):

* the stream is a flat concatenation of per-layer arrays in param-file order;
* Convolution / Deconvolution / InnerProduct weight arrays are preceded by a
  little-endian u32 *flag*: ``0`` = raw fp32, ``0x01306B47`` = fp16 payload
  (padded to 4-byte alignment), ``0x000D4B38`` = int8 (not used by the zoo);
* bias arrays (Convolution/Deconvolution with ``5=1``) and PReLU slopes are
  raw fp32 with **no** flag.

Weight tensor layouts (as flattened in the stream):

* Convolution:    (out_ch, in_ch, kh, kw)
* Deconvolution:  (in_ch, out_ch, kh, kw) — torch ``ConvTranspose2d`` order
* InnerProduct:   (out_features, in_features)
* PReLU:          (num_slopes,)

``in_ch`` is never stated in the param file; it is recovered from
``weight_data_size / (out_ch * kh * kw)`` exactly as ncnn does.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .ir import Graph, LayerNode

FLAG_FP32 = 0
FLAG_FP16 = 0x01306B47
FLAG_INT8 = 0x000D4B38

WEIGHTED_TYPES = ("Convolution", "Deconvolution", "InnerProduct", "PReLU")


class _BinReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError(
                f"bin underrun: need {n} bytes at offset {self.pos}, "
                f"file has {len(self.data)}"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_flagged(self, count: int) -> np.ndarray:
        flag = int(np.frombuffer(self._take(4), dtype="<u4")[0])
        if flag == FLAG_FP32:
            return np.frombuffer(self._take(count * 4), dtype="<f4").copy()
        if flag == FLAG_FP16:
            nbytes = count * 2
            aligned = (nbytes + 3) // 4 * 4
            raw = self._take(aligned)[:nbytes]
            return np.frombuffer(raw, dtype="<f2").astype(np.float32)
        raise ValueError(f"unsupported weight flag 0x{flag:08X} at {self.pos - 4}")

    def read_raw_f32(self, count: int) -> np.ndarray:
        return np.frombuffer(self._take(count * 4), dtype="<f4").copy()

    @property
    def fully_consumed(self) -> bool:
        return self.pos == len(self.data)


@dataclass
class LayerWeights:
    """Arrays for one layer, in canonical (ncnn-order) numpy form."""

    weight: Optional[np.ndarray] = None
    bias: Optional[np.ndarray] = None
    slope: Optional[np.ndarray] = None


def _conv_shapes(node: LayerNode) -> Tuple[int, int, int]:
    out_ch = int(node.p(0))
    k = int(node.p(1))
    wsize = int(node.p(6))
    in_ch = wsize // (out_ch * k * k)
    if in_ch * out_ch * k * k != wsize:
        raise ValueError(f"{node.name}: weight size {wsize} not divisible")
    return out_ch, in_ch, k


def _load_layer(node: LayerNode, reader: _BinReader) -> Optional[LayerWeights]:
    if node.type == "Convolution":
        out_ch, in_ch, k = _conv_shapes(node)
        w = reader.read_flagged(out_ch * in_ch * k * k).reshape(out_ch, in_ch, k, k)
        b = reader.read_raw_f32(out_ch) if int(node.p(5)) == 1 else None
        return LayerWeights(weight=w, bias=b)
    if node.type == "Deconvolution":
        out_ch, in_ch, k = _conv_shapes(node)
        w = reader.read_flagged(in_ch * out_ch * k * k).reshape(in_ch, out_ch, k, k)
        b = reader.read_raw_f32(out_ch) if int(node.p(5)) == 1 else None
        return LayerWeights(weight=w, bias=b)
    if node.type == "InnerProduct":
        out_f = int(node.p(0))
        wsize = int(node.p(2))
        in_f = wsize // out_f
        w = reader.read_flagged(wsize).reshape(out_f, in_f)
        b = reader.read_raw_f32(out_f) if int(node.p(1)) == 1 else None
        return LayerWeights(weight=w, bias=b)
    if node.type == "PReLU":
        n = int(node.p(0))
        return LayerWeights(slope=reader.read_raw_f32(n))
    return None


def load_bin(graph: Graph, path: Union[str, Path]) -> Dict[str, LayerWeights]:
    """Bind a .bin stream to ``graph``; returns layer-name -> weights."""
    reader = _BinReader(Path(path).read_bytes())
    out: Dict[str, LayerWeights] = {}
    for node in graph.nodes:
        lw = _load_layer(node, reader)
        if lw is not None:
            out[node.name] = lw
    if not reader.fully_consumed:
        raise ValueError(
            f"{path}: {len(reader.data) - reader.pos} trailing bytes unread"
        )
    return out


def _seed_for(tag: str) -> int:
    return int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "little")


# Global weight multipliers for synthetic flownets, calibrated so the final
# flow magnitude is a realistic ~10 px (raw He-init explodes ~15x per pyramid
# level through the residual trunks, ending at ~3e4 px "flows").  Produced by
# ``python -m rife_tpu.models.calibrate``.
SYNTHETIC_FLOWNET_SCALE = {
    "rife": 1.0657, "rife-HD": 0.9277, "rife-UHD": 1.0055,
    "rife-anime": 1.0283, "rife-v2": 1.1191, "rife-v2.3": 1.1117,
    "rife-v2.4": 1.1164, "rife-v3.0": 0.9184, "rife-v3.1": 0.9208,
    "rife-v4": 0.9964, "rife-v4.6": 0.6954,
}


def _weight_scale_for(tag: str) -> float:
    model, _, net = tag.partition("/")
    if net == "flownet":
        return SYNTHETIC_FLOWNET_SCALE.get(model, 1.0)
    return 1.0


def synthesize_weights(graph: Graph, tag: str) -> Dict[str, LayerWeights]:
    """Deterministic He-style random weights for graphs whose .bin is absent
    in this mount (see /root/reference/.MISSING_LARGE_BLOBS).

    Shapes/dtypes are exactly what ``load_bin`` would produce, so the rest of
    the stack is oblivious to whether weights are real or synthetic.
    """
    out: Dict[str, LayerWeights] = {}
    wscale = _weight_scale_for(tag)
    for node in graph.nodes:
        rng = np.random.default_rng(_seed_for(f"{tag}:{node.name}"))
        if node.type in ("Convolution", "Deconvolution"):
            out_ch, in_ch, k = _conv_shapes(node)
            fan_in = in_ch * k * k
            std = float(np.sqrt(2.0 / fan_in)) * wscale
            shape = (
                (out_ch, in_ch, k, k)
                if node.type == "Convolution"
                else (in_ch, out_ch, k, k)
            )
            w = rng.normal(0.0, std, size=shape).astype(np.float32)
            b = (
                np.zeros(out_ch, dtype=np.float32)
                if int(node.p(5)) == 1
                else None
            )
            out[node.name] = LayerWeights(weight=w, bias=b)
        elif node.type == "InnerProduct":
            out_f = int(node.p(0))
            in_f = int(node.p(2)) // out_f
            std = float(np.sqrt(2.0 / in_f)) * wscale
            w = rng.normal(0.0, std, size=(out_f, in_f)).astype(np.float32)
            b = np.zeros(out_f, dtype=np.float32) if int(node.p(1)) == 1 else None
            out[node.name] = LayerWeights(weight=w, bias=b)
        elif node.type == "PReLU":
            n = int(node.p(0))
            out[node.name] = LayerWeights(
                slope=np.full(n, 0.25, dtype=np.float32)
            )
    return out


def expected_weight_layers(graph: Graph) -> List[str]:
    return [n.name for n in graph.nodes if n.type in WEIGHTED_TYPES]
