"""Frame pre/post-processing and TTA view algebra (JAX, NHWC, batch-first).

TPU-native re-design of the reference's 16 GLSL compute shaders:

* preproc / postproc           — /root/reference/src/rife_preproc.comp,
                                 rife_postproc.comp (u8->[0,1] + zero-pad;
                                 crop + v*255+0.5 floor-clamp-u8)
* 8-view spatial TTA           — rife_preproc_tta.comp:85-92 writes the 8
                                 dihedral views; here a view is just a batch
                                 row, produced by flips/transposes that XLA
                                 lowers to layout ops.
* flow TTA consensus           — rife_flow_tta_avg.comp (+v2/v4 variants):
                                 the per-view sign/axis algebra becomes a
                                 signed channel permutation per view.
* temporal TTA merges          — rife_*_tta_temporal_avg.comp.
* v4 timestep plane            — rife_v4_timestep[_tta].comp.

Views 0-3 keep canonical (H,W) geometry; views 4-7 are transposed (W,H).
They are carried as two stacked groups ``(B,4,H,W,C)`` / ``(B,4,W,H,C)`` so
each group runs through the nets as one batched call.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# --- basic pre/post ---------------------------------------------------------


def preprocess(img_u8, pad_h: int, pad_w: int, dtype=jnp.float32):
    """(B,H,W,3) u8 -> (B,pad_h,pad_w,3) float in [0,1], zero-padded
    bottom/right (reference pads to 32-aligned canvases,
    /root/reference/src/rife.cpp:424-425)."""
    b, h, w, c = img_u8.shape
    x = img_u8.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    return jnp.pad(x, ((0, 0), (0, pad_h - h), (0, pad_w - w), (0, 0)))


def postprocess(x, out_h: int, out_w: int):
    """Crop the pad, denormalise with floor(v*255+0.5), saturate to u8."""
    v = x[:, :out_h, :out_w, :].astype(jnp.float32) * 255.0 + 0.5
    return jnp.clip(jnp.floor(v), 0.0, 255.0).astype(jnp.uint8)


def postprocess_planar(x, out_h: int, out_w: int):
    """``postprocess`` on (B,H,C,W) planes -> (B,H,W,C) u8.  The denorm/
    round/saturate runs on planes (no lane padding) and the single layout
    conversion happens on the u8 result — half the bf16 transpose traffic,
    and the only NHWC materialization left on the planar render path."""
    v = x[:, :out_h, :, :out_w].astype(jnp.float32) * 255.0 + 0.5
    u = jnp.clip(jnp.floor(v), 0.0, 255.0).astype(jnp.uint8)
    return u.transpose(0, 1, 3, 2)


def timestep_plane(t, b: int, pad_h: int, pad_w: int, dtype=jnp.float32):
    """Constant-t plane, (B,pad_h,pad_w,1) (rife_v4_timestep.comp:29)."""
    t = jnp.asarray(t, dtype)
    return jnp.broadcast_to(t.reshape(-1, 1, 1, 1), (b, pad_h, pad_w, 1))


# --- 8-view spatial TTA ------------------------------------------------------
#
# View k of image A (H,W):
#   0: A            1: A[:, ::-1]    2: A[::-1, ::-1]   3: A[::-1, :]
#   4: A.T          5: A.T[:, ::-1]  6: A.T[::-1, ::-1] 7: A.T[::-1, :]
# (derived from the write indices in rife_preproc_tta.comp:85-92)

_FLIPS = ((), (2,), (1, 2), (1,))  # spatial axes to flip, per view-in-group


def _flip(x, axes):
    return jnp.flip(x, axis=axes) if axes else x


def expand_views8(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,C) -> group A (B,4,H,W,C) + group B (B,4,W,H,C)."""
    xt = jnp.swapaxes(x, 1, 2)
    ga = jnp.stack([_flip(x, a) for a in _FLIPS], axis=1)
    gb = jnp.stack([_flip(xt, a) for a in _FLIPS], axis=1)
    return ga, gb


def _inverse_views(ga, gb):
    """Bring each view back to canonical geometry -> (B,8,H,W,C)."""
    outs = [_flip(ga[:, k], _FLIPS[k]) for k in range(4)]
    outs += [jnp.swapaxes(_flip(gb[:, k], _FLIPS[k]), 1, 2) for k in range(4)]
    return jnp.stack(outs, axis=1)


def merge_views8_mean(ga, gb):
    """Inverse-transform all 8 views and average (rife_postproc_tta.comp)."""
    return jnp.mean(_inverse_views(ga, gb), axis=1)


# Signed channel permutations for flow vectors under each view transform.
# For a (u,v) channel pair, gather G_k maps view-k components to canonical:
#   view:      0        1         2         3        4       5        6         7
#   gather:  ( u, v) (-u, v)  (-u,-v)  ( u,-v)  ( v, u) ( v,-u) (-v,-u)  (-v, u)
#   scatter: ( u, v) (-u, v)  (-u,-v)  ( u,-v)  ( v, u) (-v, u) (-v,-u)  ( v,-u)
# which reproduces rife_flow_tta_avg.comp:52-53 / 56-71 exactly.
_GATHER = (
    ((0, 1), (1, 1)), ((0, -1), (1, 1)), ((0, -1), (1, -1)), ((0, 1), (1, -1)),
    ((1, 1), (0, 1)), ((1, 1), (0, -1)), ((1, -1), (0, -1)), ((1, -1), (0, 1)),
)
_SCATTER = (
    ((0, 1), (1, 1)), ((0, -1), (1, 1)), ((0, -1), (1, -1)), ((0, 1), (1, -1)),
    ((1, 1), (0, 1)), ((1, -1), (0, 1)), ((1, -1), (0, -1)), ((1, 1), (0, -1)),
)


def _flow_channel_map(x, view: int, n_pairs: int, mask_channels, table):
    """Apply the signed channel permutation of ``view`` to flow channels."""
    chans = []
    c = x.shape[-1]
    spec = table[view]
    for p in range(n_pairs):
        (su, sgu), (sv, sgv) = spec
        chans.append(x[..., 2 * p + su] * sgu)
        chans.append(x[..., 2 * p + sv] * sgv)
    for m in mask_channels:
        chans.append(x[..., m])  # mask averages unsigned in spatial TTA
    for extra in range(2 * n_pairs + len(mask_channels), c):
        chans.append(x[..., extra])
    return jnp.stack(chans, axis=-1)


def flow_views_avg(ga, gb, n_pairs: int, has_mask: bool):
    """Spatial-TTA flow consensus.

    Inverse-transform the 8 per-view flow fields to canonical geometry,
    apply the per-view signed channel permutation, average, then scatter the
    consensus back into all 8 view layouts.  Channels beyond
    ``2*n_pairs + has_mask`` pass through untouched per view (the v4.6 taps
    carry a 6th feature channel the reference shader never touches).

    Returns (ga', gb') with the same shapes as the inputs.
    """
    mask_ch = [2 * n_pairs] if has_mask else []
    n_sig = 2 * n_pairs + len(mask_ch)
    canon = _inverse_views(ga, gb)  # (B,8,H,W,C)
    contribs = [
        _flow_channel_map(canon[:, k], k, n_pairs, mask_ch, _GATHER)
        for k in range(8)
    ]
    consensus = jnp.mean(jnp.stack(contribs, axis=1), axis=1)[..., :n_sig]

    def scatter(view, transposed):
        f = _flow_channel_map(consensus, view, n_pairs, mask_ch, _SCATTER)
        if transposed:
            f = jnp.swapaxes(f, 1, 2)
            f = _flip(f, _FLIPS[view - 4])
        else:
            f = _flip(f, _FLIPS[view])
        return f

    new_a = jnp.stack([scatter(k, False) for k in range(4)], axis=1)
    new_b = jnp.stack([scatter(k, True) for k in range(4, 8)], axis=1)
    if ga.shape[-1] > n_sig:  # passthrough channels keep per-view values
        new_a = jnp.concatenate([new_a, ga[..., n_sig:]], axis=-1)
        new_b = jnp.concatenate([new_b, gb[..., n_sig:]], axis=-1)
    return new_a, new_b


# --- temporal TTA ------------------------------------------------------------


def flow_temporal_avg_v1(flow, flow_rev):
    """v1: 2ch flows; consensus x=(x-x_rev)/2, reversed = -consensus
    (rife_flow_tta_temporal_avg.comp:34-35)."""
    merged = (flow - flow_rev) * 0.5
    return merged, -merged


def _swap_half4(f):
    return jnp.concatenate([f[..., 2:4], f[..., 0:2]], axis=-1)


def flow_temporal_avg_v2(flow, flow_rev):
    """v2: 4ch (flow01|flow10); forward pairs average with the *swapped*
    halves of the reversed run (rife_v2_flow_tta_temporal_avg.comp:31-34)."""
    merged = (flow + _swap_half4(flow_rev)) * 0.5
    return merged, _swap_half4(merged)


def flow_temporal_avg_v4(flow, flow_rev):
    """v4: 4ch flow as in v2, channel 4 mask merged with sign flip, any
    further channels untouched (rife_v4_flow_tta_temporal_avg.comp:42-46)."""
    f4 = (flow[..., :4] + _swap_half4(flow_rev[..., :4])) * 0.5
    m = (flow[..., 4:5] - flow_rev[..., 4:5]) * 0.5
    merged = jnp.concatenate([f4, m, flow[..., 5:]], axis=-1)
    reversed_ = jnp.concatenate(
        [_swap_half4(f4), -m, flow_rev[..., 5:]], axis=-1
    )
    return merged, reversed_


def out_temporal_avg(out, out_rev):
    """Plain mean of forward/reverse renders (rife_out_tta_temporal_avg.comp:33)."""
    return (out + out_rev) * 0.5
