"""Engine/session tests: all families end-to-end, TTA invariants, batching.

The strongest check here is dihedral equivariance: because spatial TTA
symmetrises over the full 8-element dihedral group, the *whole* pipeline
(preproc -> flownet -> consensus -> render -> merge -> postproc) must commute
with a 180-degree rotation of the inputs (exactly, up to fp reassociation)
whenever no padding is involved.  This exercises every piece of the TTA
plumbing at once against a property the reference also satisfies.
"""

import numpy as np
import pytest

from rife_tpu.engine.session import RIFE, pad_to

RNG = np.random.default_rng(3)


def mkframe(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def v23():
    return RIFE("rife-v2.3")


@pytest.fixture(scope="module")
def v46():
    return RIFE("rife-v4.6")


def test_pad_to():
    assert pad_to(1) == 32 and pad_to(32) == 32 and pad_to(33) == 64
    assert pad_to(1080) == 1088 and pad_to(1920) == 1920


def test_u8_image_blobs_wired_into_executors(v46, v23):
    """Sessions tag u8-origin image blobs per net so the warp op can take
    the lossless u8-quad Pallas kernel on TPU."""
    u8 = v46.executors["flownet"].ctx["u8_image_blobs"]
    warps = v46.model.nets["flownet"].graph.layers_of_type("rife.Warp")
    assert len(warps) == 8 and all(n.bottoms[0] in u8 for n in warps)
    # v2.3: fusionnet image warps tagged, contextnet feature warps not
    fus = v23.executors["fusionnet"]
    fwarps = v23.model.nets["fusionnet"].graph.layers_of_type("rife.Warp")
    assert all(n.bottoms[0] in fus.ctx["u8_image_blobs"] for n in fwarps)
    cx = v23.executors["contextnet"]
    cwarps = v23.model.nets["contextnet"].graph.layers_of_type("rife.Warp")
    assert all(n.bottoms[0] not in cx.ctx["u8_image_blobs"] for n in cwarps)


@pytest.mark.parametrize("model", ["rife", "rife-v2.3", "rife-v3.1", "rife-v4.6"])
def test_all_families_run(model):
    s = RIFE(model)
    a, b = mkframe(40, 56, 1), mkframe(40, 56, 2)
    out = s.process(a, b, 0.5)
    assert out.shape == (40, 56, 3) and out.dtype == np.uint8
    out2 = s.process(a, b, 0.5)
    np.testing.assert_array_equal(out, out2)  # deterministic


def test_t_shortcuts(v46):
    a, b = mkframe(32, 32, 1), mkframe(32, 32, 2)
    np.testing.assert_array_equal(v46.process(a, b, 0.0), a)
    np.testing.assert_array_equal(v46.process(a, b, 1.0), b)


def test_v4_timestep_traced_no_recompile(v46):
    a, b = mkframe(32, 32, 5), mkframe(32, 32, 6)
    o25 = v46.process(a, b, 0.25)
    o75 = v46.process(a, b, 0.75)
    assert not np.array_equal(o25, o75)
    assert len(v46.compiled_shapes()) == 1  # timestep is traced, not static


def test_batch_matches_single(v46):
    a1, b1 = mkframe(32, 32, 7), mkframe(32, 32, 8)
    a2, b2 = mkframe(32, 32, 9), mkframe(32, 32, 10)
    batch = v46.process_batch(
        np.stack([a1, a2]), np.stack([b1, b2]), np.asarray([0.3, 0.6], np.float32)
    )
    s1 = v46.process(a1, b1, 0.3)
    s2 = v46.process(a2, b2, 0.6)
    # XLA fuses differently per batch size; allow 1 u8 rounding step
    for got, ref in ((batch[0], s1), (batch[1], s2)):
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99


def test_nonaligned_size_pads_and_crops(v23):
    a, b = mkframe(33, 49, 11), mkframe(33, 49, 12)
    out = v23.process(a, b, 0.5)
    assert out.shape == (33, 49, 3)


@pytest.mark.parametrize("model,kwargs", [
    ("rife-v2.3", dict(tta_mode=True)),
    ("rife-v4.6", dict(tta_mode=True, tta_temporal_mode=True)),
])
def test_tta_dihedral_equivariance(model, kwargs):
    """rot180(inputs) must produce rot180(output) when TTA is on and the
    frame needs no padding (32-aligned)."""
    s = RIFE(model, **kwargs)
    a, b = mkframe(32, 64, 13), mkframe(32, 64, 14)
    out = s.process(a, b, 0.5)
    rot = lambda x: x[::-1, ::-1].copy()
    out_rot = s.process(rot(a), rot(b), 0.5)
    diff = np.abs(out_rot.astype(int) - rot(out).astype(int))
    # fp reassociation can flip u8 rounding by 1 on a few pixels
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.98


def test_temporal_tta_time_symmetry():
    """With -z on, swapping (in0,in1) at t=0.5 must give the same frame:
    the forward and reverse passes are averaged symmetrically."""
    s = RIFE("rife-v2.3", tta_temporal_mode=True)
    a, b = mkframe(32, 32, 15), mkframe(32, 32, 16)
    o1 = s.process(a, b, 0.5)
    o2 = s.process(b, a, 0.5)
    diff = np.abs(o1.astype(int) - o2.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.98


def test_uhd_mode_runs(v23):
    s = RIFE("rife-v2.3", uhd_mode=True)
    a, b = mkframe(64, 64, 17), mkframe(64, 64, 18)
    out = s.process(a, b, 0.5)
    assert out.shape == (64, 64, 3)
    # UHD estimates flow at 0.5x: result differs from the full-res path
    base = v23.process(a, b, 0.5)
    assert not np.array_equal(out, base)


def test_warp_variant_autoprobe_resolution():
    """RIFE_TPU_WARP_VARIANT=auto resolves once per session: explicit env
    values win, non-TPU backends skip the probe (Pallas doesn't run
    there), and the resolved choice is pinned into the step cache key."""
    import os

    import jax

    from rife_tpu.engine.session import RIFE

    s = RIFE("rife-v4.6", dtype="float32")
    prev = os.environ.get("RIFE_TPU_WARP_VARIANT")
    try:
        os.environ["RIFE_TPU_WARP_VARIANT"] = "band"
        assert s._resolve_warp_variant(None, None, None, 64, 64) == "band"
        os.environ["RIFE_TPU_WARP_VARIANT"] = "auto"
        if jax.devices()[0].platform != "tpu":
            # CPU backend: no probe, static default
            assert s._resolve_warp_variant(None, None, None, 64, 64) == "auto"
            assert s._auto_warp_variant == "auto"
    finally:
        if prev is None:
            os.environ.pop("RIFE_TPU_WARP_VARIANT", None)
        else:
            os.environ["RIFE_TPU_WARP_VARIANT"] = prev
