"""Spatial/temporal TTA algebra tests.

The flow-consensus sign/permutation algebra is checked against a literal
NumPy transcription of rife_flow_tta_avg.comp (independent oracle), plus
structural invariants (view round-trips, consensus fixed points).
"""

import numpy as np
import jax.numpy as jnp

from rife_tpu.ops import frame

RNG = np.random.default_rng(7)


# --- oracle: literal transcription of rife_flow_tta_avg.comp ---------------

def shader_flow_tta_avg(views):
    """views: list of 8 numpy arrays; [0..3] shaped (H,W,2), [4..7] (W,H,2).
    Returns the 8 updated views, exactly as the shader rewrites them."""
    H, W, _ = views[0].shape
    out = [v.copy() for v in views]
    for gy in range(H):
        for gx in range(W):
            x0 = views[0][gy, gx, 0]
            x1 = views[1][gy, W - 1 - gx, 0]
            x2 = views[2][H - 1 - gy, W - 1 - gx, 0]
            x3 = views[3][H - 1 - gy, gx, 0]
            x4 = views[4][gx, gy, 0]
            x5 = views[5][gx, H - 1 - gy, 0]
            x6 = views[6][W - 1 - gx, H - 1 - gy, 0]
            x7 = views[7][W - 1 - gx, gy, 0]
            y0 = views[0][gy, gx, 1]
            y1 = views[1][gy, W - 1 - gx, 1]
            y2 = views[2][H - 1 - gy, W - 1 - gx, 1]
            y3 = views[3][H - 1 - gy, gx, 1]
            y4 = views[4][gx, gy, 1]
            y5 = views[5][gx, H - 1 - gy, 1]
            y6 = views[6][W - 1 - gx, H - 1 - gy, 1]
            y7 = views[7][W - 1 - gx, gy, 1]
            x = (x0 + -x1 + -x2 + x3 + y4 + y5 + -y6 + -y7) * 0.125
            y = (y0 + y1 + -y2 + -y3 + x4 + -x5 + -x6 + x7) * 0.125
            out[0][gy, gx] = (x, y)
            out[1][gy, W - 1 - gx] = (-x, y)
            out[2][H - 1 - gy, W - 1 - gx] = (-x, -y)
            out[3][H - 1 - gy, gx] = (x, -y)
            out[4][gx, gy] = (y, x)
            out[5][gx, H - 1 - gy] = (-y, x)
            out[6][W - 1 - gx, H - 1 - gy] = (-y, -x)
            out[7][W - 1 - gx, gy] = (y, -x)
    return out


# --- oracle: literal transcription of rife_v2_flow_tta_avg.comp ------------

def shader_v2_flow_tta_avg(views):
    """views: 8 numpy arrays; [0..3] (H,W,4), [4..7] (W,H,4).  Literal
    transcription of rife_v2_flow_tta_avg.comp:36-56 (vec4 = two flow pairs,
    second pair z/w follows the same sign algebra as x/y)."""
    H, W, _ = views[0].shape
    out = [v.copy() for v in views]
    for gy in range(H):
        for gx in range(W):
            v0 = views[0][gy, gx]
            v1 = views[1][gy, W - 1 - gx]
            v2 = views[2][H - 1 - gy, W - 1 - gx]
            v3 = views[3][H - 1 - gy, gx]
            v4 = views[4][gx, gy]
            v5 = views[5][gx, H - 1 - gy]
            v6 = views[6][W - 1 - gx, H - 1 - gy]
            v7 = views[7][W - 1 - gx, gy]
            x = (v0[0] - v1[0] - v2[0] + v3[0] + v4[1] + v5[1] - v6[1] - v7[1]) * 0.125
            y = (v0[1] + v1[1] - v2[1] - v3[1] + v4[0] - v5[0] - v6[0] + v7[0]) * 0.125
            z = (v0[2] - v1[2] - v2[2] + v3[2] + v4[3] + v5[3] - v6[3] - v7[3]) * 0.125
            w = (v0[3] + v1[3] - v2[3] - v3[3] + v4[2] - v5[2] - v6[2] + v7[2]) * 0.125
            out[0][gy, gx] = (x, y, z, w)
            out[1][gy, W - 1 - gx] = (-x, y, -z, w)
            out[2][H - 1 - gy, W - 1 - gx] = (-x, -y, -z, -w)
            out[3][H - 1 - gy, gx] = (x, -y, z, -w)
            out[4][gx, gy] = (y, x, w, z)
            out[5][gx, H - 1 - gy] = (-y, x, -w, z)
            out[6][W - 1 - gx, H - 1 - gy] = (-y, -x, -w, -z)
            out[7][W - 1 - gx, gy] = (y, -x, w, -z)
    return out


# --- oracle: literal transcription of rife_v4_flow_tta_avg.comp ------------

def shader_v4_flow_tta_avg(views):
    """views: 8 numpy arrays; [0..3] (H,W,5), [4..7] (W,H,5).  Literal
    transcription of rife_v4_flow_tta_avg.comp:35-129 (4 flow channels as in
    v2, 5th channel = mask averaged and scattered WITHOUT sign)."""
    H, W, _ = views[0].shape
    out = [v.copy() for v in views]
    for gy in range(H):
        for gx in range(W):
            v0 = views[0][gy, gx]
            v1 = views[1][gy, W - 1 - gx]
            v2 = views[2][H - 1 - gy, W - 1 - gx]
            v3 = views[3][H - 1 - gy, gx]
            v4 = views[4][gx, gy]
            v5 = views[5][gx, H - 1 - gy]
            v6 = views[6][W - 1 - gx, H - 1 - gy]
            v7 = views[7][W - 1 - gx, gy]
            x = (v0[0] + -v1[0] + -v2[0] + v3[0] + v4[1] + v5[1] + -v6[1] + -v7[1]) * 0.125
            y = (v0[1] + v1[1] + -v2[1] + -v3[1] + v4[0] + -v5[0] + -v6[0] + v7[0]) * 0.125
            z = (v0[2] + -v1[2] + -v2[2] + v3[2] + v4[3] + v5[3] + -v6[3] + -v7[3]) * 0.125
            w = (v0[3] + v1[3] + -v2[3] + -v3[3] + v4[2] + -v5[2] + -v6[2] + v7[2]) * 0.125
            m = (v0[4] + v1[4] + v2[4] + v3[4] + v4[4] + v5[4] + v6[4] + v7[4]) * 0.125
            out[0][gy, gx] = (x, y, z, w, m)
            out[1][gy, W - 1 - gx] = (-x, y, -z, w, m)
            out[2][H - 1 - gy, W - 1 - gx] = (-x, -y, -z, -w, m)
            out[3][H - 1 - gy, gx] = (x, -y, z, -w, m)
            out[4][gx, gy] = (y, x, w, z, m)
            out[5][gx, H - 1 - gy] = (-y, x, -w, z, m)
            out[6][W - 1 - gx, H - 1 - gy] = (-y, -x, -w, -z, m)
            out[7][W - 1 - gx, gy] = (y, -x, w, -z, m)
    return out


def _run_views_avg(views, n_pairs, has_mask):
    ga = jnp.stack([jnp.asarray(v) for v in views[:4]])[None]
    gb = jnp.stack([jnp.asarray(v) for v in views[4:]])[None]
    na, nb = frame.flow_views_avg(ga, gb, n_pairs=n_pairs, has_mask=has_mask)
    return np.asarray(na)[0], np.asarray(nb)[0]


def test_flow_views_avg_matches_v2_shader_oracle():
    H, W = 5, 7
    views = [RNG.normal(size=(H, W, 4)).astype(np.float32) for _ in range(4)]
    views += [RNG.normal(size=(W, H, 4)).astype(np.float32) for _ in range(4)]
    expected = shader_v2_flow_tta_avg(views)
    na, nb = _run_views_avg(views, n_pairs=2, has_mask=False)
    for k in range(4):
        np.testing.assert_allclose(na[k], expected[k], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(nb[k], expected[4 + k], rtol=1e-5, atol=1e-6)


def test_flow_views_avg_matches_v4_shader_oracle():
    H, W = 6, 4
    views = [RNG.normal(size=(H, W, 5)).astype(np.float32) for _ in range(4)]
    views += [RNG.normal(size=(W, H, 5)).astype(np.float32) for _ in range(4)]
    expected = shader_v4_flow_tta_avg(views)
    na, nb = _run_views_avg(views, n_pairs=2, has_mask=True)
    for k in range(4):
        np.testing.assert_allclose(na[k], expected[k], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(nb[k], expected[4 + k], rtol=1e-5, atol=1e-6)


def test_expand_views_geometry():
    x = RNG.normal(size=(1, 5, 7, 3)).astype(np.float32)
    ga, gb = frame.expand_views8(jnp.asarray(x))
    a = np.asarray(ga)[0]
    b = np.asarray(gb)[0]
    A = x[0]
    np.testing.assert_array_equal(a[0], A)
    np.testing.assert_array_equal(a[1], A[:, ::-1])
    np.testing.assert_array_equal(a[2], A[::-1, ::-1])
    np.testing.assert_array_equal(a[3], A[::-1, :])
    At = A.transpose(1, 0, 2)
    np.testing.assert_array_equal(b[0], At)
    np.testing.assert_array_equal(b[1], At[:, ::-1])
    np.testing.assert_array_equal(b[2], At[::-1, ::-1])
    np.testing.assert_array_equal(b[3], At[::-1, :])


def test_merge_views8_roundtrip():
    x = RNG.normal(size=(2, 6, 4, 3)).astype(np.float32)
    ga, gb = frame.expand_views8(jnp.asarray(x))
    merged = np.asarray(frame.merge_views8_mean(ga, gb))
    np.testing.assert_allclose(merged, x, rtol=1e-6, atol=1e-6)


def test_flow_views_avg_matches_shader_oracle():
    H, W = 5, 7
    views = [RNG.normal(size=(H, W, 2)).astype(np.float32) for _ in range(4)]
    views += [RNG.normal(size=(W, H, 2)).astype(np.float32) for _ in range(4)]
    expected = shader_flow_tta_avg(views)

    ga = jnp.stack([jnp.asarray(v) for v in views[:4]])[None]  # (1,4,H,W,2)
    gb = jnp.stack([jnp.asarray(v) for v in views[4:]])[None]  # (1,4,W,H,2)
    na, nb = frame.flow_views_avg(ga, gb, n_pairs=1, has_mask=False)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(na)[0, k], expected[k], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(nb)[0, k], expected[4 + k], rtol=1e-5, atol=1e-6
        )


def test_flow_views_avg_fixed_point_v4():
    """Scattering a canonical flow into 8 views then averaging must be a
    fixed point (consensus == canonical), incl. mask + passthrough chans."""
    B, H, W, C = 1, 4, 6, 6  # v4.6 layout: 4 flow + 1 mask + 1 passthrough
    canon = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    ga0 = jnp.zeros((B, 4, H, W, C))
    gb0 = jnp.zeros((B, 4, W, H, C))
    # scatter once (ignore passthrough), then average -> must reproduce
    ga1, gb1 = frame.flow_views_avg(
        ga0 + jnp.asarray(canon)[:, None] * 0, gb0, n_pairs=2, has_mask=True
    )
    # build consistent views by scattering canon through a avg of itself:
    ga_c = jnp.repeat(jnp.asarray(canon)[:, None], 4, axis=1)
    # use the library itself to produce a consistent scatter:
    ga2, gb2 = frame.flow_views_avg(
        frame.flow_views_avg(ga_c, jnp.swapaxes(ga_c, 2, 3), 2, True)[0],
        frame.flow_views_avg(ga_c, jnp.swapaxes(ga_c, 2, 3), 2, True)[1],
        2, True,
    )
    na, nb = frame.flow_views_avg(ga2, gb2, 2, True)
    np.testing.assert_allclose(np.asarray(na), np.asarray(ga2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(gb2), rtol=1e-5, atol=1e-5)


def test_temporal_merges():
    f = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
    fr = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
    m, mr = frame.flow_temporal_avg_v1(jnp.asarray(f), jnp.asarray(fr))
    np.testing.assert_allclose(np.asarray(m), (f - fr) / 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mr), -np.asarray(m), rtol=1e-6)

    f4 = RNG.normal(size=(1, 4, 4, 4)).astype(np.float32)
    fr4 = RNG.normal(size=(1, 4, 4, 4)).astype(np.float32)
    m4, mr4 = frame.flow_temporal_avg_v2(jnp.asarray(f4), jnp.asarray(fr4))
    exp = (f4 + np.concatenate([fr4[..., 2:], fr4[..., :2]], -1)) / 2
    np.testing.assert_allclose(np.asarray(m4), exp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mr4), np.concatenate([exp[..., 2:], exp[..., :2]], -1), rtol=1e-6
    )

    # v4 temporal: literal rife_v4_flow_tta_temporal_avg.comp algebra —
    # x=(x+z_rev)/2, y=(y+w_rev)/2, z=(z+x_rev)/2, w=(w+y_rev)/2,
    # m=(m-m_rev)/2; reversed blob gets (z,w,x,y,-m)
    f5 = RNG.normal(size=(1, 4, 4, 5)).astype(np.float32)
    fr5 = RNG.normal(size=(1, 4, 4, 5)).astype(np.float32)
    m5, mr5 = frame.flow_temporal_avg_v4(jnp.asarray(f5), jnp.asarray(fr5))
    exp_flow = (f5[..., :4] + np.concatenate([fr5[..., 2:4], fr5[..., :2]], -1)) / 2
    np.testing.assert_allclose(np.asarray(m5)[..., :4], exp_flow, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mr5)[..., :4],
        np.concatenate([exp_flow[..., 2:4], exp_flow[..., :2]], -1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m5)[..., 4], (f5[..., 4] - fr5[..., 4]) / 2, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(mr5)[..., 4], -np.asarray(m5)[..., 4], rtol=1e-6)


def test_pre_post_roundtrip_and_padding():
    img = RNG.integers(0, 256, (2, 30, 33, 3)).astype(np.uint8)
    x = frame.preprocess(jnp.asarray(img), 32, 64)
    assert x.shape == (2, 32, 64, 3)
    xn = np.asarray(x)
    assert xn[:, 30:].max() == 0.0 and xn[:, :, 33:].max() == 0.0
    back = np.asarray(frame.postprocess(x, 30, 33))
    np.testing.assert_array_equal(back, img)


def test_postprocess_floor_round_saturate():
    # floor(v*255 + 0.5): 0.5/255 rounds up to 1; out-of-range saturates
    x = jnp.asarray(
        np.array([[-0.5, 0.0, 0.4 / 255, 0.6 / 255, 1.0, 1.7]], np.float32)
    ).reshape(1, 1, 6, 1)
    out = np.asarray(frame.postprocess(x, 1, 6)).ravel()
    np.testing.assert_array_equal(out, [0, 0, 0, 1, 255, 255])


def test_timestep_plane():
    p = np.asarray(frame.timestep_plane(0.25, 2, 8, 8))
    assert p.shape == (2, 8, 8, 1)
    assert (p == 0.25).all()
