"""Geometry op tests: identities, inverses, and parity with the reference math."""

import numpy as np
import jax.numpy as jnp

from sfmnext_tpu.ops import geometry as geo
from sfmnext_tpu.ops import sql_attention, losses, metrics


def make_K(b=2, w=16, h=12):
    K = np.array(
        [[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return np.broadcast_to(K, (b, 4, 4)).copy()


def test_backproject_project_identity():
    """project(backproject(depth)) with T=I recovers the pixel grid."""
    b, h, w = 2, 12, 16
    rng = np.random.RandomState(0)
    depth = (rng.rand(b, h, w, 1).astype(np.float32) * 10 + 0.5)
    K = make_K(b, w, h)
    inv_K = np.linalg.pinv(K)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4))

    pts = geo.backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    pix = geo.project_3d(pts, jnp.asarray(K), jnp.asarray(T), h, w)

    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    ex = (gx / (w - 1) - 0.5) * 2
    ey = (gy / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(pix[..., 0]), np.broadcast_to(ex, (b, h, w)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pix[..., 1]), np.broadcast_to(ey, (b, h, w)), atol=1e-4)


def test_transformation_invert_composes_to_identity():
    rng = np.random.RandomState(1)
    aa = rng.randn(3, 3).astype(np.float32) * 0.1
    t = rng.randn(3, 3).astype(np.float32) * 0.5
    Tf = geo.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=False)
    Tb = geo.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True)
    prod = np.asarray(jnp.matmul(Tf, Tb))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (3, 4, 4)), atol=1e-5)


def test_rot_from_axisangle_known_rotation():
    # 90 deg about z: x axis -> y axis
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(geo.rot_from_axisangle(aa))[0]
    np.testing.assert_allclose(R[:3, :3] @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_euler_to_mat_matches_reference_order():
    """R = Rx @ Ry @ Rz (layers.py:456)."""
    ang = np.array([[0.1, -0.2, 0.3]], dtype=np.float32)
    R = np.asarray(geo.euler_to_mat(jnp.asarray(ang)))[0]

    x, y, z = ang[0]
    Rz = np.array([[np.cos(z), -np.sin(z), 0], [np.sin(z), np.cos(z), 0], [0, 0, 1]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)], [0, np.sin(x), np.cos(x)]])
    np.testing.assert_allclose(R, Rx @ Ry @ Rz, atol=1e-6)


def test_disp_to_depth_range():
    disp = jnp.asarray([0.0, 0.5, 1.0])
    _, depth = geo.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(depth)[[0, 2]], [100.0, 0.1], rtol=1e-5)


def test_sql_full_query_matches_direct_computation():
    rng = np.random.RandomState(2)
    b, h, w, e, q = 2, 4, 6, 8, 5
    feats = rng.randn(b, h, w, e).astype(np.float32)
    queries = rng.randn(b, q, e).astype(np.float32)

    energy, summary = sql_attention.sql_full_query(jnp.asarray(feats), jnp.asarray(queries))

    s = feats.reshape(b, h * w, e)
    en = np.einsum("bne,bqe->bnq", s, queries)
    a = np.exp(en - en.max(1, keepdims=True))
    a = a / a.sum(1, keepdims=True)
    summ = np.einsum("bnq,bne->bqe", a, s)
    np.testing.assert_allclose(np.asarray(energy).reshape(b, h * w, q), en, atol=1e-5)
    np.testing.assert_allclose(np.asarray(summary), summ, atol=1e-5)


def test_sql_bins_to_depth_matches_unfused():
    rng = np.random.RandomState(3)
    b, h, w, q, d = 2, 4, 6, 5, 7
    energy = rng.randn(b, h, w, q).astype(np.float32)
    wgt = rng.randn(q, d).astype(np.float32)
    bias = rng.randn(d).astype(np.float32)
    centers = rng.rand(b, d).astype(np.float32) * 80

    depth = sql_attention.sql_bins_to_depth(
        jnp.asarray(energy), jnp.asarray(wgt), jnp.asarray(bias), jnp.asarray(centers)
    )

    logits = np.einsum("bhwq,qd->bhwd", energy, wgt) + bias
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expect = np.einsum("bhwd,bd->bhw", p, centers)[..., None]
    np.testing.assert_allclose(np.asarray(depth), expect, rtol=1e-4, atol=1e-5)


def test_min_reprojection_automask():
    b, h, w = 1, 4, 4
    lo = jnp.full((b, h, w, 1), 0.1)
    hi = jnp.full((b, h, w, 1), 0.9)
    # identity losses lower -> automask 0 (static pixel)
    val, mask = losses.min_reprojection_loss([hi, hi], [lo, lo], rng=None)
    np.testing.assert_allclose(np.asarray(val), 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), 0.0)
    # reprojection lower -> automask 1
    val, mask = losses.min_reprojection_loss([lo], [hi], rng=None)
    np.testing.assert_allclose(np.asarray(val), 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), 1.0)


def test_compute_depth_errors_perfect_prediction():
    gt = np.abs(np.random.RandomState(4).rand(100).astype(np.float32)) + 0.5
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = metrics.compute_depth_errors(gt, gt.copy())
    assert abs_rel == 0 and sq_rel == 0 and rmse == 0 and rmse_log == 0
    assert a1 == 1 and a2 == 1 and a3 == 1


def test_flip_postprocess_blend_weights_sum_to_one():
    rng = np.random.RandomState(5)
    a = rng.rand(2, 6, 32).astype(np.float32)
    # blending a with itself must return a
    out = metrics.flip_postprocess(a, a.copy())
    np.testing.assert_allclose(out, a, atol=1e-6)


def test_silog_zero_for_perfect():
    pred = jnp.asarray(np.random.RandomState(6).rand(50).astype(np.float32) + 0.5)
    val = losses.silog_loss(pred, pred)
    assert float(val) < 1e-3


def test_smoothness_zero_for_constant_disp():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(np.random.RandomState(7).rand(1, 8, 8, 3).astype(np.float32))
    assert float(losses.edge_aware_smoothness(disp, img)) == 0.0


def test_photo_and_geometry_loss_runs():
    from sfmnext_tpu.ops.losses import photo_and_geometry_loss

    rng = np.random.RandomState(8)
    b, h, w = 1, 16, 24
    tgt = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    ref = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    d = jnp.asarray(rng.rand(b, h, w, 1) * 5 + 1, jnp.float32)
    K3 = jnp.asarray(
        np.broadcast_to(
            np.array([[10.0, 0, 12], [0, 10, 8], [0, 0, 1]], np.float32),
            (b, 3, 3),
        )
    )
    pose = jnp.zeros((b, 6))
    photo, geo = photo_and_geometry_loss(
        tgt, [ref], d, [d], K3, [pose], [pose]
    )
    assert np.isfinite(float(photo)) and np.isfinite(float(geo))


def test_bins_chamfer_loss_zero_when_centers_match():
    from sfmnext_tpu.ops.losses import bins_chamfer_loss

    edges = jnp.asarray([[1.0, 3.0, 5.0]])  # centers 2, 4
    target = jnp.asarray([[2.0, 4.0, 2.0, 4.0]])
    val = float(bins_chamfer_loss(edges, target))
    assert val < 1e-6

    target2 = jnp.asarray([[2.0, 6.0]])
    assert float(bins_chamfer_loss(edges, target2)) > 0.5
