import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from frustum_convnet_tpu.ops.query_depth_point import (
    query_depth_point,
    query_depth_point_np,
    group_points,
)

_query = jax.jit(partial(query_depth_point, dis_z=0.5, nsample=8))
_group = jax.jit(group_points)


def test_matches_cuda_scan_semantics(rng):
    b, n, m, k = 3, 64, 10, 8
    z_pts = rng.uniform(0, 10, (b, n)).astype(np.float32)
    z_ref = rng.uniform(0, 10, (b, m)).astype(np.float32)
    idx_j, cnt_j = _query(jnp.asarray(z_pts), jnp.asarray(z_ref))
    idx_n, cnt_n = query_depth_point_np(z_pts, z_ref, 0.5, k)
    np.testing.assert_array_equal(np.asarray(cnt_j), cnt_n)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_n)


def test_dense_case_all_match(rng):
    """All points within window: indices must be 0..k-1 (first k in order)."""
    z_pts = np.full((1, 32), 5.0, dtype=np.float32)
    z_ref = np.full((1, 4), 5.1, dtype=np.float32)
    idx, cnt = _query(jnp.asarray(z_pts), jnp.asarray(z_ref))
    assert (np.asarray(cnt) == 8).all()
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], np.arange(8))


def test_empty_case(rng):
    z_pts = np.zeros((1, 16), dtype=np.float32)
    z_ref = np.full((1, 3), 100.0, dtype=np.float32)
    idx, cnt = _query(jnp.asarray(z_pts), jnp.asarray(z_ref))
    assert (np.asarray(cnt) == 0).all()
    assert (np.asarray(idx) == 0).all()


def test_partial_fill_repeats_first_hit(rng):
    z_pts = np.array([[9.0, 9.0, 5.0, 9.0, 5.2, 9.0, 9.0, 9.0, 9.0, 9.0]], dtype=np.float32)
    z_ref = np.array([[5.0]], dtype=np.float32)
    idx, cnt = _query(jnp.asarray(z_pts), jnp.asarray(z_ref))
    assert int(cnt[0, 0]) == 2
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [2, 4, 2, 2, 2, 2, 2, 2])


def test_group_points_centers_xyz(rng):
    b, n, m, kk = 2, 32, 5, 8
    pts = rng.normal(size=(b, n, 4)).astype(np.float32)
    ref = rng.normal(size=(b, m, 3)).astype(np.float32)
    idx, _ = _query(jnp.asarray(pts[..., 2]), jnp.asarray(ref[..., 2]))
    g = np.asarray(_group(jnp.asarray(pts), jnp.asarray(ref), idx))
    assert g.shape == (b, m, kk, 4)
    i = np.asarray(idx)
    for bi in range(b):
        for mi in range(m):
            for ki in range(kk):
                np.testing.assert_allclose(
                    g[bi, mi, ki, :3], pts[bi, i[bi, mi, ki], :3] - ref[bi, mi], atol=1e-6
                )
                np.testing.assert_allclose(g[bi, mi, ki, 3], pts[bi, i[bi, mi, ki], 3])


def test_realistic_shapes_fuzz(rng):
    """KITTI-like shapes, multiple windows — exact match vs oracle."""
    b, n = 2, 256
    z_pts = rng.uniform(0, 70, (b, n)).astype(np.float32)
    for dis_z, m, k in [(0.25, 64, 4), (2.0, 16, 16)]:
        z_ref = rng.uniform(0, 70, (b, m)).astype(np.float32)
        f = jax.jit(partial(query_depth_point, dis_z=dis_z, nsample=k))
        idx_j, cnt_j = f(jnp.asarray(z_pts), jnp.asarray(z_ref))
        idx_n, cnt_n = query_depth_point_np(z_pts, z_ref, dis_z, k)
        np.testing.assert_array_equal(np.asarray(cnt_j), cnt_n)
        np.testing.assert_array_equal(np.asarray(idx_j), idx_n)
