"""Sorted-grid fast query must be bit-identical to the dense top_k query."""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.ops.query_depth_point import (
    grid_max_run,
    query_depth_point,
    query_depth_point_grid,
    query_depth_point_np,
)


def check_equal(z_pts, z_ref, dz, k, run):
    fast = jax.jit(partial(query_depth_point_grid, dis_z=dz, nsample=k, max_run=run))
    idx_f, cnt_f = fast(jnp.asarray(z_pts), jnp.asarray(z_ref))
    idx_n, cnt_n = query_depth_point_np(z_pts, z_ref, dz, k)
    np.testing.assert_array_equal(np.asarray(cnt_f), cnt_n)
    np.testing.assert_array_equal(np.asarray(idx_f), idx_n)


def test_matches_oracle_on_plain_grid(rng):
    b, n = 3, 256
    for stride, dz, m, k in [(0.5, 0.5, 64, 16), (1.0, 1.0, 32, 8), (0.25, 0.25, 128, 4)]:
        z_pts = rng.uniform(0, m * stride, (b, n)).astype(np.float32)
        grid = (np.arange(m) * stride + stride / 2).astype(np.float32)
        z_ref = np.tile(grid, (b, 1))
        check_equal(z_pts, z_ref, dz, k, grid_max_run(dz, stride))


def test_matches_oracle_after_center_rotation(rng):
    """Provider-realistic ladder: back-projected grid rotated to center view."""
    b, n, m, stride = 2, 512, 80, 0.5
    P = np.array([[721.5, 0, 609.6, 44.9], [0, 721.5, 172.9, 0.2], [0, 0, 1, 0]])
    z_refs, z_ptss = [], []
    for _ in range(b):
        cx, cy = rng.uniform(100, 1100), rng.uniform(100, 300)
        z = np.arange(m) * stride + stride / 2
        uvd = np.stack([np.full(m, cx), np.full(m, cy), z], 1)
        ray = gnp.project_image_to_rect(uvd, P)
        ang = np.pi / 2 + -np.arctan2(ray[m // 2, 2], ray[m // 2, 0])
        ref_rot = gnp.rotate_pc_along_y(ray, ang)
        assert np.all(np.diff(ref_rot[:, 2]) > 0), "ladder must stay ascending"
        z_refs.append(ref_rot[:, 2])
        z_ptss.append(rng.uniform(0, m * stride, n))
    z_ref = np.stack(z_refs).astype(np.float32)
    z_pts = np.stack(z_ptss).astype(np.float32)
    check_equal(z_pts, z_ref, stride, 16, grid_max_run(stride, stride))


def test_matches_dense_query(rng):
    b, n, m, stride, dz, k = 2, 256, 48, 0.5, 0.5, 32
    z_pts = rng.uniform(0, m * stride, (b, n)).astype(np.float32)
    grid = (np.arange(m) * stride + stride / 2).astype(np.float32)
    z_ref = np.tile(grid, (b, 1))
    dense = jax.jit(partial(query_depth_point, dis_z=dz, nsample=k))
    fast = jax.jit(partial(query_depth_point_grid, dis_z=dz, nsample=k,
                           max_run=grid_max_run(dz, stride)))
    i1, c1 = dense(jnp.asarray(z_pts), jnp.asarray(z_ref))
    i2, c2 = fast(jnp.asarray(z_pts), jnp.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_empty_and_dense_sections(rng):
    # clustered points: some sections overflow nsample, some are empty
    b, n, m, stride = 1, 128, 16, 1.0
    z_pts = np.concatenate([
        np.full(100, 3.2), rng.uniform(10, 16, 28)
    ])[None].astype(np.float32)
    grid = (np.arange(m) * stride + stride / 2).astype(np.float32)[None]
    check_equal(z_pts, grid, 1.0, 8, grid_max_run(1.0, stride))
