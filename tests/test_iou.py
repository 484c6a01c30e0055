import numpy as np
import jax
import jax.numpy as jnp

from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core import iou as jiou
from frustum_convnet_tpu.core import iou_np

# NOTE: eager (non-jit) dispatch is extremely slow in this environment;
# always jit the functions under test.
_iou_pair = jax.jit(jiou.iou_pair_3d)
_iou_matrix = jax.jit(jiou.iou_matrix_3d)


def random_box_params(rng, spread=3.0):
    center = np.array([rng.uniform(-spread, spread), rng.uniform(-1, 1),
                       rng.uniform(-spread, spread)])
    size = rng.uniform(0.5, 4.0, 3)
    heading = rng.uniform(-np.pi, np.pi)
    return center, size, heading


def random_box(rng, spread=3.0):
    return gnp.box3d_corners(*random_box_params(rng, spread))


def perturbed_box(rng, center, size, heading):
    """A nearby valid box (parameter-space noise keeps corners a real box)."""
    return gnp.box3d_corners(
        center + rng.normal(0, 0.3, 3),
        np.maximum(size + rng.normal(0, 0.2, 3), 0.2),
        heading + rng.normal(0, 0.3),
    )


def test_identical_boxes_iou_one(rng):
    c = random_box(rng)
    bev, i3d = _iou_pair(jnp.asarray(c[None]), jnp.asarray(c[None]))
    assert abs(float(bev[0]) - 1.0) < 1e-5
    assert abs(float(i3d[0]) - 1.0) < 1e-5


def test_disjoint_boxes_iou_zero(rng):
    c1 = gnp.box3d_corners([0, 0, 0], [2, 2, 2], 0.3)
    c2 = gnp.box3d_corners([100, 0, 100], [2, 2, 2], -0.5)
    bev, i3d = _iou_pair(jnp.asarray(c1[None]), jnp.asarray(c2[None]))
    assert float(bev[0]) == 0.0
    assert float(i3d[0]) == 0.0


def test_axis_aligned_analytic():
    # two unit cubes overlapping by half along x
    c1 = gnp.box3d_corners([0, 0, 0], [1, 1, 1], 0.0)
    c2 = gnp.box3d_corners([0.5, 0, 0], [1, 1, 1], 0.0)
    bev, i3d = _iou_pair(jnp.asarray(c1[None]), jnp.asarray(c2[None]))
    np.testing.assert_allclose(float(bev[0]), 0.5 / 1.5, atol=1e-6)
    np.testing.assert_allclose(float(i3d[0]), 0.5 / 1.5, atol=1e-6)


def test_contained_box(rng):
    c1 = gnp.box3d_corners([0, 0, 0], [4, 4, 4], 0.7)
    c2 = gnp.box3d_corners([0, 0, 0], [2, 2, 2], -0.2)
    bev, i3d = _iou_pair(jnp.asarray(c1[None]), jnp.asarray(c2[None]))
    np.testing.assert_allclose(float(bev[0]), 4.0 / 16.0, atol=1e-5)
    np.testing.assert_allclose(float(i3d[0]), 8.0 / 64.0, atol=1e-5)


def test_jax_iou_matches_numpy_oracle(rng):
    n = 64
    c1_list, c2_list = [], []
    for i in range(n):
        center, size, heading = random_box_params(rng)
        c1_list.append(gnp.box3d_corners(center, size, heading))
        if i % 2 == 0:
            c2_list.append(perturbed_box(rng, center, size, heading))
        else:
            c2_list.append(random_box(rng))
    c1, c2 = np.stack(c1_list), np.stack(c2_list)
    bev_j, i3d_j = _iou_pair(jnp.asarray(c1), jnp.asarray(c2))
    for i in range(n):
        bev_n, i3d_n = iou_np.rotated_iou_3d_np(c1[i], c2[i])
        np.testing.assert_allclose(float(bev_j[i]), bev_n, atol=2e-4, err_msg=f"pair {i} bev")
        np.testing.assert_allclose(float(i3d_j[i]), i3d_n, atol=2e-4, err_msg=f"pair {i} 3d")


def test_iou_matrix_matches_oracle(rng):
    n, k = 4, 5
    c1 = np.stack([random_box(rng, spread=1.5) for _ in range(n)])
    c2 = np.stack([random_box(rng, spread=1.5) for _ in range(k)])
    mat = np.asarray(_iou_matrix(jnp.asarray(c1), jnp.asarray(c2)))
    for i in range(n):
        for j in range(k):
            _, i3d_n = iou_np.rotated_iou_3d_np(c1[i], c2[j])
            np.testing.assert_allclose(mat[i, j], i3d_n, atol=2e-4)


def test_near_degenerate_boxes_agree_across_all_implementations(rng):
    """SURVEY §7 hard-parts: rotated IoU on adversarial near-degenerate
    configurations — edge-touching, vertex-touching, sliver overlaps,
    near-identical with epsilon rotation — must agree between the device
    IoU, the numpy polygon oracle, and the native C++ library."""
    import jax.numpy as jnp
    from frustum_convnet_tpu.core import geometry_np as gnp
    from frustum_convnet_tpu.core import iou_np
    from frustum_convnet_tpu.core.iou import iou_pair_3d
    from frustum_convnet_tpu.ops import native

    cases = []
    # edge-touching (share the x=1 edge exactly)
    cases.append(((0.0, 0.0, 0.0), (2, 2, 2), 0.0,
                  (2.0, 0.0, 0.0), (2, 2, 2), 0.0))
    # vertex-touching (corner contact only)
    cases.append(((0.0, 0.0, 0.0), (2, 2, 2), 0.0,
                  (2.0, 0.0, 2.0), (2, 2, 2), 0.0))
    # epsilon rotation of an identical box
    cases.append(((0.0, 0.0, 0.0), (4, 2, 1.5), 0.3,
                  (0.0, 0.0, 0.0), (4, 2, 1.5), 0.3 + 1e-7))
    # sliver overlap (tiny intersection strip)
    cases.append(((0.0, 0.0, 0.0), (2, 2, 2), 0.0,
                  (1.999, 0.0, 0.0), (2, 2, 2), 0.0))
    # 45-degree cross through the center
    cases.append(((0.0, 0.0, 0.0), (4, 1, 1), 0.0,
                  (0.0, 0.0, 0.0), (4, 1, 1), np.pi / 4))
    # near-flat box (degenerate height)
    cases.append(((0.0, 0.0, 0.0), (2, 2, 1e-6), 0.1,
                  (0.1, 0.0, 0.1), (2, 2, 1.0), 0.2))
    # random near-coincident pairs
    for _ in range(20):
        c = rng.uniform(-3, 3, 3)
        s = rng.uniform(0.5, 3.0, 3)
        h = rng.uniform(-np.pi, np.pi)
        cases.append((tuple(c), tuple(s), h,
                      tuple(c + rng.normal(0, 1e-4, 3)), tuple(s), h + rng.normal(0, 1e-4)))

    A = np.stack([gnp.box3d_corners(np.array(a), np.array(sa), ha)
                  for a, sa, ha, *_ in cases])
    B = np.stack([gnp.box3d_corners(np.array(b), np.array(sb), hb)
                  for *_, b, sb, hb in cases])

    # numpy oracle (slow polygon clip)
    np_bev = np.array([iou_np.rotated_iou_3d_np(a, b)[0] for a, b in zip(A, B)])
    np_3d = np.array([iou_np.rotated_iou_3d_np(a, b)[1] for a, b in zip(A, B)])
    # device (vectorized Sutherland-Hodgman)
    dev_bev, dev_3d = (np.asarray(x) for x in iou_pair_3d(jnp.asarray(A), jnp.asarray(B)))
    # native C++ (pair op)
    nat = native.rbbox_iou_3d_pair(A, B)

    np.testing.assert_allclose(dev_bev, np_bev, atol=2e-4)
    np.testing.assert_allclose(dev_3d, np_3d, atol=2e-4)
    np.testing.assert_allclose(nat[:, 0], np_bev, atol=1e-6)
    np.testing.assert_allclose(nat[:, 1], np_3d, atol=1e-6)
    # sanity on the hand-constructed cases
    assert np_3d[0] < 1e-6          # edge touch: zero volume overlap
    assert np_3d[1] < 1e-6          # vertex touch
    assert np_3d[2] > 0.999         # epsilon rotation ~ identical
    assert 0.0 < np_3d[3] < 0.01    # sliver
