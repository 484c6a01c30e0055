import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from frustum_convnet_tpu.core import box_overlaps as bo
from frustum_convnet_tpu.core import geometry_np as gnp
from frustum_convnet_tpu.core import nms as np_nms
from frustum_convnet_tpu.core.iou_np import rotated_iou_bev_np, rotated_iou_3d_np
from frustum_convnet_tpu.ops.nms_jax import rotate_nms_3d_device


def test_bbox_overlaps_basic():
    a = np.array([[0, 0, 2, 2], [0, 0, 1, 1.0]])
    b = np.array([[1, 1, 3, 3.0], [0, 0, 2, 2.0]])
    m = bo.bbox_overlaps_2d(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0 / 7.0)
    np.testing.assert_allclose(m[0, 1], 1.0)
    assert m[1, 0] == 0.0
    m1 = bo.bbox_overlaps_1d(np.array([[0, 2.0]]), np.array([[1, 3.0]]))
    np.testing.assert_allclose(m1[0, 0], 1.0 / 3.0)
    m3 = bo.bbox_overlaps_3d(np.array([[0, 0, 0, 2, 2, 2.0]]),
                             np.array([[1, 1, 1, 3, 3, 3.0]]))
    np.testing.assert_allclose(m3[0, 0], 1.0 / 15.0)


def test_rbbox_converters_consistent(rng):
    boxes = np.column_stack([
        rng.uniform(-5, 5, 8), rng.uniform(-1, 1, 8), rng.uniform(-5, 5, 8),
        rng.uniform(1, 4, 8), rng.uniform(1, 2, 8), rng.uniform(1, 2, 8),
        rng.uniform(-np.pi, np.pi, 8),
    ])
    corners = bo.boxes3d2corners(boxes)
    assert corners.shape == (8, 8, 3)
    # footprint from rbbox2corner must match corners[:4, (0, 2)]
    bev = bo.rbbox2corner(boxes[:, [0, 2, 3, 4, 6]])
    np.testing.assert_allclose(bev, corners[:, :4][:, :, [0, 2]], atol=1e-9)
    standup = bo.corner2standup(corners)
    assert standup.shape == (8, 6)
    assert (standup[:, :3] <= standup[:, 3:]).all()


def test_rbbox_iou_matrix_vs_oracle(rng):
    boxes = np.column_stack([
        rng.uniform(-3, 3, 5), rng.uniform(-3, 3, 5),
        rng.uniform(1, 4, 5), rng.uniform(1, 2, 5), rng.uniform(-np.pi, np.pi, 5),
    ])
    m = bo.rbbox_iou(boxes, boxes)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-9)
    polys = bo.rbbox2corner(boxes)
    for i in range(5):
        for j in range(5):
            np.testing.assert_allclose(m[i, j], rotated_iou_bev_np(polys[i], polys[j]),
                                       atol=1e-9)


def test_device_nms_matches_host(rng):
    n, max_out = 24, 16
    centers = np.column_stack([rng.uniform(-6, 6, n), rng.uniform(-1, 1, n),
                               rng.uniform(-6, 6, n)]).astype(np.float32)
    sizes = rng.uniform(1, 4, (n, 3)).astype(np.float32)
    headings = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    f = jax.jit(partial(rotate_nms_3d_device, thresh=0.3, max_out=max_out))
    keep, cnt = f(jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(headings),
                  jnp.asarray(scores), jnp.ones(n, bool))
    keep = np.asarray(keep)[:int(cnt)].tolist()

    dets = np.column_stack([centers, sizes, headings, scores]).astype(np.float64)
    expected = np_nms.rotate_nms_3d(dets, 0.3, top_k=max_out)
    assert keep == expected
