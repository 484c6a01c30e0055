// boxgeom: rotated-box geometry kernels for the host-side runtime.
//
// Native equivalents of the reference's pybind11/boost ops
// (/root/reference/ops/pybind11/box_ops.h, nms_cpu.h) built fresh on a
// Sutherland-Hodgman convex clip (no boost): BEV/3D rotated IoU (pairwise,
// paired, and matrix forms) and greedy NMS (axis-aligned / BEV / 3D).
// Exposed as a C ABI for ctypes binding (pybind11 is not available in the
// target image).
//
// Box corner conventions match the Python side
// (frustum_convnet_tpu/core/geometry_np.py::box3d_corners): 8 corners, the
// first 4 spanning the y=+h/2 face; BEV footprint = corners 0..3 in (x, z).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct P2 {
  double x, y;
};

inline double cross(const P2& o, const P2& a, const P2& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

double signed_area(const std::vector<P2>& p) {
  double s = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const P2& a = p[i];
    const P2& b = p[(i + 1) % p.size()];
    s += a.x * b.y - b.x * a.y;
  }
  return 0.5 * s;
}

// Clip convex polygon `subject` by convex CCW polygon `clip`.
std::vector<P2> clip_poly(std::vector<P2> subject, std::vector<P2> clip) {
  if (signed_area(clip) < 0) std::reverse(clip.begin(), clip.end());
  if (signed_area(subject) < 0) std::reverse(subject.begin(), subject.end());
  std::vector<P2> output = subject;
  for (size_t i = 0; i < clip.size() && !output.empty(); ++i) {
    const P2 a = clip[i];
    const P2 b = clip[(i + 1) % clip.size()];
    std::vector<P2> input;
    input.swap(output);
    for (size_t j = 0; j < input.size(); ++j) {
      const P2 cur = input[j];
      const P2 prv = input[(j + input.size() - 1) % input.size()];
      const bool cur_in = cross(a, b, cur) >= 0;
      const bool prv_in = cross(a, b, prv) >= 0;
      if (cur_in != prv_in) {
        // intersection of segment prv->cur with line a->b
        const double dx = cur.x - prv.x, dy = cur.y - prv.y;
        const double ex = b.x - a.x, ey = b.y - a.y;
        const double denom = ex * dy - ey * dx;
        if (std::fabs(denom) > 1e-14) {
          const double t = (ex * (a.y - prv.y) - ey * (a.x - prv.x)) / denom;
          output.push_back({prv.x + t * dx, prv.y + t * dy});
        } else {
          output.push_back(cur);
        }
      }
      if (cur_in) output.push_back(cur);
    }
  }
  return output;
}

double poly_area(const std::vector<P2>& p) {
  if (p.size() < 3) return 0.0;
  return std::fabs(signed_area(p));
}

// corners: (8, 3) row-major; footprint polygon from corners 0..3 in (x, z)
std::vector<P2> bev_poly(const double* c) {
  std::vector<P2> p(4);
  for (int i = 0; i < 4; ++i) p[i] = {c[i * 3 + 0], c[i * 3 + 2]};
  return p;
}

void iou_bev_3d(const double* c1, const double* c2, double* bev, double* i3d) {
  std::vector<P2> p1 = bev_poly(c1), p2 = bev_poly(c2);
  const double inter = poly_area(clip_poly(p1, p2));
  const double a1 = poly_area(p1), a2 = poly_area(p2);
  const double ub = a1 + a2 - inter;
  *bev = ub > 0 ? inter / ub : 0.0;

  double ymin1 = 1e30, ymax1 = -1e30, ymin2 = 1e30, ymax2 = -1e30;
  for (int i = 0; i < 8; ++i) {
    ymin1 = std::min(ymin1, c1[i * 3 + 1]);
    ymax1 = std::max(ymax1, c1[i * 3 + 1]);
    ymin2 = std::min(ymin2, c2[i * 3 + 1]);
    ymax2 = std::max(ymax2, c2[i * 3 + 1]);
  }
  const double yov = std::max(0.0, std::min(ymax1, ymax2) - std::max(ymin1, ymin2));
  const double inter3 = inter * yov;
  const double u3 = a1 * (ymax1 - ymin1) + a2 * (ymax2 - ymin2) - inter3;
  *i3d = u3 > 0 ? inter3 / u3 : 0.0;
}

void corners_from_params(const double* det7, double* out /*24*/) {
  // det7 = (cx, cy, cz, l, w, h, ry); reference corner order
  static const double sx[8] = {1, 1, -1, -1, 1, 1, -1, -1};
  static const double sy[8] = {1, 1, 1, 1, -1, -1, -1, -1};
  static const double sz[8] = {1, -1, -1, 1, 1, -1, -1, 1};
  const double c = std::cos(det7[6]), s = std::sin(det7[6]);
  for (int i = 0; i < 8; ++i) {
    const double x = 0.5 * det7[3] * sx[i];
    const double y = 0.5 * det7[5] * sy[i];
    const double z = 0.5 * det7[4] * sz[i];
    out[i * 3 + 0] = c * x + s * z + det7[0];
    out[i * 3 + 1] = y + det7[1];
    out[i * 3 + 2] = -s * x + c * z + det7[2];
  }
}

}  // namespace

extern "C" {

// Paired IoU: corners1/corners2 (n, 8, 3) -> out (n, 2) [bev, 3d].
// Mirrors the training-metric op rbbox_iou_3d_pair (box_ops.h:173-260).
void rbbox_iou_3d_pair(const double* corners1, const double* corners2,
                       int64_t n, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    iou_bev_3d(corners1 + i * 24, corners2 + i * 24, out + i * 2, out + i * 2 + 1);
  }
}

// Full 3D IoU matrix: (n, 8, 3) x (k, 8, 3) -> out (n, k). The row box's
// polygon / area / y-extent are hoisted out of the inner loop (same shape
// as rbbox_iou_bev_matrix below) instead of re-deriving them k times via
// iou_bev_3d.
void rbbox_iou_3d_matrix(const double* corners1, const double* corners2,
                         int64_t n, int64_t k, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* c1 = corners1 + i * 24;
    std::vector<P2> p1 = bev_poly(c1);
    const double a1 = poly_area(p1);
    double ymin1 = 1e30, ymax1 = -1e30;
    for (int v = 0; v < 8; ++v) {
      ymin1 = std::min(ymin1, c1[v * 3 + 1]);
      ymax1 = std::max(ymax1, c1[v * 3 + 1]);
    }
    for (int64_t j = 0; j < k; ++j) {
      const double* c2 = corners2 + j * 24;
      std::vector<P2> p2 = bev_poly(c2);
      const double inter = poly_area(clip_poly(p1, p2));
      const double a2 = poly_area(p2);
      double ymin2 = 1e30, ymax2 = -1e30;
      for (int v = 0; v < 8; ++v) {
        ymin2 = std::min(ymin2, c2[v * 3 + 1]);
        ymax2 = std::max(ymax2, c2[v * 3 + 1]);
      }
      const double yov =
          std::max(0.0, std::min(ymax1, ymax2) - std::max(ymin1, ymin2));
      const double inter3 = inter * yov;
      const double u3 = a1 * (ymax1 - ymin1) + a2 * (ymax2 - ymin2) - inter3;
      out[i * k + j] = u3 > 0 ? inter3 / u3 : 0.0;
    }
  }
}

// BEV IoU matrix over (x, z) footprints of corner boxes.
void rbbox_iou_bev_matrix(const double* corners1, const double* corners2,
                          int64_t n, int64_t k, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    std::vector<P2> p1 = bev_poly(corners1 + i * 24);
    const double a1 = poly_area(p1);
    for (int64_t j = 0; j < k; ++j) {
      std::vector<P2> p2 = bev_poly(corners2 + j * 24);
      const double inter = poly_area(clip_poly(p1, p2));
      const double u = a1 + poly_area(p2) - inter;
      out[i * k + j] = u > 0 ? inter / u : 0.0;
    }
  }
}

// Greedy 3D rotated NMS. dets (n, 8) = (cx, cy, cz, l, w, h, ry, score).
// Returns number kept; keep indices written to `keep` (capacity >= n).
int64_t rotate_nms_3d(const double* dets, int64_t n, double thresh,
                      int64_t top_k, int64_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets[a * 8 + 7] > dets[b * 8 + 7];
  });
  std::vector<double> corners(n * 24);
  for (int64_t i = 0; i < n; ++i) corners_from_params(dets + i * 8, corners.data() + i * 24);

  std::vector<char> removed(n, 0);
  int64_t n_keep = 0;
  for (size_t oi = 0; oi < order.size() && n_keep < top_k; ++oi) {
    const int64_t i = order[oi];
    if (removed[i]) continue;
    keep[n_keep++] = i;
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int64_t j = order[oj];
      if (removed[j]) continue;
      double bev, i3d;
      iou_bev_3d(corners.data() + i * 24, corners.data() + j * 24, &bev, &i3d);
      if (i3d > thresh) removed[j] = 1;
    }
  }
  return n_keep;
}

// Greedy BEV rotated NMS. dets (n, 6) = (cx, cz, l, w, ry, score).
int64_t rotate_nms_bev(const double* dets, int64_t n, double thresh,
                       int64_t top_k, int64_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets[a * 6 + 5] > dets[b * 6 + 5];
  });
  std::vector<std::vector<P2>> polys(n);
  for (int64_t i = 0; i < n; ++i) {
    const double* d = dets + i * 6;
    const double c = std::cos(d[4]), s = std::sin(d[4]);
    static const double sx[4] = {1, 1, -1, -1};
    static const double sz[4] = {1, -1, -1, 1};
    polys[i].resize(4);
    for (int k2 = 0; k2 < 4; ++k2) {
      const double x = 0.5 * d[2] * sx[k2], z = 0.5 * d[3] * sz[k2];
      polys[i][k2] = {c * x + s * z + d[0], -s * x + c * z + d[1]};
    }
  }
  std::vector<char> removed(n, 0);
  int64_t n_keep = 0;
  for (size_t oi = 0; oi < order.size() && n_keep < top_k; ++oi) {
    const int64_t i = order[oi];
    if (removed[i]) continue;
    keep[n_keep++] = i;
    const double ai = poly_area(polys[i]);
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int64_t j = order[oj];
      if (removed[j]) continue;
      const double inter = poly_area(clip_poly(polys[i], polys[j]));
      const double u = ai + poly_area(polys[j]) - inter;
      if (u > 0 && inter / u > thresh) removed[j] = 1;
    }
  }
  return n_keep;
}

// Axis-aligned NMS. boxes (n, 4) xyxy + scores (n).
int64_t nms_axis_aligned(const double* boxes, const double* scores, int64_t n,
                         double thresh, int64_t top_k, int64_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<char> removed(n, 0);
  int64_t n_keep = 0;
  for (size_t oi = 0; oi < order.size() && n_keep < top_k; ++oi) {
    const int64_t i = order[oi];
    if (removed[i]) continue;
    keep[n_keep++] = i;
    const double ai = (boxes[i * 4 + 2] - boxes[i * 4]) * (boxes[i * 4 + 3] - boxes[i * 4 + 1]);
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int64_t j = order[oj];
      if (removed[j]) continue;
      const double xx1 = std::max(boxes[i * 4], boxes[j * 4]);
      const double yy1 = std::max(boxes[i * 4 + 1], boxes[j * 4 + 1]);
      const double xx2 = std::min(boxes[i * 4 + 2], boxes[j * 4 + 2]);
      const double yy2 = std::min(boxes[i * 4 + 3], boxes[j * 4 + 3]);
      const double inter = std::max(0.0, xx2 - xx1) * std::max(0.0, yy2 - yy1);
      const double aj = (boxes[j * 4 + 2] - boxes[j * 4]) * (boxes[j * 4 + 3] - boxes[j * 4 + 1]);
      if (ai + aj - inter > 0 && inter / (ai + aj - inter) > thresh) removed[j] = 1;
    }
  }
  return n_keep;
}

}  // extern "C"
