// kitti_eval_tpu: standalone KITTI AP evaluator (official protocol), no boost.
//
// Native counterpart of the reference's offline evaluator
// (/root/reference/train/kitti_eval/evaluate_object_3d_offline.cpp): 41
// recall points, difficulty gates MIN_HEIGHT {40,25,25} / MAX_OCCLUSION
// {0,1,2} / MAX_TRUNCATION {.15,.3,.5}, min overlap 0.7 car / 0.5
// ped+cyc, neighboring-class ignores, DontCare regions, three metrics
// (image bbox / BEV / 3D) + AOS, 11-point AP. Geometry is the shared
// Sutherland-Hodgman clip from boxgeom.cc (fresh implementation).
//
// Usage: kitti_eval_tpu <gt_dir> <result_dir> [--protocol offline|server]
// (results in result_dir/data). Prints "<cls>_detection[_ground|_3d] AP:
// e m h" and writes stats_<cls>_<metric>.txt precision curves into
// result_dir. `--protocol server` selects the KITTI submission-server
// variant (/root/reference/train/kitti_eval/evaluate_object.cpp): strict
// gt height gate, full-image-set requirement, per-class 3D-field gating.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

namespace {

constexpr int N_SAMPLE_PTS = 41;
const double MIN_HEIGHT[3] = {40.0, 25.0, 25.0};
const int MAX_OCCLUSION[3] = {0, 1, 2};
const double MAX_TRUNCATION[3] = {0.15, 0.3, 0.5};
constexpr double NO_DETECTION = -1e9;

struct Box {
  std::string type;
  double trunc = -1, alpha = -10;
  int occ = -1;
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;
  double h = -1, w = -1, l = -1;
  double tx = -1000, ty = -1000, tz = -1000, ry = -10;
  double score = 0;
};

std::string lower(std::string s) {
  for (auto& c : s) c = std::tolower(c);
  return s;
}

std::vector<Box> load_boxes(const std::string& path, bool is_det) {
  std::vector<Box> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    Box b;
    ss >> b.type >> b.trunc >> b.occ >> b.alpha >> b.x1 >> b.y1 >> b.x2 >> b.y2
       >> b.h >> b.w >> b.l >> b.tx >> b.ty >> b.tz >> b.ry;
    if (is_det) ss >> b.score;
    b.type = lower(b.type);
    out.push_back(b);
  }
  return out;
}

// ---- geometry (shared with boxgeom.cc style) ----
struct P2 {
  double x, y;
};

double sarea(const std::vector<P2>& p) {
  double s = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    s += p[i].x * p[(i + 1) % p.size()].y - p[(i + 1) % p.size()].x * p[i].y;
  }
  return 0.5 * s;
}

std::vector<P2> clip_poly(std::vector<P2> subject, std::vector<P2> clip) {
  if (sarea(clip) < 0) std::reverse(clip.begin(), clip.end());
  if (sarea(subject) < 0) std::reverse(subject.begin(), subject.end());
  std::vector<P2> output = subject;
  for (size_t i = 0; i < clip.size() && !output.empty(); ++i) {
    P2 a = clip[i], b = clip[(i + 1) % clip.size()];
    std::vector<P2> input;
    input.swap(output);
    auto side = [&](const P2& p) {
      return (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) >= 0;
    };
    for (size_t j = 0; j < input.size(); ++j) {
      P2 cur = input[j], prv = input[(j + input.size() - 1) % input.size()];
      bool ci = side(cur), pi = side(prv);
      if (ci != pi) {
        double dx = cur.x - prv.x, dy = cur.y - prv.y;
        double ex = b.x - a.x, ey = b.y - a.y;
        double denom = ex * dy - ey * dx;
        if (std::fabs(denom) > 1e-14) {
          double t = (ex * (a.y - prv.y) - ey * (a.x - prv.x)) / denom;
          output.push_back({prv.x + t * dx, prv.y + t * dy});
        } else {
          output.push_back(cur);
        }
      }
      if (ci) output.push_back(cur);
    }
  }
  return output;
}

double parea(const std::vector<P2>& p) { return p.size() < 3 ? 0.0 : std::fabs(sarea(p)); }

std::vector<P2> footprint(const Box& b) {
  static const double sx[4] = {1, 1, -1, -1};
  static const double sz[4] = {1, -1, -1, 1};
  const double c = std::cos(b.ry), s = std::sin(b.ry);
  std::vector<P2> p(4);
  for (int i = 0; i < 4; ++i) {
    double x = 0.5 * b.l * sx[i], z = 0.5 * b.w * sz[i];
    p[i] = {c * x + s * z + b.tx, -s * x + c * z + b.tz};
  }
  return p;
}

// criterion: -1 union, 0 over det area (DontCare)
double image_overlap(const Box& d, const Box& g, int criterion) {
  double ix = std::max(0.0, std::min(d.x2, g.x2) - std::max(d.x1, g.x1));
  double iy = std::max(0.0, std::min(d.y2, g.y2) - std::max(d.y1, g.y1));
  double inter = ix * iy;
  double ad = (d.x2 - d.x1) * (d.y2 - d.y1), ag = (g.x2 - g.x1) * (g.y2 - g.y1);
  double denom = criterion == 0 ? ad : ad + ag - inter;
  return denom > 0 ? inter / denom : 0.0;
}

double overlap(const Box& d, const Box& g, int metric) {
  if (metric == 0) return image_overlap(d, g, -1);
  std::vector<P2> pd = footprint(d), pg = footprint(g);
  double inter = parea(clip_poly(pd, pg));
  double ad = parea(pd), ag = parea(pg);
  if (metric == 1) {
    double u = ad + ag - inter;
    return u > 0 ? inter / u : 0.0;
  }
  // 3D: y (vertical) spans are [ty - h, ty] (KITTI bottom-anchored labels)
  double yov = std::max(0.0, std::min(d.ty, g.ty) - std::max(d.ty - d.h, g.ty - g.h));
  double i3 = inter * yov;
  double u3 = ad * d.h + ag * g.h - i3;
  return u3 > 0 ? i3 / u3 : 0.0;
}

struct Cleaned {
  std::vector<int> ig_gt, ig_det;
  std::vector<Box> dontcare;
  int n_gt = 0;
};

// KITTI-server protocol variant (`evaluate_object.cpp` vs the offline
// binary): gt gate `height <= MIN_HEIGHT` instead of `<`; selected by
// `--protocol server` in main().
bool g_strict_height = false;

Cleaned clean_data(const std::vector<Box>& gts, const std::vector<Box>& dets,
                   const std::string& cls, int difficulty) {
  Cleaned c;
  for (const auto& g : gts) {
    int valid;
    if (g.type == cls) valid = 1;
    else if (cls == "car" && g.type == "van") valid = 0;
    else if (cls == "pedestrian" && g.type == "person_sitting") valid = 0;
    else valid = -1;
    double height = g.y2 - g.y1;
    bool too_small = g_strict_height ? height <= MIN_HEIGHT[difficulty]
                                     : height < MIN_HEIGHT[difficulty];
    bool ignore = g.occ > MAX_OCCLUSION[difficulty] ||
                  g.trunc > MAX_TRUNCATION[difficulty] || too_small;
    if (valid == 1 && !ignore) {
      c.ig_gt.push_back(0);
      ++c.n_gt;
    } else if (valid == 0 || (ignore && valid == 1)) {
      c.ig_gt.push_back(1);
    } else {
      c.ig_gt.push_back(-1);
    }
    if (g.type == "dontcare") c.dontcare.push_back(g);
  }
  for (const auto& d : dets) {
    if (d.type != cls) c.ig_det.push_back(-1);
    else if ((d.y2 - d.y1) < MIN_HEIGHT[difficulty]) c.ig_det.push_back(1);
    else c.ig_det.push_back(0);
  }
  return c;
}

struct Stats {
  long tp = 0, fp = 0, fn = 0;
  double sim = -1;
  std::vector<double> scores;
};

// Threshold-independent pairwise overlaps for one image, computed once per
// (image, metric) and reused across all recall thresholds (the polygon clip
// is the evaluator's hot spot; recomputing it ~41x per pair dominated).
struct Overlaps {
  std::vector<double> gt;  // gts.size() x dets.size(), row-major
  std::vector<double> dc;  // dontcare.size() x dets.size()
};

Overlaps pairwise_overlaps(const std::vector<Box>& gts,
                           const std::vector<Box>& dets, const Cleaned& c,
                           int metric) {
  Overlaps ov;
  ov.gt.resize(gts.size() * dets.size());
  for (size_t i = 0; i < gts.size(); ++i)
    for (size_t j = 0; j < dets.size(); ++j)
      ov.gt[i * dets.size() + j] = overlap(dets[j], gts[i], metric);
  ov.dc.resize(c.dontcare.size() * dets.size());
  for (size_t ci = 0; ci < c.dontcare.size(); ++ci)
    for (size_t j = 0; j < dets.size(); ++j)
      ov.dc[ci * dets.size() + j] = image_overlap(dets[j], c.dontcare[ci], 0);
  return ov;
}

Stats compute_statistics(const std::vector<Box>& gts, const std::vector<Box>& dets,
                         const Cleaned& c, bool compute_fp, int metric,
                         double min_overlap, double thresh, bool compute_aos,
                         const Overlaps& pair_ov) {
  Stats st;
  std::vector<char> assigned(dets.size(), 0);
  std::vector<char> ignored_threshold(dets.size(), 0);
  if (compute_fp) {
    for (size_t j = 0; j < dets.size(); ++j) {
      if (dets[j].score < thresh) ignored_threshold[j] = 1;
    }
  }
  std::vector<double> deltas;
  for (size_t i = 0; i < gts.size(); ++i) {
    if (c.ig_gt[i] == -1) continue;
    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;
    for (size_t j = 0; j < dets.size(); ++j) {
      if (c.ig_det[j] == -1 || assigned[j] || ignored_threshold[j]) continue;
      double ov = pair_ov.gt[i * dets.size() + j];
      if (!compute_fp) {
        if (ov > min_overlap && dets[j].score > valid_detection) {
          det_idx = (int)j;
          valid_detection = dets[j].score;
        }
      } else {
        if (ov > min_overlap && (ov > max_overlap || assigned_ignored_det) &&
            c.ig_det[j] == 0) {
          max_overlap = ov;
          det_idx = (int)j;
          valid_detection = 1;
          assigned_ignored_det = false;
        } else if (ov > min_overlap && valid_detection == NO_DETECTION &&
                   c.ig_det[j] == 1) {
          det_idx = (int)j;
          valid_detection = 1;
          assigned_ignored_det = true;
        }
      }
    }
    if (valid_detection == NO_DETECTION && c.ig_gt[i] == 0) {
      ++st.fn;
    } else if (valid_detection != NO_DETECTION &&
               (c.ig_gt[i] == 1 || c.ig_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DETECTION) {
      ++st.tp;
      st.scores.push_back(dets[det_idx].score);
      if (compute_aos) deltas.push_back(gts[i].alpha - dets[det_idx].alpha);
      assigned[det_idx] = 1;
    }
  }
  if (compute_fp) {
    for (size_t j = 0; j < dets.size(); ++j) {
      if (!(assigned[j] || c.ig_det[j] == -1 || c.ig_det[j] == 1 ||
            ignored_threshold[j]))
        ++st.fp;
    }
    long nstuff = 0;
    for (size_t ci = 0; ci < c.dontcare.size(); ++ci) {
      for (size_t j = 0; j < dets.size(); ++j) {
        if (assigned[j] || c.ig_det[j] == -1 || c.ig_det[j] == 1 ||
            ignored_threshold[j])
          continue;
        if (pair_ov.dc[ci * dets.size() + j] > min_overlap) {
          assigned[j] = 1;
          ++nstuff;
        }
      }
    }
    st.fp -= nstuff;
    if (compute_aos) {
      double sim = 0;
      for (double d : deltas) sim += (1.0 + std::cos(d)) / 2.0;
      st.sim = (st.tp + st.fp > 0) ? sim : 0.0;
    }
  }
  return st;
}

std::vector<double> get_thresholds(std::vector<double> v, int n_gt) {
  std::sort(v.begin(), v.end(), std::greater<double>());
  std::vector<double> t;
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    double l_recall = (double)(i + 1) / n_gt;
    double r_recall = i < v.size() - 1 ? (double)(i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1);
  }
  return t;
}

struct ImageData {
  std::vector<Box> gts, dets;
};

void eval_class(const std::vector<ImageData>& imgs, const std::string& cls,
                int difficulty, int metric, bool compute_aos,
                std::vector<double>* precision, std::vector<double>* aos,
                std::vector<Overlaps>* ov_cache) {
  const double min_overlap = cls == "car" ? 0.7 : 0.5;
  precision->assign(N_SAMPLE_PTS, 0.0);
  aos->assign(N_SAMPLE_PTS, 0.0);

  std::vector<Cleaned> cleaned;
  std::vector<double> all_scores;
  int total_gt = 0;
  // overlap matrices depend only on geometry + metric: the caller shares
  // one cache per metric across classes and difficulties
  const bool fill_cache = ov_cache->size() != imgs.size();
  if (fill_cache) ov_cache->clear();
  for (size_t ii = 0; ii < imgs.size(); ++ii) {
    const auto& im = imgs[ii];
    cleaned.push_back(clean_data(im.gts, im.dets, cls, difficulty));
    if (fill_cache)
      ov_cache->push_back(
          pairwise_overlaps(im.gts, im.dets, cleaned.back(), metric));
    total_gt += cleaned.back().n_gt;
    Stats st = compute_statistics(im.gts, im.dets, cleaned.back(), false, metric,
                                  min_overlap, 0.0, false, (*ov_cache)[ii]);
    all_scores.insert(all_scores.end(), st.scores.begin(), st.scores.end());
  }
  const std::vector<Overlaps>& cached_ov = *ov_cache;
  if (total_gt == 0 || all_scores.empty()) return;
  std::vector<double> thresholds = get_thresholds(all_scores, total_gt);
  std::vector<long> tps(thresholds.size(), 0), fps(thresholds.size(), 0),
      fns(thresholds.size(), 0);
  std::vector<double> sims(thresholds.size(), 0.0);
  for (size_t ii = 0; ii < imgs.size(); ++ii) {
    for (size_t ti = 0; ti < thresholds.size(); ++ti) {
      Stats st = compute_statistics(imgs[ii].gts, imgs[ii].dets, cleaned[ii],
                                    true, metric, min_overlap, thresholds[ti],
                                    compute_aos, cached_ov[ii]);
      tps[ti] += st.tp;
      fps[ti] += st.fp;
      fns[ti] += st.fn;
      if (compute_aos && st.sim >= 0) sims[ti] += st.sim;
    }
  }
  for (size_t ti = 0; ti < thresholds.size(); ++ti) {
    double denom = tps[ti] + fps[ti];
    (*precision)[ti] = denom > 0 ? tps[ti] / denom : 0.0;
    if (compute_aos) (*aos)[ti] = denom > 0 ? sims[ti] / denom : 0.0;
  }
  for (int ti = 0; ti < N_SAMPLE_PTS; ++ti) {
    for (int tj = ti; tj < N_SAMPLE_PTS; ++tj) {
      (*precision)[ti] = std::max((*precision)[ti], (*precision)[tj]);
      if (compute_aos) (*aos)[ti] = std::max((*aos)[ti], (*aos)[tj]);
    }
  }
}

double ap11(const std::vector<double>& prec) {
  double s = 0;
  for (int i = 0; i < N_SAMPLE_PTS; i += 4) s += prec[i];
  return s / 11.0 * 100.0;
}

}  // namespace

// Server-variant per-class metric gating (`evaluate_object.cpp:144-151`):
// BEV needs t1/t3 present and w,l > 0; 3D additionally t2 and h > 0.
bool det_metric_available(const std::vector<ImageData>& imgs,
                          const std::string& cls, int metric) {
  for (const auto& im : imgs)
    for (const auto& d : im.dets) {
      if (d.type != cls) continue;
      bool has_ground = d.tx != -1000 && d.tz != -1000 && d.w > 0 && d.l > 0;
      if (metric == 1 && has_ground) return true;
      if (metric == 2 && has_ground && d.ty != -1000 && d.h > 0) return true;
    }
  return false;
}

std::vector<std::string> list_txt(const std::string& dir_path) {
  std::vector<std::string> names;
  DIR* dir = opendir(dir_path.c_str());
  if (!dir) {
    std::fprintf(stderr, "cannot open %s\n", dir_path.c_str());
    std::exit(1);
  }
  while (dirent* e = readdir(dir)) {
    std::string n = e->d_name;
    if (n.size() > 4 && n.substr(n.size() - 4) == ".txt") names.push_back(n);
  }
  closedir(dir);
  std::sort(names.begin(), names.end());
  return names;
}

int main(int argc, char** argv) {
  bool server = false;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--protocol") {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "--protocol needs a value\n");
        return 1;
      }
      std::string v = argv[++i];
      if (v == "server") server = true;
      else if (v != "offline") {
        std::fprintf(stderr, "unknown protocol %s\n", v.c_str());
        return 1;
      }
    } else {
      pos.push_back(a);
    }
  }
  if (pos.size() != 2) {
    std::fprintf(stderr,
                 "usage: %s <gt_dir> <result_dir> [--protocol offline|server]\n",
                 argv[0]);
    return 1;
  }
  g_strict_height = server;
  const std::string gt_dir = pos[0];
  const std::string result_dir = pos[1];
  const std::string data_dir = result_dir + "/data";

  std::vector<ImageData> imgs;
  if (server) {
    // server protocol: the evaluated set is every ground-truth image and a
    // result file must exist for each (the submission server aborts on a
    // missing file, `evaluate_object.cpp:683-706`)
    for (const auto& n : list_txt(gt_dir)) {
      std::string det_path = data_dir + "/" + n;
      std::ifstream probe(det_path);
      if (!probe.good()) {
        std::fprintf(stderr, "ERROR: couldn't read result file %s\n",
                     det_path.c_str());
        return 1;
      }
      ImageData im;
      im.gts = load_boxes(gt_dir + "/" + n, false);
      im.dets = load_boxes(det_path, true);
      imgs.push_back(std::move(im));
    }
  } else {
    for (const auto& n : list_txt(data_dir)) {
      std::string gt_path = gt_dir + "/" + n;
      std::ifstream probe(gt_path);
      if (!probe.good()) {
        // devkit parity: a result file whose ground-truth twin is missing
        // aborts the evaluation (silently dropping it would delete that
        // frame's GT from total_gt and inflate AP)
        std::fprintf(stderr, "ERROR: couldn't read ground truth %s\n",
                     gt_path.c_str());
        return 1;
      }
      ImageData im;
      im.gts = load_boxes(gt_path, false);
      im.dets = load_boxes(data_dir + "/" + n, true);
      imgs.push_back(std::move(im));
    }
  }
  std::fprintf(stderr, "loaded %zu images\n", imgs.size());

  // classes present among detections
  std::set<std::string> det_classes;
  for (const auto& im : imgs)
    for (const auto& d : im.dets) det_classes.insert(d.type);

  const char* metric_names[3] = {"detection", "detection_ground", "detection_3d"};
  for (const std::string cls : {"car", "pedestrian", "cyclist"}) {
    if (!det_classes.count(cls)) continue;
    for (int metric = 0; metric < 3; ++metric) {
      if (server && metric > 0 && !det_metric_available(imgs, cls, metric))
        continue;
      double aps[3];
      std::ofstream stats(result_dir + "/stats_" + cls + "_" +
                          metric_names[metric] + ".txt");
      double aos_aps[3] = {0, 0, 0};
      std::vector<Overlaps> ov_cache;  // shared across the 3 difficulties
      for (int difficulty = 0; difficulty < 3; ++difficulty) {
        std::vector<double> prec, aos;
        eval_class(imgs, cls, difficulty, metric, metric == 0, &prec, &aos,
                   &ov_cache);
        aps[difficulty] = ap11(prec);
        if (metric == 0) aos_aps[difficulty] = ap11(aos);
        for (int i = 0; i < N_SAMPLE_PTS; ++i)
          stats << prec[i] << (i + 1 < N_SAMPLE_PTS ? ' ' : '\n');
      }
      std::printf("%s_%s AP: %.6f %.6f %.6f\n", cls.c_str(),
                  metric_names[metric], aps[0], aps[1], aps[2]);
      if (metric == 0)
        std::printf("%s_orientation AP: %.6f %.6f %.6f\n", cls.c_str(),
                    aos_aps[0], aos_aps[1], aos_aps[2]);
    }
  }
  return 0;
}
