// Native evaluation kernels: exact rotated-box IoU + greedy COCO matcher.
//
// TPU-framework counterpart of the reference's eval extension
// (/root/reference/mmdet3d_gaussian/ops/eval/{rbox_utils.hpp,affinity.cpp,
// matcher.cpp}) rebuilt around Sutherland–Hodgman convex clipping instead of
// the reference's vertex-union + Graham hull, and exported with a plain C ABI
// for ctypes (no pybind11 dependency in this image).
//
// Build: make -C csrc   ->  libeval_ops.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct Pt {
  double x, y;
};

// corners of (cx, cy, w, h, yaw), CCW
inline void corners(const float *b, Pt *out) {
  double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
  double hw = 0.5 * b[2], hh = 0.5 * b[3];
  const double dx[4] = {-hw, hw, hw, -hw};
  const double dy[4] = {-hh, -hh, hh, hh};
  for (int i = 0; i < 4; i++) {
    out[i].x = b[0] + c * dx[i] - s * dy[i];
    out[i].y = b[1] + s * dx[i] + c * dy[i];
  }
}

// Sutherland–Hodgman: clip convex polygon against half-plane left of (a->b)
inline int clip_edge(const Pt *in, int n, Pt a, Pt b, Pt *out) {
  int m = 0;
  double ex = b.x - a.x, ey = b.y - a.y;
  for (int i = 0; i < n; i++) {
    const Pt &p = in[i];
    const Pt &q = in[(i + 1) % n];
    double sp = ex * (p.y - a.y) - ey * (p.x - a.x);
    double sq = ex * (q.y - a.y) - ey * (q.x - a.x);
    bool pin = sp >= -1e-12, qin = sq >= -1e-12;
    if (pin)
      out[m++] = p;
    if (pin != qin) {
      double t = sp / (sp - sq);
      out[m++] = Pt{p.x + t * (q.x - p.x), p.y + t * (q.y - p.y)};
    }
  }
  return m;
}

inline double intersection_area(const float *bd, const float *bg) {
  Pt pd[4], pg[4];
  corners(bd, pd);
  corners(bg, pg);
  Pt buf1[16], buf2[16];
  int n = 4;
  std::memcpy(buf1, pd, sizeof(pd));
  Pt *cur = buf1, *nxt = buf2;
  for (int e = 0; e < 4 && n > 2; e++) {
    n = clip_edge(cur, n, pg[e], pg[(e + 1) % 4], nxt);
    std::swap(cur, nxt);
  }
  if (n < 3)
    return 0.0;
  double area = 0.0;
  for (int i = 0; i < n; i++) {
    const Pt &p = cur[i];
    const Pt &q = cur[(i + 1) % n];
    area += p.x * q.y - p.y * q.x;
  }
  return 0.5 * std::fabs(area);
}

} // namespace

extern "C" {

// det (D, 7), gt (G, 7) row-major float32 -> out (D, G) float32 BEV IoU
void iou_bev(const float *det, int64_t nd, const float *gt, int64_t ng,
             float *out) {
  for (int64_t i = 0; i < nd; i++) {
    const float *d = det + i * 7;
    float db[5] = {d[0], d[1], d[3], d[4], d[6]};
    double da = (double)d[3] * d[4];
    for (int64_t j = 0; j < ng; j++) {
      const float *g = gt + j * 7;
      float gb[5] = {g[0], g[1], g[3], g[4], g[6]};
      double ga = (double)g[3] * g[4];
      double inter = intersection_area(db, gb);
      inter = std::min(inter, std::min(da, ga));
      double uni = std::max(da + ga - inter, 1e-7);
      out[i * ng + j] = (float)(inter / uni);
    }
  }
}

// 3D IoU with z_offset semantics of the reference evaluator
void iou_3d(const float *det, int64_t nd, const float *gt, int64_t ng,
            float z_offset, float *out) {
  for (int64_t i = 0; i < nd; i++) {
    const float *d = det + i * 7;
    float db[5] = {d[0], d[1], d[3], d[4], d[6]};
    double dzlo = d[2] + (z_offset - 0.5) * d[5], dzhi = dzlo + d[5];
    double dv = (double)d[3] * d[4] * d[5];
    for (int64_t j = 0; j < ng; j++) {
      const float *g = gt + j * 7;
      float gb[5] = {g[0], g[1], g[3], g[4], g[6]};
      double gzlo = g[2] + (z_offset - 0.5) * g[5], gzhi = gzlo + g[5];
      double gv = (double)g[3] * g[4] * g[5];
      double zov = std::max(0.0, std::min(dzhi, gzhi) - std::max(dzlo, gzlo));
      double inter = intersection_area(db, gb) * zov;
      inter = std::min(inter, std::min(dv, gv));
      double uni = std::max(dv + gv - inter, 1e-7);
      out[i * ng + j] = (float)(inter / uni);
    }
  }
}

// Greedy COCO matching (reference matcher.cpp:8-75 semantics):
// cost (D, G) lower-better, thrs (T,), ignore/crowd (G,) -> out (T, D) int32
void match_coco(const float *cost, int64_t nd, int64_t ng, const float *thrs,
                int64_t nt, const uint8_t *is_ignore, const uint8_t *is_crowd,
                int32_t *out) {
  bool *gt_matched = new bool[ng];
  for (int64_t t = 0; t < nt; t++) {
    std::memset(gt_matched, 0, ng * sizeof(bool));
    float thr = thrs[t];
    for (int64_t d = 0; d < nd; d++) {
      float best = thr;
      int64_t match = -1;
      for (int64_t g = 0; g < ng; g++) {
        if (gt_matched[g] && !is_crowd[g])
          continue;
        float c = cost[d * ng + g];
        if (match == -1) {
          if (c <= best) {
            best = c;
            match = g;
          }
        } else if (is_ignore[match]) {
          if (!is_ignore[g]) {
            if (c <= thr) {
              best = c;
              match = g;
            }
          } else if (c <= best) {
            best = c;
            match = g;
          }
        } else {
          if (!is_ignore[g] && c <= best) {
            best = c;
            match = g;
          }
        }
      }
      if (match != -1)
        gt_matched[match] = true;
      out[t * nd + d] = (int32_t)match;
    }
  }
  delete[] gt_matched;
}

// ---------------------------------------------------------------------------
// Official KITTI protocol kernels (upstream mmdet3d/second.pytorch
// `kitti_eval` semantics, which the reference inherits through
// `KittiDataset.evaluate` — /root/reference/mmdet3d_gaussian/datasets/
// kitti_dataset.py subclasses mmdet3d's KittiDataset).
// ---------------------------------------------------------------------------

// Rotated 2D overlap on 5-dof boxes (cx, cy, w, h, yaw).
// criterion: -1 -> IoU, 0 -> inter / area(box1), 2 -> raw intersection area.
void riou5(const float *b1, int64_t n1, const float *b2, int64_t n2,
           int32_t criterion, float *out) {
  for (int64_t i = 0; i < n1; i++) {
    const float *a = b1 + i * 5;
    double aa = (double)a[2] * a[3];
    for (int64_t j = 0; j < n2; j++) {
      const float *b = b2 + j * 5;
      double ba = (double)b[2] * b[3];
      double inter = intersection_area(a, b);
      inter = std::min(inter, std::min(aa, ba));
      double v;
      if (criterion == -1)
        v = inter / std::max(aa + ba - inter, 1e-7);
      else if (criterion == 0)
        v = inter / std::max(aa, 1e-7);
      else
        v = inter;
      out[i * n2 + j] = (float)v;
    }
  }
}

namespace {

constexpr double kNoDetection = -1e7;

// One pass of the official compute_statistics loop.  overlaps is (D, G)
// row-major ([det, gt], larger-better).  When compute_fp is false the pass
// only collects TP detection scores (out_scores, returns count via *n_tp);
// when true it returns tp/fp/fn counts.
inline void kitti_stats_one(const float *overlaps, const float *scores,
                            const int8_t *ig_det, int64_t nd,
                            const int8_t *ig_gt, int64_t ng,
                            const float *dc_overlap, int64_t ndc,
                            double min_overlap, double thresh,
                            bool compute_fp, bool *assigned,
                            int64_t *tp, int64_t *fp, int64_t *fn,
                            float *out_scores, int64_t *n_tp) {
  int64_t _tp = 0, _fp = 0, _fn = 0, nsc = 0;
  std::memset(assigned, 0, nd * sizeof(bool));
  for (int64_t i = 0; i < ng; i++) {
    if (ig_gt[i] == -1)
      continue;
    int64_t det_idx = -1;
    double valid_detection = kNoDetection;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    for (int64_t j = 0; j < nd; j++) {
      if (ig_det[j] == -1 || assigned[j])
        continue;
      if (compute_fp && scores[j] < thresh)
        continue;
      double ov = overlaps[j * ng + i];
      if (!compute_fp && ov > min_overlap && scores[j] > valid_detection) {
        det_idx = j;
        valid_detection = scores[j];
      } else if (compute_fp && ov > min_overlap &&
                 (ov > max_overlap || assigned_ignored_det) &&
                 ig_det[j] == 0) {
        max_overlap = ov;
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = false;
      } else if (compute_fp && ov > min_overlap &&
                 valid_detection == kNoDetection && ig_det[j] == 1) {
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == kNoDetection && ig_gt[i] == 0) {
      _fn++;
    } else if (valid_detection != kNoDetection &&
               (ig_gt[i] == 1 || ig_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != kNoDetection) {
      _tp++;
      if (out_scores)
        out_scores[nsc++] = scores[det_idx];
      assigned[det_idx] = true;
    }
  }
  if (compute_fp) {
    for (int64_t j = 0; j < nd; j++) {
      if (!(assigned[j] || ig_det[j] == -1 || ig_det[j] == 1 ||
            scores[j] < thresh))
        _fp++;
    }
    // DontCare absorption (metric 0 only: caller passes ndc == 0 otherwise).
    int64_t nstuff = 0;
    for (int64_t i = 0; i < ndc; i++) {
      for (int64_t j = 0; j < nd; j++) {
        if (assigned[j] || ig_det[j] == -1 || ig_det[j] == 1 ||
            scores[j] < thresh)
          continue;
        if (dc_overlap[j * ndc + i] > min_overlap) {
          assigned[j] = true;
          nstuff++;
        }
      }
    }
    _fp -= nstuff;
  }
  if (tp) *tp = _tp;
  if (fp) *fp = _fp;
  if (fn) *fn = _fn;
  if (n_tp) *n_tp = nsc;
}

} // namespace

// TP-score collection pass (compute_fp = false, thresh = 0); returns the
// number of scores written to out_scores (capacity must be >= ng).
int64_t kitti_tp_scores(const float *overlaps, const float *scores,
                        const int8_t *ig_det, int64_t nd,
                        const int8_t *ig_gt, int64_t ng, float min_overlap,
                        float *out_scores) {
  int64_t n_tp = 0;
  bool *assigned = new bool[nd > 0 ? nd : 1];
  kitti_stats_one(overlaps, scores, ig_det, nd, ig_gt, ng, nullptr, 0,
                  min_overlap, 0.0, false, assigned, nullptr, nullptr,
                  nullptr, out_scores, &n_tp);
  delete[] assigned;
  return n_tp;
}

// Full statistics across score thresholds: out (T, 3) int32 rows of
// (tp, fp, fn) — one compute_fp pass per threshold.
void kitti_stats(const float *overlaps, const float *scores,
                 const int8_t *ig_det, int64_t nd, const int8_t *ig_gt,
                 int64_t ng, const float *dc_overlap, int64_t ndc,
                 float min_overlap, const float *thresholds, int64_t nt,
                 int32_t *out) {
  bool *assigned = new bool[nd > 0 ? nd : 1];
  for (int64_t t = 0; t < nt; t++) {
    int64_t tp = 0, fp = 0, fn = 0;
    kitti_stats_one(overlaps, scores, ig_det, nd, ig_gt, ng, dc_overlap, ndc,
                    min_overlap, thresholds[t], true, assigned, &tp, &fp, &fn,
                    nullptr, nullptr);
    out[t * 3 + 0] = (int32_t)tp;
    out[t * 3 + 1] = (int32_t)fp;
    out[t * 3 + 2] = (int32_t)fn;
  }
  delete[] assigned;
}

} // extern "C"
