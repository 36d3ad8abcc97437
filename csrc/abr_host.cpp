// abr_host — native host-side kernels for the as-built reconstruction stack.
//
// TPU-native split: device math lives in XLA/Pallas; the *host* input
// pipeline (voxelization, box membership, collision tests, rotated IoU,
// NMS) is native C++ — the role numba-jitted kernels play in the reference
// [ref: second/core/point_cloud/point_cloud_ops.py, geometry.py,
// non_max_suppression/nms_cpu.py — lineage-expected, UNVERIFIED].
//
// Plain C ABI, consumed from Python via ctypes (pybind11 is not available
// in this image).  All float buffers are float32, contiguous, row-major.
//
// Build: make -C csrc     (produces libabr_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FCFS hard voxelization — bit-identical to core.voxelize.points_to_voxel.
//
// points:   [P, C] (x, y, z first)
// voxels:   [max_voxels, max_points, C]  (pre-zeroed by caller or here)
// coords:   [max_voxels, 3] int32 (z, y, x)
// num_points_per_voxel: [max_voxels] int32
// returns the number of voxels produced.
int abr_points_to_voxel(const float* points, int64_t P, int64_t C,
                        const float* voxel_size, const float* coors_range,
                        int64_t max_points, int64_t max_voxels,
                        float* voxels, int32_t* coords,
                        int32_t* num_points_per_voxel) {
  const double vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const double x0 = coors_range[0], y0 = coors_range[1], z0 = coors_range[2];
  const int64_t gx = (int64_t)std::round((coors_range[3] - x0) / vx);
  const int64_t gy = (int64_t)std::round((coors_range[4] - y0) / vy);
  const int64_t gz = (int64_t)std::round((coors_range[5] - z0) / vz);

  std::memset(voxels, 0, sizeof(float) * max_voxels * max_points * C);
  std::memset(num_points_per_voxel, 0, sizeof(int32_t) * max_voxels);

  std::unordered_map<int64_t, int32_t> key_to_voxel;
  key_to_voxel.reserve((size_t)std::min<int64_t>(P, max_voxels) * 2);
  int32_t nv = 0;
  for (int64_t i = 0; i < P; ++i) {
    const float* p = points + i * C;
    const int64_t cx = (int64_t)std::floor((p[0] - x0) / vx);
    const int64_t cy = (int64_t)std::floor((p[1] - y0) / vy);
    const int64_t cz = (int64_t)std::floor((p[2] - z0) / vz);
    if (cx < 0 || cx >= gx || cy < 0 || cy >= gy || cz < 0 || cz >= gz)
      continue;
    const int64_t key = (cy * gx + cx) * gz + cz;
    auto it = key_to_voxel.find(key);
    int32_t v;
    if (it == key_to_voxel.end()) {
      if (nv >= max_voxels) continue;
      v = nv++;
      key_to_voxel.emplace(key, v);
      coords[v * 3 + 0] = (int32_t)cz;
      coords[v * 3 + 1] = (int32_t)cy;
      coords[v * 3 + 2] = (int32_t)cx;
    } else {
      v = it->second;
    }
    int32_t& n = num_points_per_voxel[v];
    if (n < max_points) {
      std::memcpy(voxels + (v * max_points + n) * C, p, sizeof(float) * C);
      ++n;
    }
  }
  return nv;
}

// ---------------------------------------------------------------------------
// Fused voxelize + capped mean, key-sorted output — the host twin of the
// ops/pallas/voxel_mean.py kernel (SECOND's SimpleVoxel input stage).
// Emits per-voxel means of the first `max_points` FCFS points directly,
// with voxels ordered by ascending DEPTH-MINOR key (y*gx + x)*gz + z so
// the downstream sparse-conv rulebooks are monotone AND window-local
// per tap (all 27 neighbors sit within a few BEV rows).  Skips the
// [V, T, C] voxel buffer, the separate mean pass, and the numpy re-sort.
// means: [max_voxels, C]; coords: [max_voxels, 3] int32 (z, y, x);
// counts: [max_voxels] int32.  Returns the number of voxels.
int abr_voxelize_sorted_mean(const float* points, int64_t P, int64_t C,
                             const float* voxel_size,
                             const float* coors_range, int64_t max_points,
                             int64_t max_voxels, float* means,
                             int32_t* coords, int32_t* counts) {
  const double vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const double x0 = coors_range[0], y0 = coors_range[1],
               z0 = coors_range[2];
  const int64_t gx = (int64_t)std::round((coors_range[3] - x0) / vx);
  const int64_t gy = (int64_t)std::round((coors_range[4] - y0) / vy);
  const int64_t gz = (int64_t)std::round((coors_range[5] - z0) / vz);

  // Slots grow past max_voxels: on overflow the SMALLEST-key voxels are
  // kept (key order == the sorted output order), matching the device
  // twin's selection (ops/voxelize_jax.py first_appearance=False keeps
  // the lowest sort keys) so host/device parity holds on overflow scans
  // too, not just when the scan fits.
  std::unordered_map<int64_t, int32_t> key_to_slot;
  key_to_slot.reserve((size_t)std::min<int64_t>(P, max_voxels) * 2);
  std::vector<int64_t> slot_key;
  slot_key.reserve(max_voxels);
  std::vector<double> sums;
  sums.reserve((size_t)max_voxels * C);
  std::vector<int32_t> cnt;
  cnt.reserve(max_voxels);

  for (int64_t i = 0; i < P; ++i) {
    const float* p = points + i * C;
    const int64_t cxi = (int64_t)std::floor((p[0] - x0) / vx);
    const int64_t cyi = (int64_t)std::floor((p[1] - y0) / vy);
    const int64_t czi = (int64_t)std::floor((p[2] - z0) / vz);
    if (cxi < 0 || cxi >= gx || cyi < 0 || cyi >= gy || czi < 0 ||
        czi >= gz)
      continue;
    const int64_t key = (cyi * gx + cxi) * gz + czi;
    auto it = key_to_slot.find(key);
    int32_t s;
    if (it == key_to_slot.end()) {
      s = (int32_t)slot_key.size();
      key_to_slot.emplace(key, s);
      slot_key.push_back(key);
      sums.resize(sums.size() + C, 0.0);
      cnt.push_back(0);
    } else {
      s = it->second;
    }
    if (cnt[s] < max_points) {
      for (int64_t c = 0; c < C; ++c) sums[(size_t)s * C + c] += p[c];
      ++cnt[s];
    }
  }

  const int64_t nv_all = (int64_t)slot_key.size();
  std::vector<int32_t> order(nv_all);
  for (int64_t s = 0; s < nv_all; ++s) order[s] = (int32_t)s;
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return slot_key[a] < slot_key[b];
  });
  const int64_t nv = std::min<int64_t>(nv_all, max_voxels);

  for (int64_t o = 0; o < nv; ++o) {
    const int32_t s = order[o];
    const int64_t key = slot_key[s];
    const int32_t n = cnt[s];
    for (int64_t c = 0; c < C; ++c)
      means[o * C + c] = (float)(sums[(size_t)s * C + c] / std::max(n, 1));
    coords[o * 3 + 0] = (int32_t)(key % gz);
    coords[o * 3 + 1] = (int32_t)(key / (gx * gz));
    coords[o * 3 + 2] = (int32_t)((key / gz) % gx);
    counts[o] = n;
  }
  for (int64_t o = nv; o < max_voxels; ++o) {
    for (int64_t c = 0; c < C; ++c) means[o * C + c] = 0.0f;
    coords[o * 3 + 0] = coords[o * 3 + 1] = coords[o * 3 + 2] = -1;
    counts[o] = 0;
  }
  return (int)nv;
}

// ---------------------------------------------------------------------------
// points_in_rbbox: [P,>=3] points vs [N,7] (x,y,z,w,l,h,yaw; bottom-center)
// out: [P, N] uint8
void abr_points_in_rbbox(const float* points, int64_t P, int64_t C,
                         const float* boxes, int64_t N, uint8_t* out) {
  for (int64_t j = 0; j < N; ++j) {
    const float* b = boxes + j * 7;
    const double cx = b[0], cy = b[1], cz = b[2] + 0.5 * b[5];
    const double hw = 0.5 * b[3], hl = 0.5 * b[4], hh = 0.5 * b[5];
    const double c = std::cos((double)b[6]), s = std::sin((double)b[6]);
    for (int64_t i = 0; i < P; ++i) {
      const float* p = points + i * C;
      const double dx = p[0] - cx, dy = p[1] - cy, dz = p[2] - cz;
      const double lx = dx * c + dy * s;
      const double ly = -dx * s + dy * c;
      out[i * N + j] = (std::fabs(lx) <= hw && std::fabs(ly) <= hl &&
                        std::fabs(dz) <= hh)
                           ? 1
                           : 0;
    }
  }
}

// ---------------------------------------------------------------------------
// BEV rotated-box helpers
static inline void box_corners(const float* b, double* cx, double* cy) {
  // b: (x, y, w, l, yaw); CCW corners
  const double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
  const double hw = 0.5 * b[2], hl = 0.5 * b[3];
  const double ox[4] = {-hw, hw, hw, -hw};
  const double oy[4] = {-hl, -hl, hl, hl};
  for (int k = 0; k < 4; ++k) {
    cx[k] = ox[k] * c - oy[k] * s + b[0];
    cy[k] = ox[k] * s + oy[k] * c + b[1];
  }
}

// SAT collision for a pair of BEV boxes (touching counts as collision)
static bool sat_collide(const double* ax, const double* ay, const double* bx,
                        const double* by) {
  const double* xs[2] = {ax, bx};
  const double* ys[2] = {ay, by};
  for (int poly = 0; poly < 2; ++poly) {
    for (int e = 0; e < 4; ++e) {
      const int e2 = (e + 1) & 3;
      const double nx = -(ys[poly][e2] - ys[poly][e]);
      const double ny = xs[poly][e2] - xs[poly][e];
      double amin = 1e300, amax = -1e300, bmin = 1e300, bmax = -1e300;
      for (int k = 0; k < 4; ++k) {
        const double pa = ax[k] * nx + ay[k] * ny;
        const double pb = bx[k] * nx + by[k] * ny;
        amin = std::min(amin, pa); amax = std::max(amax, pa);
        bmin = std::min(bmin, pb); bmax = std::max(bmax, pb);
      }
      if (amax < bmin - 1e-12 || bmax < amin - 1e-12) return false;
    }
  }
  return true;
}

// boxes [N,5] vs qboxes [K,5] -> out [N,K] uint8
void abr_box_collision_test(const float* boxes, int64_t N,
                            const float* qboxes, int64_t K, uint8_t* out) {
  std::vector<double> acx(N * 4), acy(N * 4), bcx(K * 4), bcy(K * 4);
  for (int64_t i = 0; i < N; ++i)
    box_corners(boxes + i * 5, &acx[i * 4], &acy[i * 4]);
  for (int64_t j = 0; j < K; ++j)
    box_corners(qboxes + j * 5, &bcx[j * 4], &bcy[j * 4]);
  for (int64_t i = 0; i < N; ++i)
    for (int64_t j = 0; j < K; ++j)
      out[i * K + j] = sat_collide(&acx[i * 4], &acy[i * 4], &bcx[j * 4],
                                   &bcy[j * 4])
                           ? 1
                           : 0;
}

// ---------------------------------------------------------------------------
// rotated intersection area via Sutherland–Hodgman clipping
static double clip_area(const double* ax, const double* ay, const double* bx,
                        const double* by) {
  double px[16], py[16];
  int n = 4;
  for (int k = 0; k < 4; ++k) { px[k] = ax[k]; py[k] = ay[k]; }
  double qx[16], qy[16];
  for (int e = 0; e < 4 && n > 0; ++e) {
    const int e2 = (e + 1) & 3;
    const double ex = bx[e2] - bx[e], ey = by[e2] - by[e];
    int m = 0;
    for (int k = 0; k < n; ++k) {
      const int k2 = (k + 1) % n;
      const double s1 = ex * (py[k] - by[e]) - ey * (px[k] - bx[e]);
      const double s2 = ex * (py[k2] - by[e]) - ey * (px[k2] - bx[e]);
      if (s1 >= 0) { qx[m] = px[k]; qy[m] = py[k]; ++m; }
      if ((s1 >= 0) != (s2 >= 0)) {
        const double t = s1 / (s1 - s2);
        qx[m] = px[k] + t * (px[k2] - px[k]);
        qy[m] = py[k] + t * (py[k2] - py[k]);
        ++m;
      }
    }
    n = m;
    for (int k = 0; k < n; ++k) { px[k] = qx[k]; py[k] = qy[k]; }
  }
  if (n < 3) return 0.0;
  double area = 0.0;
  for (int k = 0; k < n; ++k) {
    const int k2 = (k + 1) % n;
    area += px[k] * py[k2] - px[k2] * py[k];
  }
  return std::max(0.5 * area, 0.0);
}

// boxes [N,5] x qboxes [K,5] -> iou [N,K] float32 (criterion -1/0/1)
void abr_rotate_iou(const float* boxes, int64_t N, const float* qboxes,
                    int64_t K, int criterion, float* out) {
  std::vector<double> acx(N * 4), acy(N * 4), bcx(K * 4), bcy(K * 4);
  for (int64_t i = 0; i < N; ++i)
    box_corners(boxes + i * 5, &acx[i * 4], &acy[i * 4]);
  for (int64_t j = 0; j < K; ++j)
    box_corners(qboxes + j * 5, &bcx[j * 4], &bcy[j * 4]);
  for (int64_t i = 0; i < N; ++i) {
    const double area_a = (double)boxes[i * 5 + 2] * boxes[i * 5 + 3];
    for (int64_t j = 0; j < K; ++j) {
      const double area_b = (double)qboxes[j * 5 + 2] * qboxes[j * 5 + 3];
      const double inter = clip_area(&acx[i * 4], &acy[i * 4], &bcx[j * 4],
                                     &bcy[j * 4]);
      double denom;
      if (criterion == -1) denom = area_a + area_b - inter;
      else if (criterion == 0) denom = area_a;
      else denom = area_b;
      out[i * K + j] = (float)(denom > 0 ? inter / std::max(denom, 1e-12)
                                         : 0.0);
    }
  }
}

// greedy rotated NMS: boxes [N,5], scores [N]; returns #kept, indices in
// keep_out (caller-allocated, size >= N), descending score order.
int abr_rotate_nms(const float* boxes, const float* scores, int64_t N,
                   float iou_threshold, int64_t post_max_size,
                   int64_t* keep_out) {
  std::vector<int64_t> order(N);
  for (int64_t i = 0; i < N; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<double> cx(N * 4), cy(N * 4);
  std::vector<double> areas(N);
  for (int64_t i = 0; i < N; ++i) {
    box_corners(boxes + order[i] * 5, &cx[i * 4], &cy[i * 4]);
    areas[i] = (double)boxes[order[i] * 5 + 2] * boxes[order[i] * 5 + 3];
  }
  std::vector<uint8_t> suppressed(N, 0);
  int kept = 0;
  for (int64_t i = 0; i < N && kept < post_max_size; ++i) {
    if (suppressed[i]) continue;
    keep_out[kept++] = order[i];
    for (int64_t j = i + 1; j < N; ++j) {
      if (suppressed[j]) continue;
      const double inter = clip_area(&cx[i * 4], &cy[i * 4], &cx[j * 4],
                                     &cy[j * 4]);
      const double uni = areas[i] + areas[j] - inter;
      if (uni > 0 && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// KITTI devkit evaluation statistics (the computeStatistics inner loop of
// the official evaluate_object protocol [ref: second/utils/eval.py::
// compute_statistics_jit — lineage-expected, UNVERIFIED; semantics follow
// the published KITTI devkit]).  Native because the per-threshold matching
// sweep is O(images * thresholds * dets * gts) and the reference numba-jits
// it; exactness is the contract (scenario-traced in tests).
//
// Inputs per image:
//   overlaps    [D, G] f32 — detection x gt overlap for the metric
//   ignored_gt  [G] i8    — 0 counted, 1 ignored, -1 other class
//   ignored_det [D] i8    — 0 counted, 1 height-ignored, -1 other class
//   dt_scores   [D] f32
//   dc_overlap  [D, NDC] f32 — criterion-0 image overlap det vs DontCare
//   gt_alpha [G] / dt_alpha [D] — observation angles (AOS; pass aos=0 to skip)
//   thresholds  [T] f32 — score cutoffs (one statistics pass per entry)
// Accumulates (+=) into tp/fp/fn/sim [T].
//
// First pass (threshold selection) = T==0 path: writes the scores of
// matched TPs into tp_scores (capacity D) and returns the count.

static void eval_stats_one(const float* overlaps, int64_t D, int64_t G,
                           const int8_t* ignored_gt,
                           const int8_t* ignored_det, const float* dt_scores,
                           const float* dc_overlap, int64_t NDC,
                           const float* gt_alpha, const float* dt_alpha,
                           int aos, float min_overlap, float thresh,
                           bool compute_fp, int32_t* tp, int32_t* fp,
                           int32_t* fn, float* sim, float* tp_scores,
                           int32_t* n_tp_scores) {
  const float NO_DETECTION = -10000000.0f;
  std::vector<uint8_t> assigned(D, 0);
  std::vector<uint8_t> ignored_threshold(D, 0);
  if (compute_fp)
    for (int64_t j = 0; j < D; ++j)
      if (dt_scores[j] < thresh) ignored_threshold[j] = 1;

  int32_t l_tp = 0, l_fp = 0, l_fn = 0;
  float l_sim = 0.0f;
  int32_t n_delta = 0;

  for (int64_t i = 0; i < G; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    float valid_detection = NO_DETECTION;
    float max_overlap = 0.0f;
    bool assigned_ignored_det = false;

    for (int64_t j = 0; j < D; ++j) {
      if (ignored_det[j] == -1) continue;
      if (assigned[j]) continue;
      if (ignored_threshold[j]) continue;
      const float overlap = overlaps[j * G + i];
      const float score = dt_scores[j];
      if (!compute_fp && overlap > min_overlap && score > valid_detection) {
        det_idx = j;
        valid_detection = score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1.0f;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1.0f;
        assigned_ignored_det = true;
      }
    }

    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      ++l_fn;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DETECTION) {
      ++l_tp;
      if (tp_scores) tp_scores[(*n_tp_scores)++] = dt_scores[det_idx];
      if (aos) {
        l_sim += 0.5f * (1.0f + std::cos((double)gt_alpha[i] -
                                         (double)dt_alpha[det_idx]));
        ++n_delta;
      }
      assigned[det_idx] = 1;
    }
  }

  if (compute_fp) {
    for (int64_t j = 0; j < D; ++j) {
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]))
        ++l_fp;
    }
    int32_t nstuff = 0;
    for (int64_t k = 0; k < NDC; ++k) {
      for (int64_t j = 0; j < D; ++j) {
        if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j])
          continue;
        if (dc_overlap[j * NDC + k] > min_overlap) {
          assigned[j] = 1;
          ++nstuff;
        }
      }
    }
    l_fp -= nstuff;
  }
  *tp += l_tp;
  *fp += l_fp;
  *fn += l_fn;
  if (aos && (l_tp > 0 || l_fp > 0)) *sim += l_sim;
  (void)n_delta;
}

// Pass 1: collect TP scores (thresh=0, no fp).  Returns count written.
int abr_eval_tp_scores(const float* overlaps, int64_t D, int64_t G,
                       const int8_t* ignored_gt, const int8_t* ignored_det,
                       const float* dt_scores, float min_overlap,
                       float* tp_scores) {
  int32_t n = 0, tp = 0, fp = 0, fn = 0;
  float sim = 0;
  eval_stats_one(overlaps, D, G, ignored_gt, ignored_det, dt_scores,
                 nullptr, 0, nullptr, nullptr, 0, min_overlap, 0.0f,
                 /*compute_fp=*/false, &tp, &fp, &fn, &sim, tp_scores, &n);
  return n;
}

// Pass 2: accumulate tp/fp/fn/sim per threshold for one image.
void abr_eval_statistics(const float* overlaps, int64_t D, int64_t G,
                         const int8_t* ignored_gt,
                         const int8_t* ignored_det, const float* dt_scores,
                         const float* dc_overlap, int64_t NDC,
                         const float* gt_alpha, const float* dt_alpha,
                         int aos, float min_overlap,
                         const float* thresholds, int64_t T, int32_t* tp,
                         int32_t* fp, int32_t* fn, float* sim) {
  for (int64_t t = 0; t < T; ++t) {
    eval_stats_one(overlaps, D, G, ignored_gt, ignored_det, dt_scores,
                   dc_overlap, NDC, gt_alpha, dt_alpha, aos, min_overlap,
                   thresholds[t], /*compute_fp=*/true, tp + t, fp + t,
                   fn + t, sim + t, nullptr, nullptr);
  }
}

// ---------------------------------------------------------------------------
// Sparse-conv rulebook construction (host precompute for the TPU sparse
// middle extractor — the role spconv's getIndicePairs plays on GPU
// [ref: external spconv/src/spconv/indice.cu — lineage-expected,
// UNVERIFIED]).  Semantics are bit-identical to the on-device builders in
// ops/sparse_conv.py (build_submanifold_rulebook / build_strided_layout):
// same offset enumeration order, same sorted-unique output ordering, same
// truncation at max_out.  coords are [N,3] int32 (z,y,x); rows with z < 0
// are padding.

// DEPTH-MINOR key (y*W + x)*D + z — matches ops/sparse_conv.py::linearize.
// With (y, x, z)-sorted sites every kernel-tap neighbor stays within a few
// BEV rows in index space (window-local monotone rulebooks for the Pallas
// gather-GEMM kernel); dz taps differ by consecutive keys.
static inline int64_t lin_key(int32_t z, int32_t y, int32_t x,
                              const int32_t* grid) {
  if (z < 0 || z >= grid[0] || y < 0 || y >= grid[1] || x < 0 ||
      x >= grid[2])
    return -1;
  return ((int64_t)y * grid[2] + x) * grid[0] + z;
}

// Open-addressing hash table (linear probing, power-of-two capacity) —
// ~4x faster than std::unordered_map for these build-once/query-many
// coord tables.  Keys are non-negative linear voxel keys; empty = -1.
struct CoordTable {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit CoordTable(int64_t n) {
    uint64_t cap = 16;
    while (cap < (uint64_t)(n * 2 + 1)) cap <<= 1;
    keys.assign(cap, -1);
    vals.resize(cap);
    mask = cap - 1;
  }
  static inline uint64_t hash(int64_t k) {
    uint64_t h = (uint64_t)k;
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
    return h;
  }
  // first-wins insert (matches the device's stable-argsort semantics)
  inline void insert(int64_t key, int32_t val) {
    uint64_t i = hash(key) & mask;
    while (keys[i] != -1) {
      if (keys[i] == key) return;
      i = (i + 1) & mask;
    }
    keys[i] = key;
    vals[i] = val;
  }
  inline int32_t find(int64_t key) const {   // -1 when absent
    uint64_t i = hash(key) & mask;
    while (keys[i] != -1) {
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
    return -1;
  }
};

static CoordTable build_coord_table(const int32_t* coords, int64_t N,
                                    const int32_t* grid) {
  CoordTable table(N);
  for (int64_t i = 0; i < N; ++i) {
    const int32_t* c = coords + i * 3;
    if (c[0] < 0) continue;
    const int64_t key = lin_key(c[0], c[1], c[2], grid);
    if (key >= 0) table.insert(key, (int32_t)i);
  }
  return table;
}

// coords [N,3] -> gather_idx [K,N] int32 + found [K,N] uint8 where
// K = kz*ky*kx, offsets enumerated (dz slowest, dx fastest), each centered
// (arange(k) - k//2).  gather_idx[k,i] = index j with coords[j] ==
// coords[i] + offset[k]; 0 (masked) when absent.
void abr_subm_rulebook(const int32_t* coords, int64_t N, const int32_t* grid,
                       const int32_t* ksize, int32_t* gather_idx,
                       uint8_t* found) {
  const CoordTable table = build_coord_table(coords, N, grid);
  const int32_t kz = ksize[0], ky = ksize[1], kx = ksize[2];
  int64_t k = 0;
  for (int32_t dz = -(kz / 2); dz < kz - kz / 2; ++dz)
    for (int32_t dy = -(ky / 2); dy < ky - ky / 2; ++dy)
      for (int32_t dx = -(kx / 2); dx < kx - kx / 2; ++dx, ++k) {
        int32_t* gi = gather_idx + k * N;
        uint8_t* fo = found + k * N;
        for (int64_t i = 0; i < N; ++i) {
          const int32_t* c = coords + i * 3;
          gi[i] = 0;
          fo[i] = 0;
          if (c[0] < 0) continue;
          const int64_t key = lin_key(c[0] + dz, c[1] + dy, c[2] + dx, grid);
          if (key < 0) continue;
          const int32_t j = table.find(key);
          if (j >= 0) {
            gi[i] = j;
            fo[i] = 1;
          }
        }
      }
}

// Strided sparse conv output layout + rulebook.  Output site o (per dim)
// receives input i iff o*s + t - p == i for some tap t in [0,k).  Output
// sites are the sorted-unique linear keys of all touched sites, truncated
// to max_out (ascending).  Taps enumerated (tz slowest, tx fastest).
// Returns the (untruncated-capped) number of outputs.
int abr_strided_layout(const int32_t* coords, int64_t N, const int32_t* grid,
                       const int32_t* ksize, const int32_t* stride,
                       const int32_t* pad, int64_t max_out,
                       int32_t* out_coords, uint8_t* out_valid,
                       int32_t* gather_idx, uint8_t* found) {
  int32_t out_grid[3];
  for (int d = 0; d < 3; ++d)
    out_grid[d] = (grid[d] + 2 * pad[d] - ksize[d]) / stride[d] + 1;

  // candidate output keys from every valid input
  std::vector<int64_t> cand;
  cand.reserve((size_t)N * 8);
  for (int64_t i = 0; i < N; ++i) {
    const int32_t* c = coords + i * 3;
    if (c[0] < 0) continue;
    int32_t lo[3], hi[3];
    for (int d = 0; d < 3; ++d) {
      const int32_t ip = c[d] + pad[d];
      int32_t l = ip - ksize[d] + 1;
      // ceil-div for possibly negative numerator
      lo[d] = l >= 0 ? (l + stride[d] - 1) / stride[d] : -((-l) / stride[d]);
      hi[d] = ip / stride[d];
      if (lo[d] < 0) lo[d] = 0;
      if (hi[d] >= out_grid[d]) hi[d] = out_grid[d] - 1;
    }
    for (int32_t oz = lo[0]; oz <= hi[0]; ++oz)
      for (int32_t oy = lo[1]; oy <= hi[1]; ++oy)
        for (int32_t ox = lo[2]; ox <= hi[2]; ++ox)
          cand.push_back(((int64_t)oy * out_grid[2] + ox) * out_grid[0] + oz);
  }
  std::sort(cand.begin(), cand.end());
  cand.erase(std::unique(cand.begin(), cand.end()), cand.end());
  const int64_t num_out =
      std::min<int64_t>((int64_t)cand.size(), max_out);

  for (int64_t o = 0; o < max_out; ++o) {
    if (o < num_out) {
      const int64_t key = cand[o];
      out_coords[o * 3 + 0] = (int32_t)(key % out_grid[0]);
      out_coords[o * 3 + 1] = (int32_t)(key / ((int64_t)out_grid[2] *
                                               out_grid[0]));
      out_coords[o * 3 + 2] = (int32_t)((key / out_grid[0]) % out_grid[2]);
      out_valid[o] = 1;
    } else {
      out_coords[o * 3 + 0] = -1;
      out_coords[o * 3 + 1] = -1;
      out_coords[o * 3 + 2] = -1;
      out_valid[o] = 0;
    }
  }

  // input hash table for tap lookups
  const CoordTable table = build_coord_table(coords, N, grid);

  int64_t t = 0;
  for (int32_t tz = 0; tz < ksize[0]; ++tz)
    for (int32_t ty = 0; ty < ksize[1]; ++ty)
      for (int32_t tx = 0; tx < ksize[2]; ++tx, ++t) {
        int32_t* gi = gather_idx + t * max_out;
        uint8_t* fo = found + t * max_out;
        for (int64_t o = 0; o < max_out; ++o) {
          gi[o] = 0;
          fo[o] = 0;
          if (o >= num_out) continue;
          const int32_t iz = out_coords[o * 3 + 0] * stride[0] + tz - pad[0];
          const int32_t iy = out_coords[o * 3 + 1] * stride[1] + ty - pad[1];
          const int32_t ix = out_coords[o * 3 + 2] * stride[2] + tx - pad[2];
          const int64_t key = lin_key(iz, iy, ix, grid);
          if (key < 0) continue;
          const int32_t j = table.find(key);
          if (j >= 0) {
            gi[o] = j;
            fo[o] = 1;
          }
        }
      }
  return (int)num_out;
}

// ---------------------------------------------------------------------------
// Combined per-block rulebook build — sort + two-pointer merge.
//
// The hash-table builders above cost ~25 ns/probe; this version exploits
// that every kernel tap's query stream is the (bounds-checked) input key
// stream plus a constant, hence already sorted: one sort of the active
// keys serves every tap of both the submanifold rulebook and the strided
// layout via sequential two-pointer merges (O(N) per tap, cache-friendly).
// Semantics identical to abr_subm_rulebook + abr_strided_layout.

namespace {

struct SortedKeys {
  std::vector<int64_t> keys;   // ascending, valid rows only
  std::vector<int32_t> idx;    // original row per sorted key
  std::vector<int32_t> cz, cy, cx;  // coords in sorted order (sequential)
};

SortedKeys sort_keys(const int32_t* coords, int64_t N, const int32_t* grid) {
  SortedKeys s;
  std::vector<std::pair<int64_t, int32_t>> kv;
  kv.reserve(N);
  for (int64_t i = 0; i < N; ++i) {
    const int32_t* c = coords + i * 3;
    if (c[0] < 0) continue;
    const int64_t key = lin_key(c[0], c[1], c[2], grid);
    if (key >= 0) kv.emplace_back(key, (int32_t)i);
  }
  std::sort(kv.begin(), kv.end());
  const int64_t M = (int64_t)kv.size();
  s.keys.resize(M); s.idx.resize(M);
  s.cz.resize(M); s.cy.resize(M); s.cx.resize(M);
  for (int64_t q = 0; q < M; ++q) {
    s.keys[q] = kv[q].first;
    const int32_t row = kv[q].second;
    s.idx[q] = row;
    s.cz[q] = coords[row * 3 + 0];
    s.cy[q] = coords[row * 3 + 1];
    s.cx[q] = coords[row * 3 + 2];
  }
  return s;
}

// One merge walk resolves ALL kz z-taps at once: for a fixed (dy, dx)
// the dz query keys are consecutive integers (depth-minor keys), so after
// advancing the pointer the candidates sit in keys[j..j+kz-1] (keys are
// unique).  gi/fo are the tap-major outputs with row stride N;
// k_base = tap index of (dz == -(kz/2), dy, dx); k_stride = ky*kx.
inline void merge_tapz(const SortedKeys& s, const int32_t* grid,
                       int32_t dy, int32_t dx, int32_t kz, int64_t k_base,
                       int64_t k_stride, int64_t N,
                       int32_t* gi, uint8_t* fo) {
  const int64_t M = (int64_t)s.keys.size();
  const int32_t D = grid[0];
  const int32_t z_lo = -(kz / 2);
  const int64_t delta = ((int64_t)dy * grid[2] + dx) * grid[0] + z_lo;
  int64_t j = 0;
  for (int64_t q = 0; q < M; ++q) {
    const int32_t y = s.cy[q] + dy, x = s.cx[q] + dx;
    if (y < 0 || y >= grid[1] || x < 0 || x >= grid[2]) continue;
    const int32_t z0 = s.cz[q] + z_lo;       // z of the first z-tap
    const int64_t qbase = s.keys[q] + delta;
    while (j < M && s.keys[j] < qbase) ++j;
    const int32_t row = s.idx[q];
    for (int64_t jj = j; jj < M && jj < j + kz &&
                         s.keys[jj] <= qbase + kz - 1; ++jj) {
      const int64_t d = s.keys[jj] - qbase;  // dz tap offset 0..kz-1
      if (d < 0 || d >= kz) continue;
      const int32_t zq = z0 + (int32_t)d;    // column-wrap guard
      if (zq < 0 || zq >= D) continue;
      gi[(k_base + d * k_stride) * N + row] = s.idx[jj];
      fo[(k_base + d * k_stride) * N + row] = 1;
    }
  }
}

// Ascending set-bit scan over a bitmap of out_total cells.
struct Bitmap {
  std::vector<uint64_t> words;
  explicit Bitmap(int64_t n) : words((size_t)((n + 63) / 64), 0) {}
  inline void set(int64_t i) { words[i >> 6] |= (1ULL << (i & 63)); }
};

}  // namespace

// One call builds everything models/middle.SparseMiddle needs for a block:
// the submanifold rulebook over the input sites and the strided layout +
// rulebook of the downsample conv.  Returns num_out of the strided conv.
int abr_block_rulebooks(const int32_t* coords, int64_t N,
                        const int32_t* grid, const int32_t* ksize,
                        const int32_t* stride, const int32_t* pad,
                        int64_t max_out, int32_t* subm_idx,
                        uint8_t* subm_found, int32_t* out_coords,
                        uint8_t* out_valid, int32_t* down_idx,
                        uint8_t* down_found) {
  const SortedKeys s = sort_keys(coords, N, grid);
  const int32_t kz = ksize[0], ky = ksize[1], kx = ksize[2];
  const int64_t M = (int64_t)s.keys.size();

  // submanifold rulebook: centered offsets, dz slowest in tap order.
  // Depth-minor keys make the kz z-taps of each (dy, dx) consecutive —
  // one merge walk resolves the whole z-column of taps.
  std::memset(subm_idx, 0, sizeof(int32_t) * kz * ky * kx * N);
  std::memset(subm_found, 0, sizeof(uint8_t) * kz * ky * kx * N);
  {
    const int64_t k_stride = (int64_t)ky * kx;
    int64_t base = 0;
    for (int32_t dy = -(ky / 2); dy < ky - ky / 2; ++dy)
      for (int32_t dx = -(kx / 2); dx < kx - kx / 2; ++dx, ++base)
        merge_tapz(s, grid, dy, dx, kz, base, k_stride, N, subm_idx,
                   subm_found);
  }

  // strided output sites: mark candidate cells in a bitmap over the
  // output grid, then scan words ascending — O(cands + out_total/64),
  // no sort.
  int32_t out_grid[3];
  for (int d = 0; d < 3; ++d)
    out_grid[d] = (grid[d] + 2 * pad[d] - ksize[d]) / stride[d] + 1;
  const int64_t out_total =
      (int64_t)out_grid[0] * out_grid[1] * out_grid[2];
  Bitmap bm(out_total);
  for (int64_t q = 0; q < M; ++q) {
    const int32_t c3[3] = {s.cz[q], s.cy[q], s.cx[q]};
    int32_t lo[3], hi[3];
    for (int d = 0; d < 3; ++d) {
      const int32_t ip = c3[d] + pad[d];
      int32_t l = ip - ksize[d] + 1;
      lo[d] = l >= 0 ? (l + stride[d] - 1) / stride[d] : -((-l) / stride[d]);
      hi[d] = ip / stride[d];
      if (lo[d] < 0) lo[d] = 0;
      if (hi[d] >= out_grid[d]) hi[d] = out_grid[d] - 1;
    }
    for (int32_t oz = lo[0]; oz <= hi[0]; ++oz)
      for (int32_t oy = lo[1]; oy <= hi[1]; ++oy)
        for (int32_t ox = lo[2]; ox <= hi[2]; ++ox)
          bm.set(((int64_t)oy * out_grid[2] + ox) * out_grid[0] + oz);
  }
  int64_t num_out = 0;
  const int64_t n_words = (int64_t)bm.words.size();
  for (int64_t w = 0; w < n_words && num_out < max_out; ++w) {
    uint64_t bits = bm.words[w];
    while (bits && num_out < max_out) {
      const int b = __builtin_ctzll(bits);
      bits &= bits - 1;
      const int64_t key = (w << 6) | b;
      out_coords[num_out * 3 + 0] = (int32_t)(key % out_grid[0]);
      out_coords[num_out * 3 + 1] =
          (int32_t)(key / ((int64_t)out_grid[2] * out_grid[0]));
      out_coords[num_out * 3 + 2] =
          (int32_t)((key / out_grid[0]) % out_grid[2]);
      out_valid[num_out] = 1;
      ++num_out;
    }
  }
  for (int64_t o = num_out; o < max_out; ++o) {
    out_coords[o * 3 + 0] = -1;
    out_coords[o * 3 + 1] = -1;
    out_coords[o * 3 + 2] = -1;
    out_valid[o] = 0;
  }

  // strided rulebook: out-site query keys ascend with out_coords
  // (sorted-unique); for any kz the z-taps of a fixed (ty, tx) give
  // consecutive query keys — one walk per (ty, tx).
  std::memset(down_idx, 0, sizeof(int32_t) * kz * ky * kx * max_out);
  std::memset(down_found, 0, sizeof(uint8_t) * kz * ky * kx * max_out);
  const int64_t t_stride = (int64_t)ky * kx;
  int64_t t_base = 0;
  for (int32_t ty = 0; ty < ky; ++ty)
    for (int32_t tx = 0; tx < kx; ++tx, ++t_base) {
      int64_t j = 0;
      for (int64_t o = 0; o < num_out; ++o) {
        const int32_t iy = out_coords[o * 3 + 1] * stride[1] + ty - pad[1];
        const int32_t ix = out_coords[o * 3 + 2] * stride[2] + tx - pad[2];
        if (iy < 0 || iy >= grid[1] || ix < 0 || ix >= grid[2]) continue;
        const int32_t iz0 = out_coords[o * 3 + 0] * stride[0] - pad[0];
        const int64_t qbase =
            ((int64_t)iy * grid[2] + ix) * grid[0] + iz0;
        while (j < M && s.keys[j] < qbase) ++j;
        for (int64_t jj = j; jj < M && jj < j + kz &&
                             s.keys[jj] <= qbase + kz - 1; ++jj) {
          const int64_t d = s.keys[jj] - qbase;   // tz = 0..kz-1
          if (d < 0 || d >= kz) continue;
          const int32_t zq = iz0 + (int32_t)d;
          if (zq < 0 || zq >= grid[0]) continue;
          down_idx[(t_base + d * t_stride) * max_out + o] = s.idx[jj];
          down_found[(t_base + d * t_stride) * max_out + o] = 1;
        }
      }
    }
  return (int)num_out;  return (int)num_out;
}

}  // extern "C"
