// Native host-side runtime kernels for gsorb_slam_tpu.
//
// The reference implements its entire host runtime in C++ (SURVEY.md §2);
// the pieces that remain host-sequential in the TPU-era design live here:
//
//  - quadtree_distribute: the exact ORB quad-tree spatial balancing
//    (the DistributeOctTree algorithm family: recursively split the image
//    region into 4 until there are >= N cells, then keep the best-response
//    keypoint per cell). The vectorized-JAX extractor uses per-cell top-k,
//    which approximates this; linking the native library restores the exact
//    selection semantics at C++ speed.
//  - associate_timestamps: greedy nearest-timestamp association for TUM
//    rgb/depth pairing (the hot loop of the dataset layer).
//
// Built as a plain C ABI shared library (no pybind11 dependency); loaded
// from Python via ctypes (gsorb_slam_tpu/frontend/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <list>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Quad-tree keypoint distribution.
// Inputs: n keypoints (x[i], y[i], response[i]) inside [min_x,max_x)x[min_y,max_y),
// target count n_keep. Output: keep[i] = 1 for selected keypoints.
// Returns number selected.
// ---------------------------------------------------------------------------

struct Node {
  float x0, y0, x1, y1;
  std::vector<int> idx;
  bool no_more = false;  // single keypoint: never subdivide again
};

int quadtree_distribute(const float* x, const float* y, const float* response,
                        int n, float min_x, float min_y, float max_x,
                        float max_y, int n_keep, uint8_t* keep) {
  std::memset(keep, 0, n);
  if (n == 0) return 0;
  if (n <= n_keep) {
    std::memset(keep, 1, n);
    return n;
  }

  std::list<Node> nodes;
  // Initial nodes: square-ish columns, as in the classic implementation.
  const float w = max_x - min_x, h = max_y - min_y;
  const int n_init = std::max(1, (int)std::round(w / std::max(h, 1.0f)));
  const float hx = w / n_init;
  for (int i = 0; i < n_init; ++i) {
    Node nd;
    nd.x0 = min_x + i * hx;
    nd.x1 = min_x + (i + 1) * hx;
    nd.y0 = min_y;
    nd.y1 = max_y;
    nodes.push_back(std::move(nd));
  }
  for (int i = 0; i < n; ++i) {
    int c = std::min((int)((x[i] - min_x) / hx), n_init - 1);
    c = std::max(c, 0);
    auto it = nodes.begin();
    std::advance(it, c);
    it->idx.push_back(i);
  }
  for (auto it = nodes.begin(); it != nodes.end();) {
    if (it->idx.empty())
      it = nodes.erase(it);
    else {
      it->no_more = it->idx.size() == 1;
      ++it;
    }
  }

  bool finished = false;
  while (!finished) {
    finished = true;
    const size_t prev_size = nodes.size();
    std::vector<std::pair<int, Node*>> to_expand;  // (count, node)
    for (auto it = nodes.begin(); it != nodes.end();) {
      if (it->no_more) {
        ++it;
        continue;
      }
      // Subdivide into 4 children.
      Node& parent = *it;
      const float mx = 0.5f * (parent.x0 + parent.x1);
      const float my = 0.5f * (parent.y0 + parent.y1);
      Node ch[4];
      ch[0] = {parent.x0, parent.y0, mx, my, {}};
      ch[1] = {mx, parent.y0, parent.x1, my, {}};
      ch[2] = {parent.x0, my, mx, parent.y1, {}};
      ch[3] = {mx, my, parent.x1, parent.y1, {}};
      for (int i : parent.idx) {
        const int cx = x[i] < mx ? 0 : 1;
        const int cy = y[i] < my ? 0 : 1;
        ch[cx + 2 * cy].idx.push_back(i);
      }
      it = nodes.erase(it);
      for (int c = 0; c < 4; ++c) {
        if (ch[c].idx.empty()) continue;
        ch[c].no_more = ch[c].idx.size() == 1;
        nodes.push_front(std::move(ch[c]));
      }
      if ((int)nodes.size() >= n_keep) break;
    }
    if ((int)nodes.size() >= n_keep || nodes.size() == prev_size)
      finished = true;
    else
      finished = false;
    // Stop when every node holds one keypoint.
    if (!finished) {
      bool all_single = true;
      for (auto& nd : nodes)
        if (!nd.no_more) {
          all_single = false;
          break;
        }
      if (all_single) finished = true;
    }
  }

  // Keep the best-response keypoint of each node, best nodes first.
  std::vector<std::pair<float, int>> winners;
  winners.reserve(nodes.size());
  for (auto& nd : nodes) {
    int best = nd.idx[0];
    for (int i : nd.idx)
      if (response[i] > response[best]) best = i;
    winners.push_back({response[best], best});
  }
  std::sort(winners.begin(), winners.end(),
            [](const auto& a, const auto& b) { return a.first > b.first; });
  int kept = 0;
  for (auto& wv : winners) {
    if (kept >= n_keep) break;
    keep[wv.second] = 1;
    ++kept;
  }
  return kept;
}

// ---------------------------------------------------------------------------
// Greedy nearest-timestamp association (TUM rgb/depth pairing).
// out_pairs: [max_pairs * 2] (i, j) indices; returns count.
// ---------------------------------------------------------------------------

int associate_timestamps(const double* a, int na, const double* b, int nb,
                         double max_dt, int32_t* out_pairs, int max_pairs) {
  std::vector<uint8_t> used(nb, 0);
  int count = 0;
  int j0 = 0;
  for (int i = 0; i < na && count < max_pairs; ++i) {
    // advance a moving lower bound (timestamps are sorted)
    while (j0 + 1 < nb && b[j0 + 1] <= a[i]) ++j0;
    int best = -1;
    double best_dt = max_dt;
    for (int j = std::max(0, j0 - 2); j < std::min(nb, j0 + 3); ++j) {
      const double dt = std::fabs(b[j] - a[i]);
      if (dt < best_dt && !used[j]) {
        best_dt = dt;
        best = j;
      }
    }
    if (best >= 0) {
      used[best] = 1;
      out_pairs[2 * count] = i;
      out_pairs[2 * count + 1] = best;
      ++count;
    }
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Exact 3-nearest-neighbor mean squared distance (the reference's
// simple_knn/distCUDA2 semantics, src/simple_knn.cu:45-221: Morton boxes +
// AABB rejection; here a uniform spatial grid with ring-expansion search —
// exact because rings expand until the ring's minimum possible distance
// exceeds the current 3rd-best). Used by splat scale-init methods 0/1
// (src/Gaussian.cc:50-72); the default method 2 never calls it.
// ---------------------------------------------------------------------------

extern "C" int exact_knn3(const float* pts, const uint8_t* valid, int n,
                          float* out_mean_sq) {
  // collect valid indices
  std::vector<int> ids;
  ids.reserve(n);
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < n; ++i) {
    out_mean_sq[i] = 0.0f;
    if (!valid[i]) continue;
    ids.push_back(i);
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  }
  const int m = (int)ids.size();
  if (m <= 1) return 0;
  if (m <= 4) {  // tiny: brute force
    for (int a : ids) {
      float best[3] = {1e30f, 1e30f, 1e30f};
      for (int b : ids) {
        if (a == b) continue;
        float d2 = 0;
        for (int d = 0; d < 3; ++d) {
          float dd = pts[3 * a + d] - pts[3 * b + d];
          d2 += dd * dd;
        }
        if (d2 < best[0]) { best[2] = best[1]; best[1] = best[0]; best[0] = d2; }
        else if (d2 < best[1]) { best[2] = best[1]; best[1] = d2; }
        else if (d2 < best[2]) { best[2] = d2; }
      }
      int k = std::min(m - 1, 3);
      float s = 0; for (int j = 0; j < k; ++j) s += best[j];
      out_mean_sq[a] = s / std::max(k, 1);
    }
    return 0;
  }
  // grid with ~2 points per cell on average
  float ext[3];
  for (int d = 0; d < 3; ++d) ext[d] = std::max(hi[d] - lo[d], 1e-9f);
  const float vol = ext[0] * ext[1] * ext[2];
  float cell = std::cbrt(vol * 2.0f / m);
  cell = std::max(cell, 1e-9f);
  int gs[3];
  for (int d = 0; d < 3; ++d)
    gs[d] = std::max(1, std::min(512, (int)std::ceil(ext[d] / cell)));
  const int ncells = gs[0] * gs[1] * gs[2];
  std::vector<int> cell_of(m), count(ncells + 1, 0);
  auto cell_idx = [&](const float* p) {
    int c[3];
    for (int d = 0; d < 3; ++d) {
      c[d] = (int)((p[d] - lo[d]) / ext[d] * gs[d]);
      c[d] = std::max(0, std::min(gs[d] - 1, c[d]));
    }
    return (c[2] * gs[1] + c[1]) * gs[0] + c[0];
  };
  for (int j = 0; j < m; ++j) {
    cell_of[j] = cell_idx(pts + 3 * ids[j]);
    count[cell_of[j] + 1]++;
  }
  for (int c = 0; c < ncells; ++c) count[c + 1] += count[c];
  std::vector<int> bucket(m);
  { std::vector<int> cur(count.begin(), count.end() - 1);
    for (int j = 0; j < m; ++j) bucket[cur[cell_of[j]]++] = ids[j]; }

  const float cw[3] = {ext[0] / gs[0], ext[1] / gs[1], ext[2] / gs[2]};
  const float min_cw = std::min(cw[0], std::min(cw[1], cw[2]));
  for (int j = 0; j < m; ++j) {
    const int a = ids[j];
    const float* p = pts + 3 * a;
    int c[3];
    for (int d = 0; d < 3; ++d) {
      c[d] = (int)((p[d] - lo[d]) / ext[d] * gs[d]);
      c[d] = std::max(0, std::min(gs[d] - 1, c[d]));
    }
    float best[3] = {1e30f, 1e30f, 1e30f};
    int found = 0;
    const int max_ring =
        std::max(gs[0], std::max(gs[1], gs[2]));
    for (int ring = 0; ring <= max_ring; ++ring) {
      // exact termination: the closest any unvisited ring-cell point can be
      // is (ring-1) * min cell width from the query's cell boundary.
      if (found >= 3) {
        const float ring_min = (ring - 1) * min_cw;
        if (ring_min > 0 && ring_min * ring_min > best[2]) break;
      }
      for (int z = c[2] - ring; z <= c[2] + ring; ++z)
        for (int y = c[1] - ring; y <= c[1] + ring; ++y)
          for (int x = c[0] - ring; x <= c[0] + ring; ++x) {
            // shell only, in UNCLAMPED coords (clamped bounds would
            // revisit edge cells and double-count their points)
            const int cheb = std::max(std::abs(x - c[0]),
                                      std::max(std::abs(y - c[1]),
                                               std::abs(z - c[2])));
            if (cheb != ring) continue;
            if (x < 0 || y < 0 || z < 0 || x >= gs[0] || y >= gs[1] ||
                z >= gs[2])
              continue;
            const int cc = (z * gs[1] + y) * gs[0] + x;
            for (int t = count[cc]; t < count[cc + 1]; ++t) {
              const int b = bucket[t];
              if (b == a) continue;
              float d2 = 0;
              for (int d = 0; d < 3; ++d) {
                const float dd = p[d] - pts[3 * b + d];
                d2 += dd * dd;
              }
              if (d2 < best[0]) { best[2] = best[1]; best[1] = best[0]; best[0] = d2; ++found; }
              else if (d2 < best[1]) { best[2] = best[1]; best[1] = d2; ++found; }
              else if (d2 < best[2]) { best[2] = d2; ++found; }
            }
          }
    }
    const int k = std::min(m - 1, 3);
    float s = 0;
    for (int q = 0; q < k; ++q) s += best[q];
    out_mean_sq[a] = s / std::max(k, 1);
  }
  return 0;
}
