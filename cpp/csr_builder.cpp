// Native CSR construction: parallel counting sort over edges.
//
// TPU-native equivalent of the graph-construction work the reference
// offloads to libcugraph's MGGraph build (ref
// cugraph_pyg/data/graph_store.py:263-329) and of the CSR layout consumed
// by the sampling kernels (ref cpp/src/wholegraph_ops/*).  Host-side here
// (graph prep is a host job on TPU systems); O(E) with per-thread
// histograms instead of a comparison sort.
//
// C ABI so Python binds via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

}  // namespace

extern "C" {

// Build CSR over rows = key[], cols = val[].  Outputs:
//   indptr  (num_nodes+1) int64
//   indices (num_edges)   int32  — val reordered by key
//   perm    (num_edges)   int64  — CSR position -> original edge index
// Stable within a row (insertion order preserved per thread range, then
// by thread id — matches a stable sort for deterministic tests).
void build_csr_i32(const int32_t* key, const int32_t* val, int64_t num_edges,
                   int64_t num_nodes, int64_t* indptr, int32_t* indices,
                   int64_t* perm) {
  const int nt = hw_threads();
  const int64_t chunk = (num_edges + nt - 1) / nt;

  // Per-thread histogram.
  std::vector<std::vector<int64_t>> hist(nt);
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
      ts.emplace_back([&, t] {
        auto& h = hist[t];
        h.assign(num_nodes, 0);
        const int64_t lo = t * chunk;
        const int64_t hi = std::min(num_edges, lo + chunk);
        for (int64_t i = lo; i < hi; ++i) ++h[key[i]];
      });
    }
    for (auto& th : ts) th.join();
  }

  // Exclusive scan: global row offsets, then per-thread write cursors.
  // cursor[t][r] = indptr[r] + sum_{t'<t} hist[t'][r]
  std::vector<int64_t> total(num_nodes, 0);
  for (int t = 0; t < nt; ++t)
    for (int64_t r = 0; r < num_nodes; ++r) total[r] += hist[t][r];
  indptr[0] = 0;
  for (int64_t r = 0; r < num_nodes; ++r) indptr[r + 1] = indptr[r] + total[r];

  // Convert hist to per-thread start cursors.
  std::vector<std::vector<int64_t>> cursor(nt);
  for (int64_t r = 0; r < num_nodes; ++r) {
    int64_t off = indptr[r];
    for (int t = 0; t < nt; ++t) {
      int64_t c = hist[t][r];
      cursor.resize(nt);
      if (cursor[t].empty()) cursor[t].assign(num_nodes, 0);
      cursor[t][r] = off;
      off += c;
    }
  }

  // Scatter pass.
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
      ts.emplace_back([&, t] {
        auto& cur = cursor[t];
        const int64_t lo = t * chunk;
        const int64_t hi = std::min(num_edges, lo + chunk);
        for (int64_t i = lo; i < hi; ++i) {
          const int64_t p = cur[key[i]]++;
          indices[p] = val[i];
          perm[p] = i;
        }
      });
    }
    for (auto& th : ts) th.join();
  }
}

// Degree histogram only (for partition planning / max-degree bounds).
void degrees_i32(const int32_t* key, int64_t num_edges, int64_t num_nodes,
                 int64_t* out_deg) {
  std::memset(out_deg, 0, sizeof(int64_t) * num_nodes);
  const int nt = hw_threads();
  const int64_t chunk = (num_edges + nt - 1) / nt;
  std::vector<std::vector<int64_t>> hist(nt);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&, t] {
      auto& h = hist[t];
      h.assign(num_nodes, 0);
      const int64_t lo = t * chunk;
      const int64_t hi = std::min(num_edges, lo + chunk);
      for (int64_t i = lo; i < hi; ++i) ++h[key[i]];
    });
  }
  for (auto& th : ts) th.join();
  for (int t = 0; t < nt; ++t)
    for (int64_t r = 0; r < num_nodes; ++r) out_deg[r] += hist[t][r];
}

}  // extern "C"
