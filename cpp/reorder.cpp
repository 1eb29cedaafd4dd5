// Reverse Cuthill-McKee node reordering over a CSR graph.
//
// TPU-native locality pass: XLA's random-row gather is row-rate bound
// (~227M rows/s on v5e), so full-batch SpMM on an arbitrary node order
// is stuck near 116 GB/s.  Reordering nodes so neighbors get nearby ids
// turns per-row random access into contiguous slabs the slab-SpMM path
// (ops/spmm.py) can DMA in bulk.  The reference has no analog (GPU L2
// absorbs locality); this is the TPU replacement for that cache.
//
// Classic RCM: BFS from a minimum-degree seed per component, visiting
// each frontier's unvisited neighbors in ascending-degree order, then
// reverse the visit order.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// indptr: (n+1) int64, indices: (E) int32, order_out: (n) int32 where
// order_out[new_id] = old_id.
void rcm_order_i32(const int64_t* indptr, const int32_t* indices,
                   int64_t n, int32_t* order_out) {
  std::vector<int32_t> deg(n);
  for (int64_t i = 0; i < n; ++i)
    deg[i] = static_cast<int32_t>(indptr[i + 1] - indptr[i]);

  // Seeds in ascending degree order (counting sort by degree).
  std::vector<int32_t> by_deg(n);
  {
    int32_t maxd = 0;
    for (int64_t i = 0; i < n; ++i) maxd = std::max(maxd, deg[i]);
    std::vector<int64_t> cnt(static_cast<int64_t>(maxd) + 2, 0);
    for (int64_t i = 0; i < n; ++i) cnt[deg[i] + 1]++;
    for (int64_t d = 1; d < static_cast<int64_t>(cnt.size()); ++d)
      cnt[d] += cnt[d - 1];
    for (int64_t i = 0; i < n; ++i)
      by_deg[cnt[deg[i]]++] = static_cast<int32_t>(i);
  }

  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<int32_t> nbrs;
  int64_t seed_cursor = 0;

  while (static_cast<int64_t>(order.size()) < n) {
    while (seed_cursor < n && visited[by_deg[seed_cursor]]) ++seed_cursor;
    int32_t seed = by_deg[seed_cursor];
    visited[seed] = 1;
    size_t head = order.size();
    order.push_back(seed);
    while (head < order.size()) {
      int32_t u = order[head++];
      nbrs.clear();
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int32_t v = indices[e];
        if (v >= 0 && v < n && !visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });
      for (int32_t v : nbrs) order.push_back(v);
    }
  }
  std::reverse(order.begin(), order.end());
  std::copy(order.begin(), order.end(), order_out);
}

// Relabel a CSR by a node order: new node i = order[i]; neighbor ids
// mapped through the inverse permutation and sorted within each row.
// new_indptr: (n+1) int64, new_indices: (E) int32, edge_perm: (E) int64
// mapping new edge position -> old edge position (for carrying edge
// attributes/ids through the reorder).
void apply_order_csr_i32(const int64_t* indptr, const int32_t* indices,
                         const int32_t* order, int64_t n,
                         int64_t* new_indptr, int32_t* new_indices,
                         int64_t* edge_perm) {
  std::vector<int32_t> inv(n);
  for (int64_t i = 0; i < n; ++i) inv[order[i]] = static_cast<int32_t>(i);
  new_indptr[0] = 0;
  std::vector<std::pair<int32_t, int64_t>> row;
  for (int64_t i = 0; i < n; ++i) {
    int32_t old_row = order[i];
    int64_t start = indptr[old_row], len = indptr[old_row + 1] - start;
    row.clear();
    for (int64_t j = 0; j < len; ++j) {
      int32_t v = indices[start + j];
      row.emplace_back((v >= 0 && v < n) ? inv[v] : v, start + j);
    }
    std::sort(row.begin(), row.end());
    int64_t dst = new_indptr[i];
    for (int64_t j = 0; j < len; ++j) {
      new_indices[dst + j] = row[j].first;
      edge_perm[dst + j] = row[j].second;
    }
    new_indptr[i + 1] = dst + len;
  }
}

}  // extern "C"
