// Native (C++) mesh topology kernel: unique-facet extraction.
//
// The role of DOLFINx's C++ mesh/topology core in the reference stack
// (SURVEY §2b "DOLFINx mesh + topology"): given the cell-vertex array and
// the local-facet pattern, produce the unique facet list, facet->cell
// adjacency, local facet indices, and the per-(cell,local-facet) facet id.
// Sort-based (O(M log M)), single pass, no hashing.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// toolchain); compiled on demand by oasisx_tpu.native (g++ -O3 -shared).

#include <algorithm>
#include <array>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// cells:        (ncells * nverts_cell) int32
// local_facets: (nlf * fnv) int32 local vertex indices per local facet
// out_inverse:  (ncells * nlf) facet id for each (cell, local facet)
// out_facets:   capacity (ncells * nlf * fnv); unique sorted-vertex facets
// out_cells:    capacity (ncells * nlf * 2); owning cells (-1 pad)
// out_local:    capacity (ncells * nlf * 2); local facet ids (-1 pad)
// returns number of unique facets
int64_t build_facet_topology(const int32_t* cells, int64_t ncells,
                             int32_t nverts_cell, const int32_t* local_facets,
                             int32_t nlf, int32_t fnv, int32_t* out_inverse,
                             int32_t* out_facets, int32_t* out_cells,
                             int32_t* out_local) {
  const int64_t m = ncells * nlf;
  std::vector<std::array<int32_t, 3>> keys(m);  // fnv <= 3
  for (int64_t c = 0; c < ncells; ++c) {
    const int32_t* cv = cells + c * nverts_cell;
    for (int32_t lf = 0; lf < nlf; ++lf) {
      std::array<int32_t, 3> k = {0, 0, 0};
      for (int32_t j = 0; j < fnv; ++j) k[j] = cv[local_facets[lf * fnv + j]];
      std::sort(k.begin(), k.begin() + fnv);
      keys[c * nlf + lf] = k;
    }
  }
  std::vector<int64_t> order(m);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (keys[a] != keys[b]) return keys[a] < keys[b];
    return a < b;  // stable tie-break: matches NumPy first-occurrence slots
  });

  int64_t nf = -1;
  std::array<int32_t, 3> prev = {-1, -1, -1};
  for (int64_t i = 0; i < m; ++i) {
    const int64_t idx = order[i];
    const auto& k = keys[idx];
    if (nf < 0 || k != prev) {
      ++nf;
      prev = k;
      for (int32_t j = 0; j < fnv; ++j) out_facets[nf * fnv + j] = k[j];
      out_cells[nf * 2] = -1;
      out_cells[nf * 2 + 1] = -1;
      out_local[nf * 2] = -1;
      out_local[nf * 2 + 1] = -1;
    }
    const int32_t cell = static_cast<int32_t>(idx / nlf);
    const int32_t lf = static_cast<int32_t>(idx % nlf);
    const int slot = out_cells[nf * 2] < 0 ? 0 : 1;
    out_cells[nf * 2 + slot] = cell;
    out_local[nf * 2 + slot] = lf;
    out_inverse[idx] = static_cast<int32_t>(nf);
  }
  return nf + 1;
}

// Unique sorted rows of an (n x k) int32 array (entity deduplication for
// edge/face numbering). Returns count; fills out_rows and out_ids
// (row -> unique id).
int64_t unique_rows(const int32_t* rows, int64_t n, int32_t k,
                    int32_t* out_rows, int32_t* out_ids) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  auto less = [&](int64_t a, int64_t b) {
    const int32_t* ra = rows + a * k;
    const int32_t* rb = rows + b * k;
    for (int32_t j = 0; j < k; ++j) {
      if (ra[j] != rb[j]) return ra[j] < rb[j];
    }
    return a < b;  // stable
  };
  std::sort(order.begin(), order.end(), less);
  auto equal = [&](int64_t a, int64_t b) {
    const int32_t* ra = rows + a * k;
    const int32_t* rb = rows + b * k;
    for (int32_t j = 0; j < k; ++j)
      if (ra[j] != rb[j]) return false;
    return true;
  };
  int64_t nu = -1;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t idx = order[i];
    if (nu < 0 || !equal(order[i - 1], idx)) {
      ++nu;
      for (int32_t j = 0; j < k; ++j) out_rows[nu * k + j] = rows[idx * k + j];
    }
    out_ids[idx] = static_cast<int32_t>(nu);
  }
  return nu + 1;
}

}  // extern "C"
