// Shared elimination-tree column-count walk (Liu's algorithm) — used by
// the supernodal LDL' symbolic phase (sparse_ldl_sn.cpp) and the exact
// fill counter behind the ordering auto-pick (amd_order.cpp).  The scalar
// backend (sparse_ldl.cpp) keeps its own integrated copy because its
// symbolic phase fills the factor structure in the same pass.
//
// Input: CSC pattern where, for column k, only entries with row < k
// participate (upper-triangular content; full-symmetric input is fine —
// rows >= k are skipped by the walk condition).
#pragma once

#include <vector>

inline void etree_column_counts(int n, const int *Ap, const int *Ai,
                                std::vector<int> &parent,
                                std::vector<int> &Lnz) {
  parent.assign(n, -1);
  Lnz.assign(n, 0);
  std::vector<int> flag(n, -1);
  for (int k = 0; k < n; ++k) {
    parent[k] = -1;
    flag[k] = k;
    for (int p = Ap[k]; p < Ap[k + 1]; ++p) {
      int i = Ai[p];
      while (i < k && flag[i] != k) {
        if (parent[i] == -1) parent[i] = k;
        Lnz[i]++;
        flag[i] = k;
        i = parent[i];
      }
    }
  }
}
