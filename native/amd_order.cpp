// Approximate-minimum-degree fill-reducing ordering — the framework's
// equivalent of the AMD ordering LADEL applies before its LDL'
// factorizations (reference: solver_interface.c:336/383 passes
// work->settings->ordering into ladel_factorize_advanced*).  scipy exposes
// only reverse Cuthill-McKee, which is right for banded matrices but poor
// for general sparsity; this provides the quotient-graph minimum-degree
// ordering (with Amestoy/Davis/Duff-style approximate external degrees)
// that the direct sparse path needs on irregular patterns.
//
// Simplified relative to full AMD (deliberately, for auditability):
// supervariable merging / mass elimination is omitted — every variable is
// eliminated individually.  Element absorption and the stamped
// |Le \ Lp| degree bound (the two ingredients that dominate ordering
// quality) are implemented.  The quotient-graph invariants used:
//   * a variable i's adjacency list is [elements..., direct neighbours...]
//     (elen[i] elements first, len[i] total);
//   * eliminating pivot p forms element p with variable list
//     Lp = (vars of p's elements) u (live direct nbrs of p);
//   * each i in Lp is rebuilt as [p, surviving elements, direct nbrs
//     outside Lp] and gets approximate external degree
//       d(i) = min(n-nel-1, d_old + |Lp|-1,
//                  |Lp|-1 + |direct \ Lp| + sum_e |Le \ Lp|)
//     with all |Le \ Lp| computed in one stamped counting pass;
//   * an element with |Le \ Lp| = 0 is absorbed into p.
//
// Output: perm[k] = original index of the k-th pivot (a valid permutation
// of 0..n-1; tests assert validity and compare LDL' fill against RCM).
// Input: FULL symmetric CSC pattern (both triangles); diagonal ignored.

#include <algorithm>
#include <climits>
#include <vector>

#include "etree_common.h"

namespace {

struct AMD {
  int n;
  std::vector<int> pe;     // list start in iw; -1 for absorbed elements
  std::vector<int> len;    // total list length
  std::vector<int> elen;   // #elements at list head; -1 once eliminated
  std::vector<int> degree; // vars: approx external degree; elems: |Le|
  std::vector<long> w;     // stamped counters (elements), marks (vars)
  std::vector<int> head, nxt, prv;  // degree buckets
  std::vector<int> iw;
  long iwlen = 0, pfree = 0;
  int mindeg = 0;
  long wflg = 2;

  bool is_var(int i) const { return elen[i] >= 0; }

  void deg_insert(int i) {
    int d = std::min(degree[i], n - 1);
    prv[i] = -1;
    nxt[i] = head[d];
    if (head[d] != -1) prv[head[d]] = i;
    head[d] = i;
    if (d < mindeg) mindeg = d;
  }
  void deg_remove(int i) {
    int d = std::min(degree[i], n - 1);
    if (prv[i] != -1) nxt[prv[i]] = nxt[i];
    else if (head[d] == i) head[d] = nxt[i];
    if (nxt[i] != -1) prv[nxt[i]] = prv[i];
    prv[i] = nxt[i] = -1;
  }

  void garbage_collect() {
    std::vector<std::pair<long, int>> lists;
    for (int i = 0; i < n; ++i)
      if (pe[i] >= 0 && len[i] > 0 &&
          (is_var(i) || degree[i] > 0))  // live var or live element
        lists.push_back({(long)pe[i], i});
    std::sort(lists.begin(), lists.end());
    long dst = 0;
    for (auto &pr : lists) {
      long src = pr.first;
      int owner = pr.second;
      pe[owner] = (int)dst;
      for (int k = 0; k < len[owner]; ++k) iw[dst++] = iw[src + k];
    }
    pfree = dst;
  }

  void ensure_space(long need) {
    if (pfree + need <= iwlen) return;
    garbage_collect();
    if (pfree + need > iwlen) {
      iwlen = std::max(2 * iwlen, pfree + need + n);
      iw.resize(iwlen);
    }
  }

  void run(const int *Ap, const int *Ai, int *perm) {
    pe.assign(n, 0);
    len.assign(n, 0);
    elen.assign(n, 0);
    degree.assign(n, 0);
    w.assign(n, 0);
    head.assign(n, -1);
    nxt.assign(n, -1);
    prv.assign(n, -1);
    long nz = 0;
    for (int j = 0; j < n; ++j)
      for (int p = Ap[j]; p < Ap[j + 1]; ++p)
        if (Ai[p] != j) nz++;
    iwlen = 2 * nz + 8L * n + 16;
    // pe[] stores list offsets as int: refuse patterns whose pool could
    // outgrow INT_MAX rather than silently truncating offsets (the caller
    // falls back to RCM).  The pool can double once under fill pressure.
    if (iwlen > (long)INT_MAX / 4) throw std::bad_alloc();
    iw.assign(iwlen, 0);
    pfree = 0;
    for (int j = 0; j < n; ++j) {
      pe[j] = (int)pfree;
      for (int p = Ap[j]; p < Ap[j + 1]; ++p)
        if (Ai[p] != j) iw[pfree++] = Ai[p];
      len[j] = (int)(pfree - pe[j]);
      degree[j] = len[j];
    }
    mindeg = 0;
    for (int i = 0; i < n; ++i) deg_insert(i);

    std::vector<int> Lp;
    Lp.reserve(n);
    int nel = 0;

    while (nel < n) {
      int p = -1;
      while (mindeg < n && (p = head[mindeg]) == -1) mindeg++;
      deg_remove(p);

      // ---- form element p: Lp and its iw list -------------------------
      Lp.clear();
      long stamp_lp = ++wflg;  // marks Lp membership in w[] for variables
      int q = pe[p];
      for (int k = 0; k < len[p]; ++k) {
        int e = iw[q + k];
        if (k < elen[p]) {
          if (pe[e] < 0) continue;  // absorbed element
          int qe = pe[e];
          for (int t = 0; t < len[e]; ++t) {
            int i = iw[qe + t];
            if (is_var(i) && w[i] != stamp_lp && i != p) {
              w[i] = stamp_lp;
              Lp.push_back(i);
            }
          }
          pe[e] = -1;  // e's variables now live in p
          degree[e] = 0;
        } else {
          int i = e;
          if (is_var(i) && w[i] != stamp_lp) {
            w[i] = stamp_lp;
            Lp.push_back(i);
          }
        }
      }
      ensure_space((long)Lp.size());
      pe[p] = (int)pfree;
      for (int i : Lp) iw[pfree++] = i;
      len[p] = (int)Lp.size();
      elen[p] = -1;  // eliminated: p is an element now
      degree[p] = (int)Lp.size();
      perm[nel++] = p;
      if (Lp.empty()) continue;

      // ---- stamped |Le \ Lp| counters ---------------------------------
      // w[e] = stamp_e + |Le \ Lp| as Lp members subtract themselves
      long stamp_e = ++wflg;
      for (int i : Lp) {
        int qi = pe[i];
        for (int k = 0; k < elen[i]; ++k) {
          int e = iw[qi + k];
          if (pe[e] < 0) continue;
          if (w[e] < stamp_e) w[e] = stamp_e + degree[e];
          w[e] -= 1;
        }
      }

      // ---- rebuild each i in Lp ---------------------------------------
      for (int i : Lp) {
        deg_remove(i);
        // reserve BEFORE capturing pe[i]: ensure_space may garbage-collect
        // and relocate i's current list
        ensure_space(1L + len[i]);
        int qi = pe[i];
        long d = (long)Lp.size() - 1;
        int keep_e = 0, keep_v = 0;
        // fresh list at pfree: [p, elements..., direct vars...]
        long np = pfree;
        iw[pfree++] = p;
        for (int k = 0; k < elen[i]; ++k) {
          int e = iw[qi + k];
          if (pe[e] < 0 || e == p) continue;
            long ext = (w[e] >= stamp_e) ? w[e] - stamp_e
                                       : (long)degree[e];
          if (ext == 0) {
            pe[e] = -1;  // Le subset of Lp: absorb into p
            degree[e] = 0;
            continue;
          }
          d += ext;
          iw[pfree++] = e;
          keep_e++;
        }
        for (int k = elen[i]; k < len[i]; ++k) {
          int j = iw[qi + k];
          if (!is_var(j)) continue;        // eliminated: covered via p
          if (w[j] == stamp_lp) continue;  // inside Lp: covered via p
          d += 1;
          iw[pfree++] = j;
          keep_v++;
        }
        long dmax = (long)(n - nel);
        long dtrack = (long)degree[i] + (long)Lp.size() - 1;
        d = std::min(d, std::min(dmax, dtrack));
        pe[i] = (int)np;
        elen[i] = keep_e + 1;
        len[i] = 1 + keep_e + keep_v;
        degree[i] = (int)std::max(0L, d);
        deg_insert(i);
      }

      // stamps must grow past any stored counter: a stale w[e] can be as
      // large as old_stamp + |Le| <= old_stamp + n
      wflg += (long)n + 2;
    }
  }
};

}  // namespace

extern "C" int amd_order(int n, const int *Ap, const int *Ai, int *perm) {
  if (n <= 0) return 0;
  try {
    AMD a;
    a.n = n;
    a.run(Ap, Ai, perm);
    return 0;
  } catch (...) {
    return -1;
  }
}

// exact LDL' fill (nonzeros of L below the diagonal) of the pattern AS
// GIVEN — the shared etree column-count pass alone, no factor allocation.
// Lets the Python wrapper compare candidate orderings cheaply.  Accepts
// full symmetric OR upper-triangular CSC (entries with row >= col are
// ignored by the count walk).
extern "C" long ldl_count_fill(int n, const int *Ap, const int *Ai) {
  try {
    std::vector<int> parent, lnz;
    etree_column_counts(n, Ap, Ai, parent, lnz);
    long total = 0;
    for (int k = 0; k < n; ++k) total += lnz[k];
    return total;
  } catch (...) {
    return -1;
  }
}
