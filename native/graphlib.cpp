// Native host kernels for the facet-graph framework.
//
// Implements the two sequential preprocessing hot loops that cannot be
// vectorized on the host:
//   - match_one_level: one pass of Graclus greedy heavy-edge matching
//     (semantics of the reference lib/coarsening.py:135-192)
//   - grow_patch: masked BFS facet-graph patch growth
//     (semantics of the reference utils.py:1508-1696)
//
// Exposed with a C ABI and consumed via ctypes
// (facet_graph_convolution_tpu/graph/native.py).

#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

extern "C" {

// Greedy heavy-edge matching over a CSR-ish edge list sorted by row.
// rr/cc/vv: edge list (rr ascending), rid: visit order, inv_w: 1/degree
// (0 for isolated nodes). Writes cluster ids; returns total association.
double match_one_level(
    const int64_t* rr, const int64_t* cc, const double* vv, int64_t nnz,
    const int64_t* rid, const double* inv_w, int64_t n,
    int32_t* cluster_id) {
  std::vector<uint8_t> marked(n, 0);
  std::vector<int64_t> rowstart(n, 0), rowlength(n, 0);
  for (int64_t i = 0; i < nnz; ++i) rowlength[rr[i]]++;
  for (int64_t i = 1; i < n; ++i) rowstart[i] = rowstart[i - 1] + rowlength[i - 1];

  double total_assoc = 0.0;
  int32_t cluster_count = 0;
  for (int64_t ii = 0; ii < n; ++ii) {
    const int64_t tid = rid[ii];
    if (marked[tid]) continue;
    marked[tid] = 1;
    const int64_t rs = rowstart[tid];
    const int64_t len = rowlength[tid];
    int64_t best = -1;
    double wmax = 0.0;
    for (int64_t jj = 0; jj < len; ++jj) {
      const int64_t nid = cc[rs + jj];
      if (marked[nid]) continue;
      const double tval = vv[rs + jj] * (inv_w[tid] + inv_w[nid]);
      if (tval > wmax) {
        wmax = tval;
        best = nid;
      }
    }
    cluster_id[tid] = cluster_count;
    if (best > -1) {
      cluster_id[best] = cluster_count;
      marked[best] = 1;
    }
    total_assoc += wmax;
    cluster_count++;
  }
  return total_assoc;
}

// Masked BFS patch growth. adj0 is the zero-indexed K-list (-1 = pad).
// out_adj is (nodes_num + k) x k, pre-filled with -1; old_idx likewise;
// new_idx is an n-sized scratch pre-filled with -1. meta = [count, next_seed].
// Returns the patch node count.
int64_t grow_patch(
    const int64_t* adj0, int64_t n, int64_t k,
    int64_t seed, int64_t nodes_num,
    const int8_t* mask, int64_t min_size,
    int64_t* out_adj, int64_t* old_idx, int64_t* new_idx, int64_t* meta) {
  std::deque<int64_t> main_q, border_q;
  int64_t count = 0;

  auto add_node = [&](int64_t g) {
    new_idx[g] = count;
    old_idx[count] = g;
    count++;
  };

  add_node(seed);
  main_q.push_back(seed);

  auto expand = [&](std::deque<int64_t>& q, int64_t limit, bool respect_mask) {
    while (count < limit && !q.empty()) {
      const int64_t cur = q.front();
      q.pop_front();
      const int64_t local = new_idx[cur];
      out_adj[local * k + 0] = local;
      for (int64_t slot = 1; slot < k; ++slot) {
        const int64_t nbr = adj0[cur * k + slot];
        if (nbr == -1) break;
        if (new_idx[nbr] == -1) {
          add_node(nbr);
          if (respect_mask && mask[nbr] == 1) {
            border_q.push_back(nbr);
          } else {
            main_q.push_back(nbr);
          }
        }
        out_adj[local * k + slot] = new_idx[nbr];
      }
    }
  };

  expand(main_q, nodes_num, /*respect_mask=*/true);

  if (count < min_size) {
    expand(border_q, min_size, /*respect_mask=*/false);
    expand(main_q, min_size, /*respect_mask=*/false);
  }

  int64_t next_seed = -1;
  std::deque<int64_t>* queues[2] = {&main_q, &border_q};
  for (auto* q : queues) {
    while (!q->empty()) {
      const int64_t cur = q->front();
      q->pop_front();
      const int64_t local = new_idx[cur];
      out_adj[local * k + 0] = local;
      int64_t fill = 1;
      for (int64_t slot = 1; slot < k; ++slot) {
        const int64_t nbr = adj0[cur * k + slot];
        if (nbr == -1) break;
        if (new_idx[nbr] == -1) {
          if (mask[nbr] == 0) next_seed = nbr;
          continue;
        }
        out_adj[local * k + fill] = new_idx[nbr];
        fill++;
      }
    }
  }

  meta[0] = count;
  meta[1] = next_seed;
  return count;
}

}  // extern "C"
