// Contraction-path planner for the K-dim tensor network.
//
// The reference delegates path planning to the pure-Python opt_einsum
// (reference reduce_Ks.py:264-265); planning happens at trace time, once per
// program structure, but for deep plate trees with many factors the Python
// search dominates trace time.  This native planner does an exact
// bitmask-DP search over contraction trees (3^n subset-partition
// enumeration) for n <= PATHOPT_MAX_OPTIMAL factors and falls back to a
// greedy cheapest-pair search above that.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).
//
// Cost model: sum over contraction steps of the product of the sizes of all
// dims participating in the step (matching opt_einsum's flop heuristic).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

using U64 = unsigned long long;

struct Planner {
  int n;                                  // number of factors
  int n_dims;                             // number of distinct dims
  std::vector<U64> factor_mask;           // per factor: bitmask of dims
  std::vector<double> dim_size;           // per dim id
  U64 out_mask;                           // dims that must survive
  // per-subset memo: best cost and the partition that achieves it
  std::unordered_map<U64, double> best_cost;
  std::unordered_map<U64, U64> best_split;  // left part of the partition
  std::unordered_map<U64, U64> subset_dims; // union of factor dims in subset
  std::unordered_map<U64, U64> other_dims;  // union of dims outside subset

  U64 dims_of_subset(U64 s) {
    auto it = subset_dims.find(s);
    if (it != subset_dims.end()) return it->second;
    U64 m = 0;
    for (int i = 0; i < n; ++i)
      if (s >> i & 1) m |= factor_mask[i];
    subset_dims[s] = m;
    return m;
  }

  // dims of the tensor produced by contracting subset s fully:
  // dims in s that also appear outside s or in the output.
  U64 result_dims(U64 s) {
    U64 full = ((U64)1 << n) - 1;
    U64 outside = dims_of_subset(full & ~s);
    return dims_of_subset(s) & (outside | out_mask);
  }

  double prod_size(U64 dims) {
    double p = 1.0;
    for (int d = 0; d < n_dims; ++d)
      if (dims >> d & 1) p *= dim_size[d];
    return p;
  }

  double solve(U64 s) {
    if (__builtin_popcountll(s) <= 1) return 0.0;
    auto it = best_cost.find(s);
    if (it != best_cost.end()) return it->second;

    double best = std::numeric_limits<double>::infinity();
    U64 best_a = 0;
    // enumerate proper sub-subsets; canonical: a contains lowest set bit
    U64 low = s & (~s + 1);
    U64 rest = s & ~low;
    for (U64 a = rest; ; a = (a - 1) & rest) {
      U64 left = a | low;
      if (left != s) {
        U64 right = s & ~left;
        double c = solve(left) + solve(right);
        if (c < best) {
          // step cost: product of sizes of all dims touched in this step
          U64 touched = result_dims(left) | result_dims(right);
          c += prod_size(touched);
          if (c < best) { best = c; best_a = left; }
        }
      }
      if (a == 0) break;
    }
    best_cost[s] = best;
    best_split[s] = best_a;
    return best;
  }

  // flatten the contraction tree into an opt_einsum-style linear path:
  // each entry is a pair of positions into the current factor list; after a
  // step both positions are removed and the result appended at the end.
  void linearize(std::vector<std::pair<int,int>>* path) {
    // current list holds subset-masks of original factors
    std::vector<U64> cur;
    for (int i = 0; i < n; ++i) cur.push_back((U64)1 << i);

    // post-order walk over the tree
    std::vector<U64> stack{((U64)1 << n) - 1};
    std::vector<U64> order;
    while (!stack.empty()) {
      U64 s = stack.back(); stack.pop_back();
      if (__builtin_popcountll(s) <= 1) continue;
      order.push_back(s);
      U64 left = best_split[s];
      stack.push_back(left);
      stack.push_back(s & ~left);
    }
    std::reverse(order.begin(), order.end());

    for (U64 s : order) {
      U64 left = best_split[s];
      U64 right = s & ~left;
      int li = -1, ri = -1;
      for (int i = 0; i < (int)cur.size(); ++i) {
        if (cur[i] == left) li = i;
        else if (cur[i] == right) ri = i;
      }
      int a = std::min(li, ri), b = std::max(li, ri);
      path->push_back({a, b});
      // remove b then a, append merged
      cur.erase(cur.begin() + b);
      cur.erase(cur.begin() + a);
      cur.push_back(s);
    }
  }
};

void greedy_path(int n, std::vector<U64> masks, const std::vector<double>& size,
                 int n_dims, U64 out_mask,
                 std::vector<std::pair<int,int>>* path) {
  auto prod = [&](U64 dims) {
    double p = 1.0;
    for (int d = 0; d < n_dims; ++d)
      if (dims >> d & 1) p *= size[d];
    return p;
  };
  std::vector<U64> cur = masks;
  while (cur.size() > 1) {
    double best = std::numeric_limits<double>::infinity();
    int bi = 0, bj = 1;
    // union of all other factors (for deciding which dims survive)
    for (size_t i = 0; i < cur.size(); ++i) {
      for (size_t j = i + 1; j < cur.size(); ++j) {
        U64 others = out_mask;
        for (size_t k = 0; k < cur.size(); ++k)
          if (k != i && k != j) others |= cur[k];
        U64 touched = cur[i] | cur[j];
        U64 result = touched & others;
        double c = prod(touched) + prod(result);
        if (c < best) { best = c; bi = (int)i; bj = (int)j; }
      }
    }
    U64 others = out_mask;
    for (size_t k = 0; k < cur.size(); ++k)
      if ((int)k != bi && (int)k != bj) others |= cur[k];
    U64 merged = (cur[bi] | cur[bj]) & others;
    path->push_back({bi, bj});
    cur.erase(cur.begin() + bj);
    cur.erase(cur.begin() + bi);
    cur.push_back(merged);
  }
}

}  // namespace

extern "C" {

// Returns the number of path entries written (2 ints per entry: pair of
// positions in the shrinking factor list), or -1 on error.
//
//   n_factors         number of input factors
//   factor_offsets    n_factors+1 offsets into factor_dims
//   factor_dims       concatenated dim ids per factor
//   n_dims            number of distinct dim ids (< 64)
//   dim_sizes         size per dim id
//   out_dims/n_out    dim ids that survive the full contraction
//   max_optimal       use exact DP for n_factors <= max_optimal
//   path_out          caller-allocated, 2*(n_factors-1) ints
int alan_plan_path(int n_factors, const int* factor_offsets,
                   const int* factor_dims, int n_dims,
                   const double* dim_sizes, const int* out_dims, int n_out,
                   int max_optimal, int* path_out) {
  if (n_factors <= 0 || n_dims >= 64 || n_factors >= 64) return -1;
  if (n_factors == 1) { path_out[0] = 0; path_out[1] = -1; return 1; }

  std::vector<U64> masks(n_factors, 0);
  for (int i = 0; i < n_factors; ++i)
    for (int j = factor_offsets[i]; j < factor_offsets[i + 1]; ++j)
      masks[i] |= (U64)1 << factor_dims[j];
  U64 out_mask = 0;
  for (int i = 0; i < n_out; ++i) out_mask |= (U64)1 << out_dims[i];
  std::vector<double> sizes(dim_sizes, dim_sizes + n_dims);

  std::vector<std::pair<int,int>> path;
  if (n_factors <= max_optimal) {
    Planner p;
    p.n = n_factors;
    p.n_dims = n_dims;
    p.factor_mask = masks;
    p.dim_size = sizes;
    p.out_mask = out_mask;
    p.solve(((U64)1 << n_factors) - 1);
    p.linearize(&path);
  } else {
    greedy_path(n_factors, masks, sizes, n_dims, out_mask, &path);
  }

  for (size_t i = 0; i < path.size(); ++i) {
    path_out[2 * i] = path[i].first;
    path_out[2 * i + 1] = path[i].second;
  }
  return (int)path.size();
}

}  // extern "C"
