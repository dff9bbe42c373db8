// Native host-side graph kernels for the optimization benchmarks.
//
// The TPU does the sampling/annealing; these cover the *host* hot loops that
// pure Python cannot handle at production scale (100k-node graphs —
// BASELINE config 5): greedy local-search MAX-CUT bounds (the honest
// comparison baseline, cf. reference tsu/benchmarks/optimization.py:289-334)
// and coloring-conflict counting. CSR graph representation; exported with C
// linkage for ctypes.
//
// Build: see build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <random>

extern "C" {

// Greedy local-search MAX-CUT. CSR graph: indptr (n+1), indices (nnz),
// weights (nnz), symmetric. Writes the best +-1 assignment into best_spins
// (n) and returns the best cut value over n_restarts.
double greedy_maxcut(
    const int64_t* indptr,
    const int32_t* indices,
    const double* weights,
    int64_t n,
    int32_t n_restarts,
    uint64_t seed,
    int8_t* best_spins) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> coin(0, 1);

  double best_cut = -1.0;
  int8_t* s = static_cast<int8_t*>(std::malloc(n));
  double* gain = static_cast<double*>(std::malloc(n * sizeof(double)));
  if (!s || !gain) {
    std::free(s);
    std::free(gain);
    return -1.0;
  }

  for (int32_t r = 0; r < n_restarts; ++r) {
    for (int64_t i = 0; i < n; ++i) s[i] = coin(rng) ? 1 : -1;

    // gain[i] = s_i * sum_j w_ij s_j : flip improves the cut iff gain > 0.
    for (int64_t i = 0; i < n; ++i) {
      double f = 0.0;
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
        f += weights[k] * s[indices[k]];
      gain[i] = s[i] * f;
    }

    bool improved = true;
    while (improved) {
      improved = false;
      for (int64_t i = 0; i < n; ++i) {
        if (gain[i] > 1e-12) {
          s[i] = -s[i];
          gain[i] = -gain[i];
          // Incremental neighbor-gain update: O(deg) per flip.
          for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            int64_t j = indices[k];
            gain[j] += 2.0 * weights[k] * s[i] * s[j];
          }
          improved = true;
        }
      }
    }

    double cut = 0.0;
    for (int64_t i = 0; i < n; ++i)
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
        int64_t j = indices[k];
        if (j > i) cut += weights[k] * (s[i] != s[j] ? 1.0 : 0.0);
      }
    if (cut > best_cut) {
      best_cut = cut;
      for (int64_t i = 0; i < n; ++i) best_spins[i] = s[i];
    }
  }

  std::free(s);
  std::free(gain);
  return best_cut;
}

// Cut value of a given +-1 assignment on a CSR graph (each undirected edge
// stored twice; counted once via j > i).
double cut_value(
    const int64_t* indptr,
    const int32_t* indices,
    const double* weights,
    int64_t n,
    const int8_t* spins) {
  double cut = 0.0;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int64_t j = indices[k];
      if (j > i) cut += weights[k] * (spins[i] != spins[j] ? 1.0 : 0.0);
    }
  return cut;
}

// Count same-color edges for a coloring assignment.
int64_t coloring_conflicts(
    const int64_t* indptr,
    const int32_t* indices,
    int64_t n,
    const int32_t* colors) {
  int64_t conflicts = 0;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int64_t j = indices[k];
      if (j > i && colors[i] == colors[j]) ++conflicts;
    }
  return conflicts;
}

}  // extern "C"
