// danbing-tk-tpu native host runtime (ctypes-loaded shared library).
//
// Provides the handful of host-side operations whose *exact* behavior is
// implementation-defined in the reference toolchain and therefore cannot be
// portably re-derived in Python/numpy:
//
//   dtk_sort_index_by_value : replicates getSortedIndex
//       (reference aQueryFasta_thread.cpp:247-255): std::iota over indices
//       then std::sort with comparator data[i]<data[j].  std::sort is
//       unstable; the tie order (introsort partition behavior) feeds the
//       early-stopped locus-voting scan, so bit-exact .kam/.tr.kmers output
//       requires the real libstdc++ algorithm.
//
// Everything else in the host engine is pure Python/numpy or JAX.
#include <algorithm>
#include <cstdint>
#include <numeric>

extern "C" {

void dtk_sort_index_by_value(const uint64_t* data, uint64_t n,
                             uint64_t* indices) {
    std::iota(indices, indices + n, 0);
    std::sort(indices, indices + n,
              [data](uint64_t i1, uint64_t i2) { return data[i1] < data[i2]; });
}

}  // extern "C"
