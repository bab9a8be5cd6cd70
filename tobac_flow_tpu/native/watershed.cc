// Flow-aware priority-flood watershed — native host kernel.
//
// Serial min-heap flood with per-pixel flow-displaced temporal neighbours,
// written from scratch as (a) the exact-semantics oracle for the TPU
// iterative watershed (push-along-source-flow, label-at-push, (value, age)
// heap ordering — the algorithm family of skimage's watershed and the
// reference's Cython kernel tobac_flow/_watershed.pyx), and (b) a fast host
// fallback for small jobs.
//
// Build: g++ -O3 -shared -fPIC watershed.cc -o libtfwatershed.so

#include <cstdint>
#include <limits>
#include <queue>
#include <vector>

namespace {

struct Item {
  float value;
  int64_t age;
  int64_t index;
};

struct Greater {
  bool operator()(const Item& a, const Item& b) const {
    if (a.value != b.value) return a.value > b.value;
    return a.age > b.age;
  }
};

}  // namespace

extern "C" {

// All arrays are raveled over the padded (T, H, W) volume.
//   image:           flood topography (float32)
//   mask:            1 = floodable, 0 = excluded (border padding must be 0)
//   output:          in: markers (nonzero = seed); out: labels
//   structure:       n_struct raveled neighbour offsets
//   fwd_flag/bwd_flag: per-offset flags marking t+1 / t-1 neighbours
//   fwd_off/bwd_off: per-pixel raveled offsets from the rounded flow
void flow_watershed(const float* image,
                    const int8_t* mask,
                    int32_t* output,
                    const int64_t* structure,
                    const uint8_t* fwd_flag,
                    const uint8_t* bwd_flag,
                    const int64_t* fwd_off,
                    const int64_t* bwd_off,
                    int64_t n_struct,
                    const int64_t* marker_locations,
                    int64_t n_markers,
                    int64_t n_pixels) {
  std::priority_queue<Item, std::vector<Item>, Greater> heap;
  // seeds carry strictly increasing ages in marker_locations order — the
  // reference Cython kernel's age-ordered pushes (_watershed.pyx:308-337);
  // permuting marker_locations therefore permutes the heap's tie-breaking,
  // which is how the tie-class sensitivity study perturbs the oracle.
  for (int64_t i = 0; i < n_markers; ++i) {
    int64_t idx = marker_locations[i];
    heap.push(Item{image[idx], i, idx});
  }
  int64_t age = n_markers;
  while (!heap.empty()) {
    Item elem = heap.top();
    heap.pop();
    for (int64_t i = 0; i < n_struct; ++i) {
      int64_t nb = structure[i] + elem.index;
      if (fwd_flag[i]) nb += fwd_off[elem.index];
      if (bwd_flag[i]) nb += bwd_off[elem.index];
      if (nb < 0 || nb >= n_pixels) continue;
      if (!mask[nb]) continue;
      if (output[nb]) continue;
      // label at push: cannot be reached more cheaply later
      output[nb] = output[elem.index];
      heap.push(Item{image[nb], age++, nb});
    }
  }
}

// Exact minimax path costs from a seed set — the well-defined part of the
// watershed solution (diagnostic: separates genuine cost ties, where only
// the heap's age clock arbitrates, from cost errors).  Same directed graph
// as flow_watershed (temporal neighbours along the SOURCE pixel's flow).
// cost[p] = min over paths (seed .. q -> p) of max(image over seed..q),
// i.e. the arrival bottleneck EXCLUDING image[p] — the quantity the
// data-parallel flood stores as "claim".
void flow_watershed_costs(const float* image,
                          const int8_t* mask,
                          const int8_t* seeds,
                          float* cost,
                          const int64_t* structure,
                          const uint8_t* fwd_flag,
                          const uint8_t* bwd_flag,
                          const int64_t* fwd_off,
                          const int64_t* bwd_off,
                          int64_t n_struct,
                          int64_t n_pixels) {
  const float inf = std::numeric_limits<float>::infinity();
  for (int64_t i = 0; i < n_pixels; ++i) cost[i] = inf;
  std::priority_queue<Item, std::vector<Item>, Greater> heap;
  for (int64_t i = 0; i < n_pixels; ++i) {
    if (seeds[i]) {
      cost[i] = image[i];
      heap.push(Item{image[i], 0, i});
    }
  }
  while (!heap.empty()) {
    Item elem = heap.top();
    heap.pop();
    // stale check: the live entry's push value is max(arrival, own image)
    float live = cost[elem.index] > image[elem.index] ? cost[elem.index]
                                                      : image[elem.index];
    if (elem.value > live) continue;
    for (int64_t i = 0; i < n_struct; ++i) {
      int64_t nb = structure[i] + elem.index;
      if (fwd_flag[i]) nb += fwd_off[elem.index];
      if (bwd_flag[i]) nb += bwd_off[elem.index];
      if (nb < 0 || nb >= n_pixels) continue;
      if (!mask[nb]) continue;
      // arrival bottleneck at nb via elem: the path max through elem,
      // which includes image[elem] (elem.value is already that max for
      // non-seeds; for seeds it is the seed's own value)
      float nc = elem.value;
      if (nc < cost[nb]) {
        cost[nb] = nc;
        float push = image[nb] > nc ? image[nb] : nc;
        heap.push(Item{push, 0, nb});
      }
    }
  }
}

}  // extern "C"
