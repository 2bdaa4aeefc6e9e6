// CPU HNSW baseline — the "usearch-CPU" anchor for benchmarks.
//
// The reference delegates CPU ANN to the usearch C++ library
// (reference: src/index/usearch.rs:89-99).  That library is not available
// in this environment, so benchmarks anchor against this clean-room
// implementation of the standard HNSW algorithm (Malkov & Yashunin 2016):
// multi-layer navigable small-world graph, greedy descent on upper
// layers, best-first beam search with candidate/result heaps on layer 0,
// neighbour-diversity pruning on insert.  Single-threaded (the build
// host exposes one core).
//
// Exposed as a C ABI for ctypes (see vector_store_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <unordered_set>
#include <vector>

namespace {

enum Metric { L2 = 0, COSINE = 1, DOT = 2 };

struct Hnsw {
  int dims;
  int M;               // degree on upper layers; layer0 uses 2M
  int ef_construction;
  Metric metric;
  std::mt19937_64 rng{0x5EED};

  std::vector<float> vectors;              // n * dims (normalised if cosine)
  std::vector<int> levels;                 // level of each node
  std::vector<std::vector<std::vector<int>>> links;  // node -> layer -> nbrs
  std::vector<uint8_t> dead;               // tombstones
  int entry = -1;
  int max_level = -1;
  size_t n = 0;
  size_t live = 0;

  float dist(const float* a, const float* b) const {
    float acc = 0.f;
    switch (metric) {
      case L2:
        for (int i = 0; i < dims; ++i) {
          float d = a[i] - b[i];
          acc += d * d;
        }
        return acc;
      case COSINE:
      case DOT:
        for (int i = 0; i < dims; ++i) acc += a[i] * b[i];
        return metric == COSINE ? 1.f - acc : -acc;
    }
    return acc;
  }

  const float* vec(int id) const { return vectors.data() + (size_t)id * dims; }

  int random_level() {
    // standard exponential level assignment, mult = 1/ln(M)
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng);
    return (int)(-std::log(r) / std::log((double)M));
  }

  // greedy single-entry descent used on layers > 0
  int greedy(const float* q, int start, int layer) const {
    int cur = start;
    float cur_d = dist(q, vec(cur));
    bool improved = true;
    while (improved) {
      improved = false;
      for (int nb : links[cur][layer]) {
        float d = dist(q, vec(nb));
        if (d < cur_d) {
          cur_d = d;
          cur = nb;
          improved = true;
        }
      }
    }
    return cur;
  }

  // best-first beam search on one layer; returns up to ef (dist, id) pairs
  std::vector<std::pair<float, int>> beam(const float* q, int start, int layer,
                                         int ef) const {
    using P = std::pair<float, int>;
    std::priority_queue<P, std::vector<P>, std::greater<P>> cand;  // min-heap
    std::priority_queue<P> result;                                 // max-heap
    std::unordered_set<int> visited;
    float d0 = dist(q, vec(start));
    cand.emplace(d0, start);
    result.emplace(d0, start);
    visited.insert(start);
    while (!cand.empty()) {
      auto [d, c] = cand.top();
      if (d > result.top().first && (int)result.size() >= ef) break;
      cand.pop();
      for (int nb : links[c][layer]) {
        if (!visited.insert(nb).second) continue;
        float dn = dist(q, vec(nb));
        if ((int)result.size() < ef || dn < result.top().first) {
          cand.emplace(dn, nb);
          result.emplace(dn, nb);
          if ((int)result.size() > ef) result.pop();
        }
      }
    }
    std::vector<P> out;
    out.reserve(result.size());
    while (!result.empty()) {
      out.push_back(result.top());
      result.pop();
    }
    std::reverse(out.begin(), out.end());  // ascending distance
    return out;
  }

  // neighbour-diversity selection (the HNSW heuristic)
  std::vector<int> select(const float* q,
                          std::vector<std::pair<float, int>>& cands,
                          int max_m) const {
    std::sort(cands.begin(), cands.end());
    std::vector<int> chosen;
    for (auto& [d, c] : cands) {
      if ((int)chosen.size() >= max_m) break;
      bool ok = true;
      for (int s : chosen) {
        if (dist(vec(c), vec(s)) < d) {
          ok = false;
          break;
        }
      }
      if (ok) chosen.push_back(c);
    }
    return chosen;
  }

  void add(const float* v) {
    int id = (int)n++;
    vectors.insert(vectors.end(), v, v + dims);
    if (metric == COSINE) {
      float* p = vectors.data() + (size_t)id * dims;
      float norm = 0.f;
      for (int i = 0; i < dims; ++i) norm += p[i] * p[i];
      norm = std::sqrt(std::max(norm, 1e-12f));
      for (int i = 0; i < dims; ++i) p[i] /= norm;
    }
    int level = random_level();
    levels.push_back(level);
    dead.push_back(0);
    links.emplace_back(level + 1);
    live++;

    if (entry < 0) {
      entry = id;
      max_level = level;
      return;
    }
    const float* q = vec(id);
    int cur = entry;
    for (int l = max_level; l > level; --l) cur = greedy(q, cur, l);
    for (int l = std::min(level, max_level); l >= 0; --l) {
      auto cands = beam(q, cur, l, ef_construction);
      int max_m = l == 0 ? 2 * M : M;
      auto nbrs = select(q, cands, max_m);
      links[id][l] = nbrs;
      for (int nb : nbrs) {
        auto& lst = links[nb][l];
        lst.push_back(id);
        if ((int)lst.size() > max_m) {
          // re-prune the overflowing neighbour list
          std::vector<std::pair<float, int>> nc;
          nc.reserve(lst.size());
          for (int x : lst) nc.emplace_back(dist(vec(nb), vec(x)), x);
          lst = select(vec(nb), nc, max_m);
        }
      }
      cur = cands.empty() ? cur : cands.front().second;
    }
    if (level > max_level) {
      max_level = level;
      entry = id;
    }
  }

  int search(const float* qraw, int k, int ef, int* out_ids,
             float* out_dists) const {
    if (entry < 0) return 0;
    std::vector<float> qn;
    const float* q = qraw;
    if (metric == COSINE) {
      qn.assign(qraw, qraw + dims);
      float norm = 0.f;
      for (int i = 0; i < dims; ++i) norm += qn[i] * qn[i];
      norm = std::sqrt(std::max(norm, 1e-12f));
      for (int i = 0; i < dims; ++i) qn[i] /= norm;
      q = qn.data();
    }
    int cur = entry;
    for (int l = max_level; l > 0; --l) cur = greedy(q, cur, l);
    auto res = beam(q, cur, 0, std::max(ef, k));
    int written = 0;
    for (auto& [d, id] : res) {
      if (written >= k) break;
      if (dead[id]) continue;
      out_ids[written] = id;
      out_dists[written] = d;
      ++written;
    }
    return written;
  }

  void remove(int id) {
    if (id >= 0 && (size_t)id < n && !dead[id]) {
      dead[id] = 1;
      live--;
    }
  }
};

}  // namespace

extern "C" {

void* hnsw_create(int dims, int M, int ef_construction, int metric) {
  auto* h = new Hnsw();
  h->dims = dims;
  h->M = M;
  h->ef_construction = ef_construction;
  h->metric = (Metric)metric;
  return h;
}

void hnsw_free(void* p) { delete (Hnsw*)p; }

void hnsw_add(void* p, const float* vecs, int count) {
  auto* h = (Hnsw*)p;
  for (int i = 0; i < count; ++i) h->add(vecs + (size_t)i * h->dims);
}

// returns number of results written for each query (dense k per query)
void hnsw_search(void* p, const float* queries, int nq, int k, int ef,
                 int* out_ids, float* out_dists, int* out_counts) {
  auto* h = (Hnsw*)p;
  for (int i = 0; i < nq; ++i) {
    out_counts[i] = h->search(queries + (size_t)i * h->dims, k, ef,
                              out_ids + (size_t)i * k,
                              out_dists + (size_t)i * k);
  }
}

void hnsw_remove(void* p, int id) { ((Hnsw*)p)->remove(id); }

long hnsw_size(void* p) { return (long)((Hnsw*)p)->live; }

}  // extern "C"
