// gs_native: native host-side graph engine for graphsage_tpu.
//
// The reference does all graph work in Python sets on the hot path
// (reference src/models.py:277-289 sampling, :305-308 mask building,
// :153-162 BFS negatives).  The JAX framework moves the *device* math into
// XLA, but the per-batch host work — fanout sampling, union/dedup, frontier
// index-table construction, BFS closures — remains host-bound.  This
// library implements those in C++ over CSR arrays, called from Python via
// ctypes (zero-copy on numpy buffers), with graceful fallback to the numpy
// implementation when the shared object is absent.
//
// Semantics mirror graphsage_tpu.sampler.compact exactly:
//  - uniform fanout sampling WITHOUT replacement, take-all below fanout
//    (reference src/models.py:280-284), self node unioned in (:285),
//  - aggregation set = sample ∪ {self} minus self unless gcn (:297-298),
//  - per-layer unions in first-seen order, padded to caller-given caps.
//
// Build:  python -m graphsage_tpu.native.build
// ABI:    plain C, int32 indices throughout (graphs < 2^31 nodes/edges).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// SplitMix64 — tiny, fast, seedable; good enough for sampling decisions.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  inline uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // unbiased bounded draw (Lemire)
  inline uint32_t bounded(uint32_t n) {
    uint64_t m = (uint64_t)(uint32_t)next() * n;
    uint32_t lo = (uint32_t)m;
    if (lo < n) {
      uint32_t t = (uint32_t)(-(int32_t)n) % n;
      while (lo < t) {
        m = (uint64_t)(uint32_t)next() * n;
        lo = (uint32_t)m;
      }
    }
    return (uint32_t)(m >> 32);
  }
};

// open-addressing int32->int32 map sized for the batch (node -> position)
struct PosMap {
  std::vector<int64_t> slots;  // packed (key<<32)|value, -1 = empty
  uint32_t mask;
  explicit PosMap(size_t expect) {
    size_t cap = 16;
    while (cap < expect * 2) cap <<= 1;
    slots.assign(cap, -1);
    mask = (uint32_t)(cap - 1);
  }
  inline uint32_t hash(int32_t k) const {
    uint32_t x = (uint32_t)k;
    x ^= x >> 16; x *= 0x7feb352dU; x ^= x >> 15; x *= 0x846ca68bU;
    x ^= x >> 16;
    return x & mask;
  }
  // insert if absent; returns position value stored for key
  inline int32_t get_or_insert(int32_t key, int32_t next_value,
                               bool* inserted) {
    uint32_t h = hash(key);
    while (true) {
      int64_t s = slots[h];
      if (s < 0) {
        slots[h] = ((int64_t)(uint32_t)key << 32) | (uint32_t)next_value;
        *inserted = true;
        return next_value;
      }
      if ((int32_t)(s >> 32) == key) {
        *inserted = false;
        return (int32_t)(s & 0xffffffff);
      }
      h = (h + 1) & mask;
    }
  }
  inline int32_t find(int32_t key) const {
    uint32_t h = hash(key);
    while (true) {
      int64_t s = slots[h];
      if (s < 0) return -1;
      if ((int32_t)(s >> 32) == key) return (int32_t)(s & 0xffffffff);
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Build a full compact batch: per-layer padded frontier tables.
//
// Inputs:
//   indptr [num_nodes+1], indices [E]: CSR adjacency
//   batch [batch_len]: target node ids (may include padding repeats)
//   num_layers, fanout, gcn, seed
//   u_caps [num_layers+1]: caller-chosen padded row counts per level,
//     u_caps[0] = batch level cap ... u_caps[num_layers] = deepest cap.
//     Must be >= the true union sizes (worst case B*(fanout+1)^depth,
//     clipped to num_nodes + batch padding repeats).
// Outputs (caller-allocated, zero-filled by callee):
//   union_sizes [num_layers+1]: actual union sizes per level
//   x0_ids [u_caps[num_layers]]: deepest union node ids (padded 0)
//   For bottom-up layer j in [0, num_layers):  (level = num_layers-1-j)
//     idx_out[j]  -> int32 [u_caps[level], fanout+1]
//     mask_out[j] -> float  [u_caps[level], fanout+1]
//     self_out[j] -> int32 [u_caps[level]]
//   passed as flat concatenated buffers idx_buf/mask_buf/self_buf with
//   per-layer offsets computed from u_caps by the caller’s layout:
//   layers are stored bottom-up consecutively.
//
// Returns 0 on success, <0 on cap overflow.
int gs_build_compact_batch(
    const int32_t* indptr, const int32_t* indices, int32_t num_nodes,
    const int32_t* batch, int32_t batch_len, int32_t num_layers,
    int32_t fanout, int32_t gcn, uint64_t seed, const int32_t* u_caps,
    int32_t* union_sizes, int32_t* x0_ids, int32_t* idx_buf,
    float* mask_buf, int32_t* self_buf) {
  Rng rng(seed);
  const int32_t slots = fanout + 1;

  // levels[0] = batch ... levels[num_layers] = deepest union
  std::vector<std::vector<int32_t>> level_nodes(num_layers + 1);
  // samples[d][i] = sampled neighbor list (w/o self) for node i of level d
  std::vector<std::vector<int32_t>> samples(num_layers);
  std::vector<std::vector<int32_t>> sample_offsets(num_layers);

  level_nodes[0].assign(batch, batch + batch_len);

  std::vector<int32_t> tmp;
  for (int d = 0; d < num_layers; ++d) {
    const auto& cur = level_nodes[d];
    auto& samp = samples[d];
    auto& offs = sample_offsets[d];
    offs.reserve(cur.size() + 1);
    offs.push_back(0);
    samp.reserve(cur.size() * fanout);

    PosMap seen(cur.size() * (fanout + 1) * 2 + 16);
    auto& nxt = level_nodes[d + 1];
    nxt.reserve(cur.size() * (fanout + 1));
    int32_t next_pos = 0;

    for (size_t i = 0; i < cur.size(); ++i) {
      int32_t v = cur[i];
      int32_t lo = indptr[v], hi = indptr[v + 1];
      int32_t deg = hi - lo;
      if (deg <= fanout) {
        for (int32_t e = lo; e < hi; ++e) samp.push_back(indices[e]);
      } else {
        // partial Fisher-Yates over a copy of the neighbor list
        tmp.assign(indices + lo, indices + hi);
        for (int32_t k = 0; k < fanout; ++k) {
          int32_t j = k + (int32_t)rng.bounded((uint32_t)(deg - k));
          std::swap(tmp[k], tmp[j]);
          samp.push_back(tmp[k]);
        }
      }
      offs.push_back((int32_t)samp.size());
      // union: self ∪ samples, first-seen order
      bool ins;
      int32_t p = seen.get_or_insert(v, next_pos, &ins);
      if (ins) { nxt.push_back(v); next_pos++; }
      (void)p;
      for (int32_t e = offs[i]; e < offs[i + 1]; ++e) {
        p = seen.get_or_insert(samp[e], next_pos, &ins);
        if (ins) { nxt.push_back(samp[e]); next_pos++; }
      }
    }
  }

  for (int d = 0; d <= num_layers; ++d) {
    union_sizes[d] = (int32_t)level_nodes[d].size();
    if (union_sizes[d] > u_caps[d]) return -(d + 1);  // cap overflow
  }

  // deepest union → x0_ids
  {
    const auto& deepest = level_nodes[num_layers];
    std::memcpy(x0_ids, deepest.data(), deepest.size() * sizeof(int32_t));
  }

  // bottom-up frontier tables
  int64_t idx_off = 0, self_off = 0;
  for (int j = 0; j < num_layers; ++j) {
    int level = num_layers - 1 - j;          // rows = level_nodes[level]
    const auto& cur = level_nodes[level];
    const auto& prev = level_nodes[level + 1];
    const auto& samp = samples[level];
    const auto& offs = sample_offsets[level];
    int32_t cap = u_caps[level];

    PosMap prev_pos((size_t)prev.size() * 2 + 16);
    for (size_t i = 0; i < prev.size(); ++i) {
      bool ins;
      prev_pos.get_or_insert(prev[i], (int32_t)i, &ins);
    }

    int32_t* idx = idx_buf + idx_off;
    float* msk = mask_buf + idx_off;
    int32_t* slf = self_buf + self_off;
    for (size_t r = 0; r < cur.size(); ++r) {
      int32_t v = cur[r];
      slf[r] = prev_pos.find(v);
      int32_t c = 0;
      if (gcn) {  // aggregation set includes self exactly once
        idx[r * slots + c] = slf[r];
        msk[r * slots + c] = 1.0f;
        ++c;
      }
      for (int32_t e = offs[r]; e < offs[r + 1]; ++e) {
        int32_t n = samp[e];
        if (n == v) continue;  // self removed (or already added for gcn)
        idx[r * slots + c] = prev_pos.find(n);
        msk[r * slots + c] = 1.0f;
        ++c;
      }
    }
    idx_off += (int64_t)cap * slots;
    self_off += cap;
  }
  return 0;
}

// ≤max_hops BFS closure from `root`, written as a bitmask over nodes
// (byte-per-bit packing compatible with numpy packbits big-endian order).
// visited_bytes must hold (num_nodes+7)/8 bytes, zero-filled by caller.
// work must hold num_nodes int32 (scratch).  Returns closure size.
int gs_bfs_closure(const int32_t* indptr, const int32_t* indices,
                   int32_t num_nodes, int32_t root, int32_t max_hops,
                   uint8_t* visited_bytes, int32_t* work) {
  auto test = [&](int32_t v) {
    return (visited_bytes[v >> 3] >> (7 - (v & 7))) & 1;
  };
  auto set = [&](int32_t v) {
    visited_bytes[v >> 3] |= (uint8_t)(1u << (7 - (v & 7)));
  };
  set(root);
  int32_t count = 1;
  int32_t* frontier = work;
  int32_t f_len = 1;
  frontier[0] = root;
  std::vector<int32_t> next;
  for (int h = 0; h < max_hops && f_len > 0; ++h) {
    next.clear();
    for (int32_t i = 0; i < f_len; ++i) {
      int32_t v = frontier[i];
      for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
        int32_t u = indices[e];
        if (!test(u)) {
          set(u);
          next.push_back(u);
          ++count;
        }
      }
    }
    f_len = (int32_t)next.size();
    std::memcpy(frontier, next.data(), f_len * sizeof(int32_t));
  }
  return count;
}

// Batched ≤max_hops far-list builder (the exact-negative closure of
// reference src/models.py:153-167 at scale): for each root, BFS over the
// CSR graph with byte-flag visited marks, then emit the train nodes
// OUTSIDE the closure into out_far[r * n_train ..] (count in
// out_counts[r]).  Roots are distributed over n_threads workers via an
// atomic counter; the graph and train list are shared read-only, each
// worker owns its visited/frontier scratch, and output rows are disjoint.
// The caller bounds out_far memory by chunking roots (stride = n_train).
int gs_far_lists(const int32_t* indptr, const int32_t* indices,
                 int32_t num_nodes, const int32_t* roots, int32_t n_roots,
                 int32_t max_hops, const int32_t* train, int32_t n_train,
                 int32_t n_threads, int32_t* out_far, int32_t* out_counts) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int32_t> next_root(0);

  auto worker = [&]() {
    std::vector<uint8_t> visited((size_t)num_nodes);
    std::vector<int32_t> frontier, next;
    frontier.reserve(1024);
    next.reserve(4096);
    while (true) {
      int32_t r = next_root.fetch_add(1, std::memory_order_relaxed);
      if (r >= n_roots) break;
      int32_t root = roots[r];
      std::memset(visited.data(), 0, (size_t)num_nodes);
      visited[root] = 1;
      frontier.clear();
      frontier.push_back(root);
      for (int h = 0; h < max_hops && !frontier.empty(); ++h) {
        next.clear();
        for (int32_t v : frontier) {
          for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
            int32_t u = indices[e];
            if (!visited[u]) {
              visited[u] = 1;
              next.push_back(u);
            }
          }
        }
        frontier.swap(next);
      }
      int32_t* out = out_far + (int64_t)r * n_train;
      int32_t c = 0;
      for (int32_t i = 0; i < n_train; ++i) {
        int32_t t = train[i];
        if (!visited[t]) out[c++] = t;
      }
      out_counts[r] = c;
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return 0;
}

// Batched uniform negative sampling (the large-graph approximation mode of
// sampler/pairs.py): for each node, num_neg train nodes drawn uniformly
// WITHOUT replacement excluding the node and its 1-hop neighborhood.
// out [n * num_neg] (int32, row-major), valid [n * num_neg] (0/1).
// Rejection sampling against a byte-mark scratch (O(deg + num_neg)
// expected per node); falls back to a full scan + partial Fisher-Yates
// when the valid pool is small relative to the ask (guaranteed exact
// uniform-without-replacement either way).
int gs_uniform_negatives(const int32_t* indptr, const int32_t* indices,
                         int32_t num_nodes, const int32_t* train,
                         int32_t n_train, const int32_t* nodes, int32_t n,
                         int32_t num_neg, uint64_t seed, int32_t* out,
                         uint8_t* valid) {
  Rng rng(seed);
  std::vector<uint8_t> is_train((size_t)num_nodes, 0);
  for (int32_t i = 0; i < n_train; ++i) is_train[train[i]] = 1;
  std::vector<uint8_t> mark((size_t)num_nodes, 0);
  std::vector<int32_t> picked;
  std::vector<int32_t> pool;
  picked.reserve(num_neg);

  for (int32_t i = 0; i < n; ++i) {
    int32_t v = nodes[i];
    int64_t bad_in_train = 0;
    if (!mark[v]) {
      mark[v] = 1;
      if (is_train[v]) ++bad_in_train;
    }
    for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
      int32_t u = indices[e];
      if (!mark[u]) {
        mark[u] = 1;
        if (is_train[u]) ++bad_in_train;
      }
    }
    int64_t avail = (int64_t)n_train - bad_in_train;
    int32_t want = (int32_t)(avail < num_neg ? (avail < 0 ? 0 : avail)
                                             : num_neg);
    picked.clear();
    if ((int64_t)want * 4 >= avail) {
      // dense ask: collect the valid pool and partial-Fisher-Yates it
      pool.clear();
      for (int32_t t = 0; t < n_train; ++t)
        if (!mark[train[t]]) pool.push_back(train[t]);
      for (int32_t k = 0; k < want; ++k) {
        int32_t j = k + (int32_t)rng.bounded((uint32_t)(pool.size() - k));
        std::swap(pool[k], pool[j]);
        picked.push_back(pool[k]);
      }
    } else {
      while ((int32_t)picked.size() < want) {
        int32_t u = train[rng.bounded((uint32_t)n_train)];
        if (mark[u]) continue;
        mark[u] = 1;
        picked.push_back(u);
      }
    }
    int32_t* row = out + (int64_t)i * num_neg;
    uint8_t* vrow = valid + (int64_t)i * num_neg;
    for (int32_t k = 0; k < num_neg; ++k) {
      row[k] = k < want ? picked[k] : 0;
      vrow[k] = k < want;
    }
    // unmark scratch for the next node
    mark[v] = 0;
    for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e)
      mark[indices[e]] = 0;
    for (int32_t p : picked) mark[p] = 0;
  }
  return 0;
}

// Uniform fanout-sampling of presampled index tables for the dense path:
// for each of `n` nodes, sample min(deg, fanout) distinct neighbors into
// out [n, fanout] (pad 0) and valid counts into counts [n].
int gs_sample_fanout(const int32_t* indptr, const int32_t* indices,
                     int32_t num_nodes, const int32_t* nodes, int32_t n,
                     int32_t fanout, uint64_t seed, int32_t* out,
                     int32_t* counts) {
  Rng rng(seed);
  std::vector<int32_t> tmp;
  for (int32_t i = 0; i < n; ++i) {
    int32_t v = nodes[i];
    int32_t lo = indptr[v], hi = indptr[v + 1];
    int32_t deg = hi - lo;
    int32_t k = deg < fanout ? deg : fanout;
    counts[i] = k;
    if (deg <= fanout) {
      for (int32_t e = 0; e < k; ++e) out[(int64_t)i * fanout + e] =
          indices[lo + e];
    } else {
      tmp.assign(indices + lo, indices + hi);
      for (int32_t e = 0; e < k; ++e) {
        int32_t j = e + (int32_t)rng.bounded((uint32_t)(deg - e));
        std::swap(tmp[e], tmp[j]);
        out[(int64_t)i * fanout + e] = tmp[e];
      }
    }
  }
  return 0;
}

}  // extern "C"
