// Native prefilter hot loop: k-mer hashing + LIS chaining + top-k admission.
//
// C-ABI engine behind sift4g_tpu/prefilter/search.py (ctypes).  Semantics
// mirror the reference's threadSearchDatabase
// (reference sift4g/src/database_search.cpp:185-253) and are kept
// bit-compatible with the NumPy fallback in search.py:
//   * 5-bit rolling k-mer packing (hash.cpp:21-44), adjacent-duplicate
//     skip only (quirk Q5, database_search.cpp:212-214);
//   * CSR inverted index over query k-mers is built in Python
//     (prefilter/kmer.py) and passed in as flat arrays;
//   * per (db seq, query): score = LIS(hit positions) / float(db_len)
//     in float32 (database_search.cpp:228-229);
//   * admission with a monotone floor (quirk Q3), end-of-chunk sort by
//     (score desc, db index asc) + truncate (the deterministic refinement
//     of the reference's unstable sort, quirk Q4) and floor carry-over
//     across chunks (database_search.cpp:151-153).
//
// Threading splits each chunk into contiguous sequence ranges like the
// reference's pthread-pool fan-out (database_search.cpp:101-123); each
// thread admits into local lists against a chunk-start floor snapshot, and
// the merge + truncate at chunk end makes the result independent of the
// thread count (argument in prefilter/search.py docstring).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Candidate {
  float score;
  int64_t id;
};

inline bool cand_less(const Candidate& a, const Candidate& b) {
  if (a.score != b.score) return a.score > b.score;  // score desc
  return a.id < b.id;                                // id asc
}

struct SearchCtx {
  int n_queries;
  int max_candidates;
  int k;
  // CSR hash over query k-mers — borrowed pointers; the Python caller
  // keeps the backing arrays alive for the context's lifetime
  // (prefilter/search.py _search_database_native holds the QueryKmerHash)
  const int32_t* starts;
  const int32_t* hit_query;
  const int32_t* hit_pos;
  // presence bitmap over the k-mer table: ~3.4 MB at k=5 (vs the 108 MB
  // offsets table), so the all-but-miss case of the scan stays in cache —
  // only ~|query k-mers| of the 27M table entries are nonempty
  std::vector<uint64_t> present;
  // accumulated per-query candidates (sorted desc, <= max_candidates)
  std::vector<std::vector<Candidate>> cands;
  std::vector<float> floors;
  int n_threads;
};

// Patience LIS length, strictly increasing (database_search.cpp:255-280).
// ``min_needed``: abort (returning the current lower bound) as soon as even
// extending by every remaining element cannot reach it — exact when the
// caller only needs to know whether LIS >= min_needed (admission check),
// because the returned value is then provably < min_needed too.
int lis_length(const std::vector<int32_t>& xs, std::vector<int32_t>& tails,
               int min_needed = 0) {
  tails.clear();
  const size_t n = xs.size();
  for (size_t i = 0; i < n; ++i) {
    if (static_cast<int>(tails.size() + (n - i)) < min_needed)
      return static_cast<int>(tails.size());
    const int32_t x = xs[i];
    auto it = std::lower_bound(tails.begin(), tails.end(), x);
    if (it == tails.end())
      tails.push_back(x);
    else
      *it = x;
  }
  return static_cast<int>(tails.size());
}

struct ThreadState {
  std::vector<std::vector<Candidate>> cands;   // per query, admitted this chunk
  std::vector<float> floors;                   // local floor copies
  std::vector<std::vector<int32_t>> qpos;      // per query scratch hit lists
  std::vector<int32_t> touched;                // queries hit by current seq
  std::vector<int32_t> tails;                  // LIS scratch
  std::vector<uint32_t> kmers;                 // k-mer scratch
  uint64_t cells = 0;
};

void scan_range(const SearchCtx* ctx, const uint8_t* codes,
                const int64_t* offsets, int64_t lo, int64_t hi,
                int64_t start_index, ThreadState* st) {
  const int k = ctx->k;
  const int32_t* starts = ctx->starts;
  const int32_t* hit_query = ctx->hit_query;
  const int32_t* hit_pos = ctx->hit_pos;
  const int maxc = ctx->max_candidates;

  for (int64_t si = lo; si < hi; ++si) {
    const uint8_t* seq = codes + offsets[si];
    const int64_t n = offsets[si + 1] - offsets[si];
    st->cells += static_cast<uint64_t>(n);
    if (n < k) continue;

    // rolling 5-bit pack + adjacent-dup skip
    st->kmers.clear();
    uint32_t km = 0;
    for (int j = 0; j < k; ++j) km = (km << 5) | seq[j];
    st->kmers.push_back(km);
    const uint32_t mask = (k == 5) ? 0x1FFFFFFu : (k == 4 ? 0xFFFFFu : 0x7FFFu);
    for (int64_t j = k; j < n; ++j) {
      km = ((km << 5) | seq[j]) & mask;
      if (km != st->kmers.back()) st->kmers.push_back(km);
      else continue;
    }
    // NOTE: adjacent-dup semantics — a k-mer is skipped only when equal to
    // the previous *emitted* k-mer, which for a rolling window is the same
    // as the previous raw k-mer (dup run collapses to one).

    // gather hits per query in db k-mer scan order.  The presence bitmap
    // screens ~99.9% of k-mers without touching the 108 MB offsets table.
    st->touched.clear();
    const uint64_t* present = ctx->present.data();
    // the bitmap probe is a random access into a multi-MB table (one LLC
    // round trip per k-mer dominates the scan: ~13 cycles/residue); the
    // k-mer list is already materialized, so prefetch a fixed distance
    // ahead to overlap the misses
    const size_t nk = st->kmers.size();
    const size_t kPrefetchDist = 16;
    for (size_t ki = 0; ki < nk; ++ki) {
      if (ki + kPrefetchDist < nk)
        __builtin_prefetch(&present[st->kmers[ki + kPrefetchDist] >> 6], 0, 1);
      const uint32_t kv = st->kmers[ki];
      if (!((present[kv >> 6] >> (kv & 63)) & 1)) continue;
      int64_t s = starts[kv], e = starts[kv + 1];
      for (int64_t h = s; h < e; ++h) {
        int32_t q = hit_query[h];
        if (st->qpos[q].empty()) st->touched.push_back(q);
        st->qpos[q].push_back(hit_pos[h]);
      }
    }

    const float len_f = static_cast<float>(n);
    const int64_t db_index = start_index + si;
    for (int32_t q : st->touched) {
      auto& lst = st->cands[q];
      float& floor = st->floors[q];
      // exact LIS skip: lis <= n_hits, so when the list is full and even
      // n_hits/len cannot beat the admission floor the candidate cannot
      // be admitted — identical candidate sets, no O(h log h) work.  At
      // many-query scale (the human-missense mode) this removes the
      // dominant cost once floors rise.
      int min_needed = 0;
      if (static_cast<int>(lst.size()) >= maxc) {
        if (static_cast<float>(st->qpos[q].size()) / len_f <= floor) {
          st->qpos[q].clear();
          continue;
        }
        // smallest integer L with (float)L/len > floor — admission needs
        // LIS >= L, so the LIS can abort once it provably falls short.
        // Derived under the same float division the score uses (the +-1
        // scan absorbs rounding at the boundary).
        int L = static_cast<int>(floor * len_f);
        while (L > 0 && static_cast<float>(L - 1) / len_f > floor) --L;
        while (static_cast<float>(L) / len_f <= floor) ++L;
        min_needed = L;
      }
      const float score =
          static_cast<float>(lis_length(st->qpos[q], st->tails, min_needed)) / len_f;
      st->qpos[q].clear();
      if (static_cast<int>(lst.size()) < maxc || score > floor) {
        lst.push_back({score, db_index});
        if (score < floor) floor = score;
        // periodic local truncation: sort by (score desc, id asc), keep
        // max_candidates, raise the floor to the local k-th best.  Exact:
        // within a thread ids ascend, so any later candidate with
        // score <= floor is outranked by >= maxc retained entries under
        // the total order and cannot reach the merged top-k.  This bounds
        // list memory (chunk-1 floors start at the sentinel, so unbounded
        // admission would otherwise grow lists ~linearly in hit volume)
        // and makes the LIS skip fire within the first chunk.
        if (static_cast<int>(lst.size()) >= 2 * maxc) {
          std::sort(lst.begin(), lst.end(), cand_less);
          lst.resize(maxc);
          floor = lst.back().score;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

void* sift4g_search_create(int n_queries, int max_candidates, int kmer_len,
                           const int32_t* starts, int64_t n_starts,
                           const int32_t* hit_query, const int32_t* hit_pos,
                           int64_t n_hits, int n_threads) {
  (void)n_hits;
  auto* ctx = new SearchCtx();
  ctx->n_queries = n_queries;
  ctx->max_candidates = max_candidates;
  ctx->k = kmer_len;
  ctx->starts = starts;
  ctx->hit_query = hit_query;
  ctx->hit_pos = hit_pos;
  const int64_t table = n_starts - 1;
  ctx->present.assign(static_cast<size_t>((table + 63) / 64), 0);
  for (int64_t kv = 0; kv < table; ++kv)
    if (starts[kv + 1] > starts[kv])
      ctx->present[kv >> 6] |= (1ull << (kv & 63));
  ctx->cands.resize(n_queries);
  ctx->floors.assign(n_queries, 1e6f);  // database_search.cpp:86
  unsigned hw = std::thread::hardware_concurrency();
  ctx->n_threads = n_threads > 0 ? n_threads : (hw ? static_cast<int>(hw) : 4);
  return ctx;
}

// Process one streamed chunk; returns its residue cell count.
uint64_t sift4g_search_chunk(void* handle, const uint8_t* codes,
                             const int64_t* offsets, int64_t n_seq,
                             int64_t start_index) {
  auto* ctx = static_cast<SearchCtx*>(handle);
  int nt = std::min<int64_t>(ctx->n_threads, std::max<int64_t>(1, n_seq));
  std::vector<ThreadState> states(nt);
  for (auto& st : states) {
    st.cands.resize(ctx->n_queries);
    st.floors = ctx->floors;
    st.qpos.resize(ctx->n_queries);
  }
  std::vector<std::thread> threads;
  // residue-balanced contiguous ranges (the reference splits by sequence
  // count, database_search.cpp:101-106; real databases have long-tailed
  // length distributions, so balance on offsets instead — candidate sets
  // are split-independent because per-thread lists merge at chunk end)
  const int64_t total_res = offsets[n_seq];
  int64_t lo = 0;
  for (int t = 0; t < nt; ++t) {
    int64_t hi;
    if (t == nt - 1) {
      hi = n_seq;
    } else {
      const int64_t target = total_res / nt * (t + 1);
      hi = std::lower_bound(offsets + lo, offsets + n_seq, target) - offsets;
    }
    if (lo >= hi) continue;
    threads.emplace_back(scan_range, ctx, codes, offsets, lo, hi, start_index,
                         &states[t]);
    lo = hi;
  }
  for (auto& th : threads) th.join();

  uint64_t cells = 0;
  for (auto& st : states) cells += st.cells;
  // merge + sort desc + truncate + floor update (database_search.cpp:131-154)
  for (int q = 0; q < ctx->n_queries; ++q) {
    auto& dst = ctx->cands[q];
    for (auto& st : states)
      dst.insert(dst.end(), st.cands[q].begin(), st.cands[q].end());
    if (dst.empty()) continue;
    std::sort(dst.begin(), dst.end(), cand_less);
    if (static_cast<int>(dst.size()) > ctx->max_candidates)
      dst.resize(ctx->max_candidates);
    ctx->floors[q] = dst.back().score;
  }
  return cells;
}

void sift4g_search_counts(void* handle, int64_t* out_counts) {
  auto* ctx = static_cast<SearchCtx*>(handle);
  for (int q = 0; q < ctx->n_queries; ++q)
    out_counts[q] = static_cast<int64_t>(ctx->cands[q].size());
}

// Flat per-query candidate db indices, ascending within each query
// (database_search.cpp:173-180).
void sift4g_search_collect(void* handle, int64_t* out_ids) {
  auto* ctx = static_cast<SearchCtx*>(handle);
  int64_t w = 0;
  for (int q = 0; q < ctx->n_queries; ++q) {
    std::vector<int64_t> ids;
    ids.reserve(ctx->cands[q].size());
    for (auto& c : ctx->cands[q]) ids.push_back(c.id);
    std::sort(ids.begin(), ids.end());
    for (int64_t id : ids) out_ids[w++] = id;
  }
}

// Flat per-query (id, score) pairs in (score desc, id asc) order — the
// in-context order after the end-of-chunk sort/truncate.  Multi-host runs
// merge per-shard candidate lists with the same total order, so shard
// merges reproduce the single-process top-k exactly.
void sift4g_search_collect_scored(void* handle, int64_t* out_ids,
                                  float* out_scores) {
  auto* ctx = static_cast<SearchCtx*>(handle);
  int64_t w = 0;
  for (int q = 0; q < ctx->n_queries; ++q) {
    for (auto& c : ctx->cands[q]) {
      out_ids[w] = c.id;
      out_scores[w] = c.score;
      ++w;
    }
  }
}

void sift4g_search_destroy(void* handle) {
  delete static_cast<SearchCtx*>(handle);
}

}  // extern "C"
