// CTC prefix beam search with word-level n-gram LM fusion — native core.
//
// TPU-native replacement for the reference's external `ctcdecode` C++
// extension (reference decoder.py:96-100; SURVEY §2.2 N2). Host-side by
// design: beam bookkeeping and LM trie/hash lookups are irregular,
// pointer-chasing workloads that belong on CPU, while the acoustic model
// runs on the TPU. Exposed as a C ABI consumed via ctypes
// (danspeech_tpu/decode/native_beam.py) — no pybind11 dependency.
//
// Algorithm and scoring semantics match the Python oracle implementation
// in danspeech_tpu/decode/beam.py exactly (same log-domain recursion, same
// alpha * ln p(word|ctx) + beta boundary scoring, OOV = -1000, trailing
// partial-word scoring), which is tested against exhaustive CTC marginals.
// Utterances within a batch decode in parallel on a thread pool
// (reference used num_processes=6, DanSpeechRecognizer.py:91).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <limits>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();
constexpr double kOovScore = -1000.0;

inline double LogAddExp(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  if (a < b) std::swap(a, b);
  return a + std::log1p(std::exp(b - a));
}

// ---------------------------------------------------------------------------
// Packed n-gram LM (same layout as decode/lm.py PackedNgramLM)
// ---------------------------------------------------------------------------

constexpr uint64_t kMixA = 0x9E3779B97F4A7C15ull;
constexpr uint64_t kMixB = 0xC2B2AE3D27D4EB4Full;
constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ull;

inline uint64_t NgramFingerprint(const int32_t* ids, int n) {
  uint64_t h = kFnvOffset;
  for (int i = 0; i < n; ++i) {
    h = (h ^ (static_cast<uint64_t>(ids[i] + 1) * kMixB)) * kMixA;
  }
  return h ? h : 1ull;
}

// FNV-1a over utf-8 bytes; must match decode/native_beam.py word hashing.
inline uint64_t WordHash(const std::string& w) {
  uint64_t h = kFnvOffset;
  for (unsigned char c : w) {
    h = (h ^ static_cast<uint64_t>(c)) * 0x100000001B3ull;
  }
  return h ? h : 1ull;
}

struct PackedLM {
  // n-gram table (open addressing, linear probing; key 0 = empty)
  std::vector<uint64_t> keys;
  std::vector<float> probs;
  std::vector<float> backoffs;
  // vocab table: word-string hash -> word id
  std::vector<uint64_t> vocab_keys;
  std::vector<int32_t> vocab_ids;
  int order = 0;

  bool Lookup(const int32_t* ids, int n, float* prob, float* backoff) const {
    uint64_t key = NgramFingerprint(ids, n);
    size_t size = keys.size();
    size_t i = key % size;
    while (true) {
      uint64_t k = keys[i];
      if (k == 0) return false;
      if (k == key) {
        *prob = probs[i];
        *backoff = backoffs[i];
        return true;
      }
      i = (i + 1) % size;
    }
  }

  int32_t WordId(const std::string& w) const {
    if (vocab_keys.empty()) return -1;
    uint64_t key = WordHash(w);
    size_t size = vocab_keys.size();
    size_t i = key % size;
    while (true) {
      uint64_t k = vocab_keys[i];
      if (k == 0) return -1;
      if (k == key) return vocab_ids[i];
      i = (i + 1) % size;
    }
  }

  // ln p(word | context), standard backoff recursion.
  double ScoreIds(const int32_t* context, int ctx_len, int32_t word) const {
    double score = 0.0;
    std::vector<int32_t> ng(context, context + ctx_len);
    ng.push_back(word);
    int start = 0;
    while (true) {
      float p, b;
      if (Lookup(ng.data() + start, static_cast<int>(ng.size()) - start - 0, &p,
                 &b)) {
        return score + p;
      }
      if (static_cast<int>(ng.size()) - start == 1) return kOovScore;
      float cp, cb;
      if (Lookup(ng.data() + start, static_cast<int>(ng.size()) - start - 1,
                 &cp, &cb)) {
        score += cb;
      }
      ++start;
    }
  }
};

// ---------------------------------------------------------------------------
// KenLM probing-format LM (tables handed over by decode/kenlm_reader.py)
// ---------------------------------------------------------------------------

constexpr uint64_t kCombineA = 8978948897894561157ull;
constexpr uint64_t kCombineB = 17894857484156487943ull;

inline uint64_t KenlmCombine(uint64_t h, int32_t word_id) {
  return (h * kCombineA) ^ (static_cast<uint64_t>(1 + word_id) * kCombineB);
}

// MurmurHash64A, seed 0 — kenlm's util::MurmurHashNative vocabulary hash.
inline uint64_t MurmurHash64A(const void* key, size_t len) {
  const uint64_t m = 0xc6a4a7935bd1e995ull;
  const int r = 47;
  uint64_t h = 0 ^ (len * m);
  const uint8_t* data = static_cast<const uint8_t*>(key);
  const uint8_t* end = data + (len & ~size_t(7));
  while (data != end) {
    uint64_t k;
    std::memcpy(&k, data, 8);
    data += 8;
    k *= m;
    k ^= k >> r;
    k *= m;
    h ^= k;
    h *= m;
  }
  size_t tail = len & 7;
  if (tail) {
    uint64_t k = 0;
    std::memcpy(&k, data, tail);
    h ^= k;
    h *= m;
  }
  h ^= h >> r;
  h *= m;
  h ^= h >> r;
  return h;
}

struct KenLMTables {
  int order = 0;
  // unigram: (n_uni, 2) natural-log (prob, backoff), indexed by word id
  std::vector<float> unigram;
  int64_t n_uni = 0;
  // probing tables for orders 2..N (index [n-2]); longest has no backoffs
  std::vector<std::vector<uint64_t>> keys;
  std::vector<std::vector<float>> probs;
  std::vector<std::vector<float>> backoffs;
  // vocab: murmur(word) -> id, open addressing (key 0 empty)
  std::vector<uint64_t> vocab_keys;
  std::vector<uint32_t> vocab_ids;

  int32_t WordId(const std::string& w) const {
    if (w == "<unk>" || w == "<UNK>") return 0;
    if (vocab_keys.empty()) return -1;
    uint64_t key = MurmurHash64A(w.data(), w.size());
    size_t size = vocab_keys.size();
    size_t i = key % size;
    while (true) {
      uint64_t k = vocab_keys[i];
      if (k == 0) return -1;
      if (k == key) return static_cast<int32_t>(vocab_ids[i]);
      i = (i + 1) % size;
    }
  }

  bool Lookup(int n, uint64_t key, float* prob, float* backoff) const {
    const auto& ks = keys[n - 2];
    if (ks.empty()) return false;
    size_t size = ks.size();
    size_t i = key % size;
    while (true) {
      uint64_t k = ks[i];
      if (k == 0) return false;
      if (k == key) {
        *prob = probs[n - 2][i];
        *backoff = backoffs[n - 2].empty() ? 0.0f : backoffs[n - 2][i];
        return true;
      }
      i = (i + 1) % size;
    }
  }

  // ln p(word | context); context oldest-first, already truncated by caller.
  double ScoreIds(const int32_t* context, int ctx_len, int32_t word) const {
    double prob = unigram[2 * word];
    int matched = 1;
    uint64_t h = static_cast<uint64_t>(word);
    for (int i = 0; i < ctx_len; ++i) {
      h = KenlmCombine(h, context[ctx_len - 1 - i]);  // newest first
      float p, b;
      if (!Lookup(i + 2, h, &p, &b)) break;
      prob = p;
      matched = i + 2;
    }
    double score = prob;
    for (int k = matched - 1; k < ctx_len; ++k) {
      if (k == 0) {
        score += unigram[2 * context[ctx_len - 1] + 1];
      } else {
        // context suffix of length k+1: chain from its newest word back
        uint64_t ch = static_cast<uint64_t>(context[ctx_len - 1]);
        for (int j = 1; j <= k; ++j) {
          ch = KenlmCombine(ch, context[ctx_len - 1 - j]);
        }
        float p, b;
        if (Lookup(k + 1, ch, &p, &b)) score += b;
      }
    }
    return score;
  }
};

// ---------------------------------------------------------------------------
// Prefix trie beams
// ---------------------------------------------------------------------------

struct BeamVal {
  double log_pb = kNegInf;
  double log_pnb = kNegInf;
  double total() const { return LogAddExp(log_pb, log_pnb); }
};

struct TrieNode {
  TrieNode* parent = nullptr;
  int32_t character = -1;  // -1 = root
  int32_t depth = 0;
  int32_t time = -1;  // frame at which this char was emitted (best path)
  double time_score = kNegInf;
  // children stored in-node (small linear-scan vector: the branching
  // factor is <= num_classes and typically tiny) — one pointer chase per
  // extension instead of two hash lookups in a side table.
  std::vector<std::pair<int32_t, TrieNode*>> kids;
  // per-frame candidate accumulator, epoch-stamped so no per-frame hash
  // map is built or cleared (the former unordered_map<TrieNode*, BeamVal>
  // dominated the frame loop)
  int32_t epoch = -1;
  BeamVal acc;
  // LM bookkeeping: word ids completed so far + partial-word chars
  // materialized lazily when scoring.
};

struct Decoder {
  int num_classes;
  int blank;
  int space;
  int beam_width;
  int cutoff_top_n;
  double cutoff_prob;
  double alpha;
  double beta;
  int num_threads;
  PackedLM lm;
  bool has_lm = false;
  KenLMTables kenlm;
  bool has_kenlm = false;
  // label id -> utf-8 string for building word strings
  std::vector<std::string> label_strs;
};

struct Candidate {
  int cls;
  double log_p;
};

struct PrefixState {
  TrieNode* node;
  BeamVal val;
};

// Recover the label sequence of a trie node (root-excluded), oldest first.
void NodeLabels(const TrieNode* n, std::vector<int32_t>* out) {
  out->clear();
  for (const TrieNode* p = n; p->character >= 0; p = p->parent) {
    out->push_back(p->character);
  }
  std::reverse(out->begin(), out->end());
}

// LM boundary score cache key: trie node pointer (prefix identity).
struct LMScorer {
  const Decoder* dec;
  std::unordered_map<const TrieNode*, double> cache;
  std::vector<int32_t> scratch;

  double ScoreBoundary(const TrieNode* prefix) {
    auto it = cache.find(prefix);
    if (it != cache.end()) return it->second;

    // split prefix into words (label ids between spaces)
    NodeLabels(prefix, &scratch);
    std::vector<std::string> words;
    std::string cur;
    for (int32_t c : scratch) {
      if (c == dec->space) {
        if (!cur.empty()) words.push_back(cur);
        cur.clear();
      } else {
        cur += dec->label_strs[c];
      }
    }
    double score;
    if (cur.empty()) {
      score = 0.0;  // double space
    } else if (dec->has_kenlm) {
      int32_t wid = dec->kenlm.WordId(cur);
      if (wid <= 0) {  // miss or <unk>: OOV semantics
        score = dec->alpha * kOovScore + dec->beta;
      } else {
        std::vector<int32_t> ctx;
        int need = dec->kenlm.order - 1;
        for (auto w = words.rbegin(); w != words.rend() && need > 0; ++w) {
          int32_t id = dec->kenlm.WordId(*w);
          if (id >= 0) {
            ctx.push_back(id);
            --need;
          }
        }
        std::reverse(ctx.begin(), ctx.end());
        score = dec->alpha *
                    dec->kenlm.ScoreIds(ctx.data(),
                                        static_cast<int>(ctx.size()), wid) +
                dec->beta;
      }
    } else {
      int32_t wid = dec->lm.WordId(cur);
      if (wid < 0) {
        score = dec->alpha * kOovScore + dec->beta;
      } else {
        // context = trailing known words, up to order-1
        std::vector<int32_t> ctx;
        int need = dec->lm.order - 1;
        for (auto w = words.rbegin(); w != words.rend() && need > 0; ++w) {
          int32_t id = dec->lm.WordId(*w);
          if (id >= 0) {
            ctx.push_back(id);
            --need;
          }
        }
        std::reverse(ctx.begin(), ctx.end());
        score = dec->alpha *
                    dec->lm.ScoreIds(ctx.data(), static_cast<int>(ctx.size()),
                                     wid) +
                dec->beta;
      }
    }
    cache.emplace(prefix, score);
    return score;
  }
};

struct BeamResult {
  std::vector<int32_t> labels;
  std::vector<int32_t> times;
  double score;
};

void DecodeOne(const Decoder& dec, const float* probs, int t_max,
               std::vector<BeamResult>* results) {
  std::deque<TrieNode> arena;  // stable addresses
  arena.emplace_back();        // root
  TrieNode* root = &arena.back();

  LMScorer scorer{&dec, {}, {}};

  auto child = [&](TrieNode* parent, int32_t c, int t,
                   double score) -> TrieNode* {
    TrieNode* slot = nullptr;
    for (auto& kv : parent->kids) {
      if (kv.first == c) {
        slot = kv.second;
        break;
      }
    }
    if (slot == nullptr) {
      arena.emplace_back();
      slot = &arena.back();
      slot->parent = parent;
      slot->character = c;
      slot->depth = parent->depth + 1;
      parent->kids.emplace_back(c, slot);
    }
    if (score > slot->time_score) {
      slot->time_score = score;
      slot->time = t;
    }
    return slot;
  };

  std::vector<PrefixState> beams;
  beams.push_back({root, BeamVal{0.0, kNegInf}});

  std::vector<Candidate> cands;
  cands.reserve(dec.num_classes);

  // frame-local candidate set: epoch-stamped accumulators on the nodes
  std::vector<TrieNode*> touched;
  touched.reserve(1024);
  auto accum = [&](TrieNode* n, int t) -> BeamVal& {
    if (n->epoch != t) {
      n->epoch = t;
      n->acc = BeamVal{};
      touched.push_back(n);
    }
    return n->acc;
  };

  for (int t = 0; t < t_max; ++t) {
    const float* row = probs + static_cast<size_t>(t) * dec.num_classes;

    cands.clear();
    for (int c = 0; c < dec.num_classes; ++c) {
      cands.push_back({c, std::log(std::max(row[c], 1e-30f))});
    }
    if (dec.cutoff_top_n < dec.num_classes || dec.cutoff_prob < 1.0) {
      std::sort(cands.begin(), cands.end(),
                [](const Candidate& a, const Candidate& b) {
                  return a.log_p > b.log_p;
                });
      int keep = dec.num_classes;
      if (dec.cutoff_prob < 1.0) {
        double csum = 0.0;
        keep = 0;
        for (const auto& cd : cands) {
          csum += std::exp(cd.log_p);
          ++keep;
          if (csum >= dec.cutoff_prob) break;
        }
      }
      keep = std::min(keep, dec.cutoff_top_n);
      cands.resize(keep);
    }

    touched.clear();
    for (auto& ps : beams) {
      TrieNode* prefix = ps.node;
      const BeamVal& val = ps.val;
      double total = val.total();
      int32_t last = prefix->character;  // -1 at root

      for (const auto& cd : cands) {
        int c = cd.cls;
        double p = cd.log_p;
        if (c == dec.blank) {
          BeamVal& nb = accum(prefix, t);
          nb.log_pb = LogAddExp(nb.log_pb, total + p);
        } else if (c == last) {
          BeamVal& nb = accum(prefix, t);
          nb.log_pnb = LogAddExp(nb.log_pnb, val.log_pnb + p);
          double score = val.log_pb + p;
          if (dec.has_lm && c == dec.space) {
            score += scorer.ScoreBoundary(prefix);
          }
          TrieNode* ext = child(prefix, c, t, score);
          BeamVal& ne = accum(ext, t);
          ne.log_pnb = LogAddExp(ne.log_pnb, score);
        } else {
          double score = total + p;
          if (dec.has_lm && c == dec.space) {
            score += scorer.ScoreBoundary(prefix);
          }
          TrieNode* ext = child(prefix, c, t, score);
          BeamVal& ne = accum(ext, t);
          ne.log_pnb = LogAddExp(ne.log_pnb, score);
        }
      }
    }

    // prune to beam width: order within the surviving front doesn't matter
    // mid-stream (only the final results are rank-sorted), so an O(n)
    // nth_element selection replaces the former full O(n log n) sort of
    // the ~W*C candidate map every frame
    if (static_cast<int>(touched.size()) > dec.beam_width) {
      std::nth_element(touched.begin(), touched.begin() + dec.beam_width,
                       touched.end(),
                       [](const TrieNode* a, const TrieNode* b) {
                         return a->acc.total() > b->acc.total();
                       });
      touched.resize(dec.beam_width);
    }
    beams.clear();
    for (TrieNode* n : touched) beams.push_back({n, n->acc});
  }

  results->clear();
  results->reserve(beams.size());
  std::vector<int32_t> labels;
  for (auto& ps : beams) {
    TrieNode* prefix = ps.node;
    double score = ps.val.total();
    if (dec.has_lm && prefix->character >= 0 &&
        prefix->character != dec.space) {
      score += scorer.ScoreBoundary(prefix);
    }
    BeamResult r;
    NodeLabels(prefix, &labels);
    r.labels = labels;
    r.times.resize(labels.size());
    int i = static_cast<int>(labels.size()) - 1;
    for (TrieNode* p = prefix; p->character >= 0; p = p->parent, --i) {
      r.times[i] = p->time;
    }
    r.score = score;
    results->push_back(std::move(r));
  }
  std::sort(results->begin(), results->end(),
            [](const BeamResult& a, const BeamResult& b) {
              return a.score > b.score;
            });
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* ctcbeam_create(int num_classes, int blank, int space, int beam_width,
                     int cutoff_top_n, double cutoff_prob, double alpha,
                     double beta, int num_threads,
                     const char* label_bytes /* \n-separated utf-8 */) {
  auto* dec = new Decoder();
  dec->num_classes = num_classes;
  dec->blank = blank;
  dec->space = space;
  dec->beam_width = beam_width;
  dec->cutoff_top_n = cutoff_top_n;
  dec->cutoff_prob = cutoff_prob;
  dec->alpha = alpha;
  dec->beta = beta;
  dec->num_threads = num_threads > 0 ? num_threads : 1;
  std::string all(label_bytes);
  size_t pos = 0;
  while (pos <= all.size()) {
    size_t nl = all.find('\n', pos);
    if (nl == std::string::npos) {
      dec->label_strs.push_back(all.substr(pos));
      break;
    }
    dec->label_strs.push_back(all.substr(pos, nl - pos));
    pos = nl + 1;
  }
  return dec;
}

void ctcbeam_set_lm(void* handle, const uint64_t* keys, const float* probs,
                    const float* backoffs, int64_t table_size,
                    const uint64_t* vocab_keys, const int32_t* vocab_ids,
                    int64_t vocab_size, int order) {
  auto* dec = static_cast<Decoder*>(handle);
  dec->lm.keys.assign(keys, keys + table_size);
  dec->lm.probs.assign(probs, probs + table_size);
  dec->lm.backoffs.assign(backoffs, backoffs + table_size);
  dec->lm.vocab_keys.assign(vocab_keys, vocab_keys + vocab_size);
  dec->lm.vocab_ids.assign(vocab_ids, vocab_ids + vocab_size);
  dec->lm.order = order;
  dec->has_lm = true;
}

// Install a KenLM probing-format LM (natural-log tables from
// decode/kenlm_reader.py). Call _begin once, then _table for each order
// 2..N (backoffs = nullptr for the longest order).
void ctcbeam_set_lm_kenlm_begin(void* handle, int order, const float* unigram,
                                int64_t n_uni, const uint64_t* vocab_keys,
                                const uint32_t* vocab_ids,
                                int64_t vocab_buckets) {
  auto* dec = static_cast<Decoder*>(handle);
  dec->kenlm = KenLMTables();
  dec->kenlm.order = order;
  dec->kenlm.unigram.assign(unigram, unigram + 2 * n_uni);
  dec->kenlm.n_uni = n_uni;
  dec->kenlm.vocab_keys.assign(vocab_keys, vocab_keys + vocab_buckets);
  dec->kenlm.vocab_ids.assign(vocab_ids, vocab_ids + vocab_buckets);
  dec->kenlm.keys.resize(order - 1);
  dec->kenlm.probs.resize(order - 1);
  dec->kenlm.backoffs.resize(order - 1);
  dec->has_kenlm = true;
  dec->has_lm = true;  // enables boundary scoring in the search loop
}

void ctcbeam_set_lm_kenlm_table(void* handle, int order_n,
                                const uint64_t* keys, const float* probs,
                                const float* backoffs, int64_t buckets) {
  auto* dec = static_cast<Decoder*>(handle);
  int idx = order_n - 2;
  if (idx < 0 || idx >= static_cast<int>(dec->kenlm.keys.size())) return;
  dec->kenlm.keys[idx].assign(keys, keys + buckets);
  dec->kenlm.probs[idx].assign(probs, probs + buckets);
  if (backoffs != nullptr) {
    dec->kenlm.backoffs[idx].assign(backoffs, backoffs + buckets);
  } else {
    dec->kenlm.backoffs[idx].clear();
  }
}

// Decode a batch. probs: (b, t_max, c) row-major; lengths: per-row frames.
// Outputs are dense (b, beam_width, max_len) int32 + per-beam lens/scores.
int ctcbeam_decode_batch(void* handle, const float* probs, int batch,
                         int t_max, int num_classes, const int32_t* lengths,
                         int32_t* out_labels, int32_t* out_times,
                         int32_t* out_lens, float* out_scores,
                         int32_t* out_num_beams, int max_len) {
  auto* dec = static_cast<Decoder*>(handle);
  if (num_classes != dec->num_classes) return -1;

  auto work = [&](int b) {
    std::vector<BeamResult> results;
    DecodeOne(*dec, probs + static_cast<size_t>(b) * t_max * num_classes,
              lengths[b], &results);
    int nbeams = std::min<int>(results.size(), dec->beam_width);
    out_num_beams[b] = nbeams;
    for (int k = 0; k < nbeams; ++k) {
      const BeamResult& r = results[k];
      int n = std::min<int>(r.labels.size(), max_len);
      size_t base = (static_cast<size_t>(b) * dec->beam_width + k) * max_len;
      std::memcpy(out_labels + base, r.labels.data(), n * sizeof(int32_t));
      std::memcpy(out_times + base, r.times.data(), n * sizeof(int32_t));
      out_lens[static_cast<size_t>(b) * dec->beam_width + k] = n;
      out_scores[static_cast<size_t>(b) * dec->beam_width + k] =
          static_cast<float>(r.score);
    }
  };

  if (dec->num_threads <= 1 || batch <= 1) {
    for (int b = 0; b < batch; ++b) work(b);
  } else {
    std::vector<std::thread> threads;
    std::atomic_int counter{0};
    int nthreads = std::min(dec->num_threads, batch);
    for (int i = 0; i < nthreads; ++i) {
      threads.emplace_back([&]() {
        int b;
        while ((b = counter.fetch_add(1)) < batch) work(b);
      });
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

void ctcbeam_destroy(void* handle) { delete static_cast<Decoder*>(handle); }

}  // extern "C"
