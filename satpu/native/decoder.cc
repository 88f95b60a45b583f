// Native beam Viterbi decoder over mapped loglikes (the runtime-native
// replacement for the reference's csrc/decoder.cc MappedLatticeFasterRecognizer
// built on kaldi's LatticeFasterDecoderTpl). TPU computes the acoustic
// loglikes; this decoder consumes them on the host.
//
// Graph representation: flat arc arrays (src, dst, ilabel=pdf+1 (0=eps),
// olabel=word, weight=-logprob) in CSR order by src, plus final costs.
// Epsilon arcs are expanded each frame (cost-ordered relaxation).
//
// C ABI (ctypes):
//   satpu_decode(...) -> best path words + per-frame pdf alignment + cost.
//
// Build: g++ -O3 -march=native -shared -fPIC decoder.cc -o libsatpu_decoder.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Graph {
  int32_t num_states;
  const int32_t* row_start;  // [num_states + 1] CSR offsets into arcs
  const int32_t* dst;
  const int32_t* ilabel;
  const int32_t* olabel;
  const float* weight;
  const float* final_cost;  // [num_states]
  int32_t start;
};

struct BackPtr {
  int32_t prev;
  int32_t olabel;
  int32_t pdf;  // -1 for epsilon
};

// Relax epsilon arcs until fixpoint (cost-ordered). tokens: cost per state
// (kInf = inactive), bp: backpointer index per state.
void EpsilonClosure(const Graph& g, std::vector<float>* cost,
                    std::vector<int32_t>* bp, std::vector<BackPtr>* bps,
                    const std::vector<int32_t>& active_in,
                    std::vector<int32_t>* active_out) {
  using QE = std::pair<float, int32_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> q;
  for (int32_t s : active_in) q.push({(*cost)[s], s});
  std::vector<uint8_t> seen(g.num_states, 0);
  active_out->clear();
  while (!q.empty()) {
    auto [c, s] = q.top();
    q.pop();
    if (c > (*cost)[s]) continue;
    if (!seen[s]) {
      seen[s] = 1;
      active_out->push_back(s);
    }
    for (int32_t a = g.row_start[s]; a < g.row_start[s + 1]; ++a) {
      if (g.ilabel[a] != 0) continue;
      float nc = c + g.weight[a];
      int32_t d = g.dst[a];
      if (nc < (*cost)[d]) {
        (*cost)[d] = nc;
        bps->push_back({(*bp)[s], g.olabel[a], -1});
        (*bp)[d] = (int32_t)bps->size() - 1;
        q.push({nc, d});
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. Outputs:
//   out_words [max_out] / out_nwords, out_align [T] / out_nalign, out_cost.
int satpu_decode(int32_t num_states, const int32_t* row_start,
                 const int32_t* dst, const int32_t* ilabel,
                 const int32_t* olabel, const float* weight,
                 const float* final_cost, int32_t start_state, int32_t T,
                 int32_t P, const float* loglikes, float acoustic_scale,
                 float beam, int32_t max_active, int32_t* out_words,
                 int32_t max_out, int32_t* out_nwords, int32_t* out_align,
                 int32_t* out_nalign, float* out_cost) {
  Graph g{num_states, row_start, dst, ilabel, olabel, weight, final_cost,
          start_state};

  std::vector<BackPtr> bps;
  bps.reserve((size_t)T * 64);
  bps.push_back({-1, 0, -1});

  std::vector<float> cost(num_states, kInf), next_cost(num_states, kInf);
  std::vector<int32_t> bp(num_states, 0), next_bp(num_states, 0);
  std::vector<int32_t> active, next_active, closure_active;
  cost[start_state] = 0.0f;
  active.push_back(start_state);
  EpsilonClosure(g, &cost, &bp, &bps, active, &closure_active);
  active = closure_active;

  std::vector<float> costs_buf;
  for (int32_t t = 0; t < T; ++t) {
    const float* ll = loglikes + (size_t)t * P;
    next_active.clear();
    float best = kInf;
    for (int32_t s : active) {
      float c = cost[s];
      int32_t b = bp[s];
      for (int32_t a = g.row_start[s]; a < g.row_start[s + 1]; ++a) {
        int32_t il = g.ilabel[a];
        if (il == 0) continue;
        float nc = c + g.weight[a] - acoustic_scale * ll[il - 1];
        int32_t d = g.dst[a];
        if (nc < next_cost[d]) {
          if (next_cost[d] == kInf) next_active.push_back(d);
          next_cost[d] = nc;
          bps.push_back({b, g.olabel[a], il - 1});
          next_bp[d] = (int32_t)bps.size() - 1;
          if (nc < best) best = nc;
        }
      }
    }
    // beam pruning
    float cutoff = best + beam;
    std::vector<int32_t> pruned;
    pruned.reserve(next_active.size());
    for (int32_t s : next_active) {
      if (next_cost[s] <= cutoff)
        pruned.push_back(s);
      else
        next_cost[s] = kInf;
    }
    // max-active pruning
    if ((int32_t)pruned.size() > max_active) {
      costs_buf.clear();
      for (int32_t s : pruned) costs_buf.push_back(next_cost[s]);
      std::nth_element(costs_buf.begin(), costs_buf.begin() + max_active - 1,
                       costs_buf.end());
      float thr = costs_buf[max_active - 1];
      std::vector<int32_t> keep;
      keep.reserve(max_active);
      for (int32_t s : pruned) {
        if (next_cost[s] <= thr && (int32_t)keep.size() < max_active)
          keep.push_back(s);
        else if (next_cost[s] > thr)
          next_cost[s] = kInf;
      }
      pruned.swap(keep);
    }
    // epsilon closure on the surviving tokens
    EpsilonClosure(g, &next_cost, &next_bp, &bps, pruned, &closure_active);
    // swap frames
    for (int32_t s : active) {
      cost[s] = kInf;
    }
    std::swap(cost, next_cost);
    std::swap(bp, next_bp);
    active = closure_active;
    if (active.empty()) break;
  }

  // pick best final token
  float best_total = kInf;
  int32_t best_bp = -1;
  for (int32_t s : active) {
    float fc = final_cost[s];
    float total = cost[s] + (std::isinf(fc) ? 0.0f : fc);
    bool is_final = !std::isinf(fc);
    if (is_final && total < best_total) {
      best_total = total;
      best_bp = bp[s];
    }
  }
  if (best_bp < 0) {  // no final state reached: fall back to best live token
    for (int32_t s : active) {
      if (cost[s] < best_total) {
        best_total = cost[s];
        best_bp = bp[s];
      }
    }
  }
  if (best_bp < 0) {
    *out_nwords = 0;
    *out_nalign = 0;
    *out_cost = kInf;
    return 1;
  }

  std::vector<int32_t> words, align;
  for (int32_t b = best_bp; b > 0; b = bps[b].prev) {
    if (bps[b].olabel != 0) words.push_back(bps[b].olabel);
    if (bps[b].pdf >= 0) align.push_back(bps[b].pdf);
  }
  std::reverse(words.begin(), words.end());
  std::reverse(align.begin(), align.end());
  int32_t nw = std::min<int32_t>((int32_t)words.size(), max_out);
  std::memcpy(out_words, words.data(), sizeof(int32_t) * nw);
  *out_nwords = nw;
  int32_t na = std::min<int32_t>((int32_t)align.size(), T);
  std::memcpy(out_align, align.data(), sizeof(int32_t) * na);
  *out_nalign = na;
  *out_cost = best_total;
  return 0;
}

}  // extern "C"
