// Native consensus window: backbone + per-read alignment + tag pileup +
// max-weight-path consensus, one call per template window.
//
// Semantics mirror the reference consensus core (falcon/falcon.c:67-397)
// and its driver loop (py/scripts/pg_asm_cns.py:109-249), and match the
// Python port in ops/consensus.py (cross-checked in tests):
//   * tags: (t_pos, delta, q_base) with predecessor links, built from the
//     gapped alignment strings of the banded O(ND) aligner;
//   * edges counted per (ctag -> ptag); scored count - 0.5*(coverage-1);
//   * DP over ctags in ascending uint64-key order (sentinel p_t_pos = -1
//     wraps high and sorts last within a ctag's predecessors);
//   * backtrack emits bases, lowercased where coverage <= min_cov.
//
// Unlike the reference's khash-of-khash, edges are a sorted flat vector —
// counting is a sort + run-length pass.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

typedef int32_t coor;

struct Alignment {
  coor aln_str_size, dist;
  coor aln_q_s, aln_q_e;
  coor aln_t_s, aln_t_e;
  char *q_aln_str;
  char *t_aln_str;
};

void dw_align_c(const char *q, coor q_len, const char *t, coor t_len,
                coor band_tolerance, int get_aln_str, Alignment *out);
void free_alignment_c(Alignment *a);

struct CnsResult {
  char *seq;
  int32_t len;
};

}  // extern "C"

namespace {

constexpr uint64_t kSentinelBase = '.';

inline uint64_t tag_key(int64_t t_pos, uint32_t delta, uint8_t base) {
  return (uint64_t)((uint32_t)t_pos) << 32 | (uint64_t)(delta & 0xFFFFFF) << 8 |
         base;
}

struct TagPair {
  uint64_t ctag, ptag;
};

// Accumulate one alignment's tags (reference falcon.c:67-122 plus the
// leading-deletion skip at falcon.c:304-310).
void add_tags(const char *q_aln, const char *t_aln, coor n, coor s1, coor s2,
              coor t_offset, std::vector<TagPair> *pairs,
              std::vector<int32_t> *coverage) {
  int64_t i = s1 - 1, j = s2 - 1;
  uint32_t jj = 0, p_jj = 0;
  int64_t p_j = -1;
  uint8_t p_q = '.';
  bool started = false;
  for (coor k = 0; k < n; k++) {
    const char qb = q_aln[k], tb = t_aln[k];
    if (qb != '-') {
      i++;
      jj++;
    }
    if (tb != '-') {
      j++;
      jj = 0;
    }
    if (j + t_offset >= 0 && jj < 255 && p_jj < 255) {
      if (!started && p_q == '-') {
        // leading-deletion columns skipped
      } else {
        started = true;
        pairs->push_back({tag_key(j + t_offset, jj, (uint8_t)qb),
                          tag_key(p_j + t_offset, p_jj, p_q)});
        if (jj == 0) (*coverage)[j + t_offset]++;
      }
      p_j = j;
      p_jj = jj;
      p_q = (uint8_t)qb;
    } else {
      break;
    }
  }
}

}  // namespace

extern "C" {

// One consensus window.  read_seqs are ASCII; shifts are template offsets
// (negative: read starts before the window).  Returns the consensus
// sequence (caller frees via free_cns_c).  A coverage-starved window
// (aligned bases < 3x template) returns the lowercased template.
void window_cns_c(const char *ref_seq, int32_t ref_len,
                  const char **read_seqs, const int32_t *read_lens,
                  const int32_t *shifts, int32_t n_reads, int32_t band,
                  int32_t min_cov, CnsResult *out) {
  std::vector<TagPair> pairs;
  std::vector<int32_t> coverage(ref_len + 2, 0);
  pairs.reserve((size_t)ref_len * 4);

  Alignment aln;
  // backbone self-alignment (reference pg_asm_cns.py:152-166)
  dw_align_c(ref_seq, ref_len, ref_seq, ref_len, 50, 1, &aln);
  add_tags(aln.q_aln_str, aln.t_aln_str, aln.aln_str_size, aln.aln_q_s,
           aln.aln_t_s, 0, &pairs, &coverage);
  free_alignment_c(&aln);

  int64_t aln_base = 0;
  for (int32_t r = 0; r < n_reads; r++) {
    const int32_t shift = shifts[r];
    const int32_t rl = read_lens[r];
    if (shift < 0) {
      if (-shift >= rl) continue;
      dw_align_c(read_seqs[r] - shift, rl + shift, ref_seq, ref_len, band, 1,
                 &aln);
      if (std::abs(std::abs(aln.aln_q_e - aln.aln_q_s) - (rl + shift)) < 48) {
        add_tags(aln.q_aln_str, aln.t_aln_str, aln.aln_str_size, aln.aln_q_s,
                 aln.aln_t_s, 0, &pairs, &coverage);
        aln_base += std::abs(aln.aln_t_e - aln.aln_t_s);
      }
    } else {
      if (shift >= ref_len) continue;
      dw_align_c(read_seqs[r], rl, ref_seq + shift, ref_len - shift, band, 1,
                 &aln);
      if (std::abs(std::abs(aln.aln_q_e - aln.aln_q_s) - rl) < 48 ||
          std::abs((ref_len - shift) - std::abs(aln.aln_q_e - aln.aln_q_s)) <
              48) {
        add_tags(aln.q_aln_str, aln.t_aln_str, aln.aln_str_size, aln.aln_q_s,
                 aln.aln_t_s, shift, &pairs, &coverage);
        aln_base += std::abs(aln.aln_t_e - aln.aln_t_s);
      }
    }
    free_alignment_c(&aln);
  }

  if (aln_base < (int64_t)ref_len * 3) {
    out->seq = (char *)std::malloc(ref_len + 1);
    for (int32_t i = 0; i < ref_len; i++)
      out->seq[i] = (char)std::tolower(ref_seq[i]);
    out->seq[ref_len] = 0;
    out->len = ref_len;
    return;
  }

  // count edges: sort (ctag, ptag) pairs, run-length
  std::sort(pairs.begin(), pairs.end(), [](const TagPair &a, const TagPair &b) {
    return a.ctag != b.ctag ? a.ctag < b.ctag : a.ptag < b.ptag;
  });

  std::unordered_map<uint64_t, size_t> node_of;
  node_of.reserve(pairs.size() / 2);
  std::vector<double> best_score;
  std::vector<uint64_t> best_ptag;
  std::vector<uint64_t> node_key;

  double global_best = 0.0;
  int64_t global_best_node = -1;

  size_t i = 0;
  while (i < pairs.size()) {
    size_t jdx = i;
    const uint64_t ctag = pairs[i].ctag;
    const int32_t t_pos = (int32_t)(ctag >> 32);
    while (jdx < pairs.size() && pairs[jdx].ctag == ctag) {
      size_t k = jdx;
      while (k < pairs.size() && pairs[k].ctag == ctag &&
             pairs[k].ptag == pairs[jdx].ptag)
        k++;
      const uint32_t count = (uint32_t)(k - jdx);
      const uint64_t ptag = pairs[jdx].ptag;
      const double score = (double)count - 0.5 * ((double)coverage[t_pos] - 1);

      auto it = node_of.find(ctag);
      size_t ni;
      if (it == node_of.end()) {
        ni = node_key.size();
        node_of.emplace(ctag, ni);
        node_key.push_back(ctag);
        best_score.push_back(score);
        best_ptag.push_back(ptag);
      } else {
        ni = it->second;
      }

      if ((char)(ptag & 0xFF) != '.') {
        auto pit = node_of.find(ptag);
        if (pit != node_of.end()) {
          const double new_score = score + best_score[pit->second];
          if (new_score > best_score[ni]) {
            best_score[ni] = new_score;
            best_ptag[ni] = ptag;
            if (new_score > global_best) {
              global_best = new_score;
              global_best_node = (int64_t)ni;
            }
          }
        }
      }
      jdx = k;
    }
    i = jdx;
  }

  std::vector<char> cns;
  cns.reserve(ref_len + 16);
  if (global_best_node >= 0) {
    size_t ni = (size_t)global_best_node;
    for (;;) {
      const uint64_t ctag = node_key[ni];
      const int32_t t_pos = (int32_t)(ctag >> 32);
      const char base = (char)(ctag & 0xFF);
      if (base != '-') {
        cns.push_back(coverage[t_pos] > min_cov ? base
                                                : (char)std::tolower(base));
      }
      const uint64_t ptag = best_ptag[ni];
      if ((char)(ptag & 0xFF) == '.') break;
      auto it = node_of.find(ptag);
      if (it == node_of.end()) break;
      ni = it->second;
    }
    std::reverse(cns.begin(), cns.end());
  }

  out->len = (int32_t)cns.size();
  out->seq = (char *)std::malloc(cns.size() + 1);
  std::memcpy(out->seq, cns.data(), cns.size());
  out->seq[cns.size()] = 0;
}

void free_cns_c(CnsResult *r) {
  std::free(r->seq);
  r->seq = nullptr;
}

}  // extern "C"
