// Streaming FASTA/FASTQ parse + 4-bit encode (the stage-0 hot loop).
//
// io/seqdb.read_fastx (the Python oracle, kseq semantics per reference
// src/kseq.h:100-223) pushes the whole read text through Python
// readline/strip/join — ~90 MB/s, the stage-0 wall at scale (15 GB of
// reads at 500 Mb).  This parser streams the file (gz via zlib) through
// a 4 MB buffer, applies the same record rules, encodes each read with
// the dual-strand codec (encode.cpp), and appends the packed bytes to
// the output file.  Names and lengths return via malloc'd buffers so
// the caller writes the .idx rows.
//
// Replicated oracle semantics (byte-identity asserted in
// tests/test_seqdb.py):
//  * leading junk before the first '>'/'@' is skipped
//  * name = first whitespace-delimited token after the marker (may be
//    empty); the rest of the header line is dropped
//  * sequence lines accumulate stripped (ASCII <= ' ' trimmed at both
//    ends) until a line starts with '>', '@', or '+'
//  * '+' starts a FASTQ quality block consumed until the accumulated
//    stripped quality length reaches the sequence length (so quality
//    lines starting with '@'/'>' are never mistaken for headers)
//  * empty sequences still yield records

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

extern "C" void encode_biseq_c(const char *seq, int64_t n, void *out);

namespace {

class LineReader {
 public:
  explicit LineReader(const char *path) {
    // plain files read via fread — zlib's transparent mode moves every
    // byte through its own buffer layer (~2x slower on uncompressed
    // input); gz detection by magic, not extension
    FILE *probe = fopen(path, "rb");
    if (!probe) return;
    unsigned char magic[2] = {0, 0};
    size_t got = fread(magic, 1, 2, probe);
    if (got == 2 && magic[0] == 0x1f && magic[1] == 0x8b) {
      fclose(probe);
      gz_ = gzopen(path, "rb");
      ok_ = gz_ != nullptr;
    } else {
      rewind(probe);
      plain_ = probe;
      ok_ = true;
    }
  }
  ~LineReader() {
    if (gz_) gzclose(gz_);
    if (plain_) fclose(plain_);
  }
  bool ok() const { return ok_; }

  // reads one line INCLUDING its newline into `line`; false at EOF with
  // nothing read
  bool getline(std::string &line) {
    line.clear();
    while (true) {
      if (pos_ >= len_) {
        len_ = gz_ ? gzread(gz_, buf_, sizeof buf_)
                   : (int)fread(buf_, 1, sizeof buf_, plain_);
        pos_ = 0;
        if (len_ <= 0) return !line.empty();
      }
      char *nl = (char *)memchr(buf_ + pos_, '\n', len_ - pos_);
      if (nl) {
        line.append(buf_ + pos_, nl - buf_ + 1 - pos_);
        pos_ = (int)(nl - buf_) + 1;
        return true;
      }
      line.append(buf_ + pos_, len_ - pos_);
      pos_ = len_;
    }
  }

 private:
  gzFile gz_ = nullptr;
  FILE *plain_ = nullptr;
  bool ok_ = false;
  char buf_[1 << 22];
  int pos_ = 0, len_ = 0;
};

// Python bytes.strip()/split() whitespace set: " \t\n\r\v\f" exactly
// (NOT all control chars)
inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
         c == '\f';
}

inline void strip_view(const std::string &s, const char **b, int64_t *n) {
  int64_t lo = 0, hi = (int64_t)s.size();
  while (lo < hi && is_ws(s[lo])) lo++;
  while (hi > lo && is_ws(s[hi - 1])) hi--;
  *b = s.data() + lo;
  *n = hi - lo;
}

}  // namespace

extern "C" {

// Parse `in_path` (FASTA/FASTQ, optionally gzipped), encode every read,
// append the packed bytes to `out_path`.  Outputs: names (\n-separated,
// malloc'd), lengths (int64, malloc'd), count.  Returns total encoded
// bytes appended, or -1 on error.
int64_t fastx_encode_c(const char *in_path, const char *out_path,
                       char **names_o, int64_t *names_len_o,
                       int64_t **lens_o, int64_t *count_o) {
  LineReader rd(in_path);
  if (!rd.ok()) return -1;
  FILE *out = fopen(out_path, "ab");
  if (!out) return -1;
  char *obuf = new char[1 << 22];
  setvbuf(out, obuf, _IOFBF, 1 << 22);

  std::string line, seq;
  std::vector<char> names;
  std::vector<int64_t> lens;
  std::vector<uint8_t> enc;
  int64_t total = 0;
  bool err = false;

  bool have = rd.getline(line);
  while (have && line[0] != '>' && line[0] != '@') have = rd.getline(line);
  while (have && !err) {
    // header: first whitespace token after the marker
    {
      int64_t i = 1, n = (int64_t)line.size();
      // skip leading whitespace inside the header (Python split())
      while (i < n && is_ws(line[i])) i++;
      int64_t j = i;
      while (j < n && !is_ws(line[j])) j++;
      names.insert(names.end(), line.data() + i, line.data() + j);
      names.push_back('\n');
    }
    seq.clear();
    have = rd.getline(line);
    while (have && line[0] != '>' && line[0] != '@' && line[0] != '+') {
      const char *b;
      int64_t n;
      strip_view(line, &b, &n);
      if (n) seq.append(b, n);
      have = rd.getline(line);
    }
    if (have && line[0] == '+') {  // FASTQ quality block
      int64_t qlen = 0;
      while (qlen < (int64_t)seq.size()) {
        if (!rd.getline(line)) {
          have = false;
          break;
        }
        const char *b;
        int64_t n;
        strip_view(line, &b, &n);
        qlen += n;
      }
      if (have) have = rd.getline(line);
    }
    const int64_t ln = (int64_t)seq.size();
    lens.push_back(ln);
    if (ln) {
      enc.resize(ln);
      encode_biseq_c(seq.data(), ln, enc.data());
      if ((int64_t)fwrite(enc.data(), 1, ln, out) != ln) err = true;
      total += ln;
    }
  }
  if (fclose(out) != 0) err = true;
  delete[] obuf;
  if (err) return -1;

  *names_len_o = (int64_t)names.size();
  *names_o = (char *)malloc(names.empty() ? 1 : names.size());
  memcpy(*names_o, names.data(), names.size());
  *count_o = (int64_t)lens.size();
  *lens_o = (int64_t *)malloc(lens.empty() ? 8 : lens.size() * 8);
  memcpy(*lens_o, lens.data(), lens.size() * 8);
  return total;
}

void free_fastx_c(char *names, int64_t *lens) {
  free(names);
  free(lens);
}

}  // extern "C"
