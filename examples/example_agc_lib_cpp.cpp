/*
 * C++ client of the agc-tpu native library (parity with the reference's
 * src/examples/example-agc-lib-cpp.cpp, which wraps the same operations
 * in the CAGCFile class; here a thin RAII wrapper over the C ABI plays
 * that role — the agc-tpu native library exports the C ABI only, the
 * C++ convenience layer being the Python `agc_tpu.api.AGCFile`).
 *
 * Build:
 *   g++ -std=c++17 example_agc_lib_cpp.cpp -I../agc_tpu/native \
 *       -L../agc_tpu/native -lagcnative -Wl,-rpath,../agc_tpu/native \
 *       -o example_agc_lib_cpp
 * Run:
 *   ./example_agc_lib_cpp archive.agc
 */

#include <cstdio>
#include <memory>
#include <string>
#include <vector>

#include "agc.h"

// the C ABI mirrors the reference exactly, taking char* (agc-api.h:119+)
static char* cs(const std::string& s) { return const_cast<char*>(s.c_str()); }

// RAII wrapper mirroring the reference's CAGCFile surface
// (reference: src/lib-cxx/agc-api.h:23-102)
class AGCFile {
 public:
  bool Open(const std::string& path, bool prefetch = true) {
    h_ = agc_open(cs(path), prefetch ? 1 : 0);
    return h_ != nullptr;
  }
  ~AGCFile() {
    if (h_) agc_close(h_);
  }
  int NSample() const { return agc_n_sample(h_); }
  int NCtg(const std::string& sample) const {
    return agc_n_ctg(h_, cs(sample));
  }
  std::string GetReferenceSample() const {
    char* s = agc_reference_sample(h_);
    std::string r = s ? s : "";
    agc_string_destroy(s);
    return r;
  }
  std::vector<std::string> ListSample() const {
    int n = 0;
    char** v = agc_list_sample(h_, &n);
    std::vector<std::string> r(v, v + n);
    agc_list_destroy(v);
    return r;
  }
  std::vector<std::string> ListCtg(const std::string& sample) const {
    int n = 0;
    char** v = agc_list_ctg(h_, cs(sample), &n);
    std::vector<std::string> r(v, v + n);
    agc_list_destroy(v);
    return r;
  }
  long GetCtgLen(const std::string& sample, const std::string& ctg) const {
    return agc_get_ctg_len(h_, cs(sample), cs(ctg));
  }
  std::string GetCtgSeq(const std::string& sample, const std::string& ctg,
                        int from, int to) const {
    long cap = agc_get_ctg_len(h_, cs(sample), cs(ctg));
    if (cap < 0) return "";
    std::string buf(static_cast<size_t>(cap) + 1, '\0');
    long got = agc_get_ctg_seq(h_, cs(sample), cs(ctg), from, to,
                               buf.data());
    if (got < 0) return "";
    buf.resize(static_cast<size_t>(got));
    return buf;
  }

 private:
  agc_t* h_ = nullptr;
};

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <archive.agc>\n", argv[0]);
    return 1;
  }
  AGCFile f;
  if (!f.Open(argv[1])) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  std::printf("samples: %d\n", f.NSample());
  std::printf("reference sample: %s\n", f.GetReferenceSample().c_str());
  int shown = 0;
  for (const auto& s : f.ListSample()) {
    if (shown++ >= 3) break;
    auto ctgs = f.ListCtg(s);
    std::printf("  %s: %zu contigs\n", s.c_str(), ctgs.size());
    if (!ctgs.empty()) {
      long len = f.GetCtgLen(s, ctgs[0]);
      std::string head = f.GetCtgSeq(s, ctgs[0], 0,
                                     len > 40 ? 39 : (int)len - 1);
      std::printf("    %s len=%ld head=%s\n", ctgs[0].c_str(), len,
                  head.c_str());
    }
  }
  return 0;
}
