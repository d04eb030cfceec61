// Benchmark THE REFERENCE (AlayaLite, /root/reference) on this host's CPU.
//
// This file is a measurement harness, not part of alayalite_tpu: it compiles
// the reference's own header-only core in place (RawSpace -> HNSWBuilder ->
// GraphSearchJob::search_solo, the sync hot loop the reference uses on
// non-Linux / as its per-query kernel) and times build + search so
// BASELINE.md can carry a *measured* reference number instead of an
// estimate. spdlog / libcoro / Eigen-backed units are shimmed (stubs/)
// because those third-party deps are not in this image; the shims do not
// touch the measured code paths.
//
// Usage: ref_bench <data.bin> <queries.bin> <out_prefix> <R> <L> <k> <ef...>
//   *.bin layout: int64 n, int64 dim, then n*dim float32 row-major.
//   For each ef, writes <out_prefix>_ef<ef>.bin: int64 nq, int64 k, then
//   nq*k uint32 result ids, and prints one JSON line per ef with timing.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <vector>

#include "executor/jobs/graph_search_job.hpp"
#include "index/graph/hnsw/hnsw_builder.hpp"
#include "space/raw_space.hpp"

namespace {

std::vector<float> load_bin(const char *path, int64_t &n, int64_t &dim) {
  FILE *f = std::fopen(path, "rb");
  if (!f) { std::perror(path); std::exit(1); }
  if (std::fread(&n, 8, 1, f) != 1 || std::fread(&dim, 8, 1, f) != 1) {
    std::fprintf(stderr, "bad header in %s\n", path); std::exit(1);
  }
  std::vector<float> v(static_cast<size_t>(n) * dim);
  if (std::fread(v.data(), 4, v.size(), f) != v.size()) {
    std::fprintf(stderr, "short read in %s\n", path); std::exit(1);
  }
  std::fclose(f);
  return v;
}

double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch()).count();
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 7) {
    std::fprintf(stderr, "usage: %s data.bin queries.bin out_prefix R L k ef...\n", argv[0]);
    return 2;
  }
  int64_t n = 0, dim = 0, nq = 0, qdim = 0;
  auto data = load_bin(argv[1], n, dim);
  auto queries = load_bin(argv[2], nq, qdim);
  const char *out_prefix = argv[3];
  const uint32_t r = std::atoi(argv[4]);
  const uint32_t l = std::atoi(argv[5]);
  const uint32_t k = std::atoi(argv[6]);
  if (qdim != dim) { std::fprintf(stderr, "dim mismatch\n"); return 2; }

  using Space = alaya::RawSpace<float, float, uint32_t>;
  auto space = std::make_shared<Space>(static_cast<uint32_t>(n),
                                       static_cast<size_t>(dim),
                                       alaya::MetricType::L2);
  space->fit(data.data(), static_cast<uint32_t>(n));

  double t0 = now_s();
  alaya::HNSWBuilder<Space> builder(space, r, l);
  std::shared_ptr<alaya::Graph<float, uint32_t>> graph =
      builder.build_graph(/*thread_num=*/1);
  double build_s = now_s() - t0;
  std::fprintf(stderr, "build done in %.1fs\n", build_s);

  alaya::GraphSearchJob<Space> job(space, graph);
  std::vector<uint32_t> ids(static_cast<size_t>(nq) * k);

  for (int a = 7; a < argc; ++a) {
    const uint32_t ef = std::atoi(argv[a]);
    // warm-up on a slice, then timed full pass
    const int64_t warm = nq < 256 ? nq : 256;
    for (int64_t i = 0; i < warm; ++i) {
      job.search_solo(queries.data() + i * dim, k, ids.data() + i * k, ef);
    }
    double t1 = now_s();
    for (int64_t i = 0; i < nq; ++i) {
      job.search_solo(queries.data() + i * dim, k, ids.data() + i * k, ef);
    }
    double dt = now_s() - t1;

    char path[1024];
    std::snprintf(path, sizeof(path), "%s_ef%u.bin", out_prefix, ef);
    FILE *f = std::fopen(path, "wb");
    int64_t kk = k;
    std::fwrite(&nq, 8, 1, f);
    std::fwrite(&kk, 8, 1, f);
    std::fwrite(ids.data(), 4, ids.size(), f);
    std::fclose(f);

    std::printf("{\"ef\": %u, \"qps_1core\": %.1f, \"search_s\": %.3f, "
                "\"build_s\": %.1f, \"n\": %lld, \"dim\": %lld, \"nq\": %lld}\n",
                ef, nq / dt, dt, build_s,
                static_cast<long long>(n), static_cast<long long>(dim),
                static_cast<long long>(nq));
    std::fflush(stdout);
  }
  return 0;
}
