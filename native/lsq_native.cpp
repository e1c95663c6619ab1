// Native host-side runtime for local_search_quantization_tpu.
//
// TPU-native framework keeps the *compute* path on the chip (XLA/Pallas);
// this library is the host data plane, replacing the reference's native
// layer (/root/reference/src/linscan/cpp/linscan_aqd.cpp,
// linscan_aqd_pairwise_byte.cpp and the src/read/ Julia readers):
//
//  - lsq_linscan: OpenMP ADC lookup-table kNN scan over byte codes, for
//    query serving from CPU hosts (and as a reference oracle for the TPU
//    scanner). Unlike the reference it takes precomputed per-query LUTs so
//    one entry point covers PQ/OPQ (distance LUTs) and additive codes
//    (inner-product LUTs + norm term).
//  - lsq_vecs_read: bulk TEXMEX fvecs/ivecs/bvecs reader with per-record
//    dimension validation, used by utils/io.py as a fast path.
//
// Build: make -C native     (g++ -O3 -fopenmp -shared)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Phase-1 ADC fill for a block of NB rows: buf[i] = sum_j lut_j[code[i,j]].
// The naive per-row loop is bound by its single dependent L1-load-add chain
// (~load latency per term, not load throughput); eight independent row
// chains keep ~8 loads in flight and approach the 2-loads/cycle L1 limit.
// Templated on M so the inner loop fully unrolls at the common widths.
template <int M>
void adc_block(float* buf, const uint8_t* c, const float* lut, int nb,
               int m_rt, int h) {
  const int m = (M > 0) ? M : m_rt;
  int i = 0;
  for (; i + 8 <= nb; i += 8, c += (int64_t)8 * m) {
    float d0 = 0, d1 = 0, d2 = 0, d3 = 0, d4 = 0, d5 = 0, d6 = 0, d7 = 0;
    for (int j = 0; j < m; ++j) {
      const float* l = lut + (int64_t)j * h;
      d0 += l[c[j]];
      d1 += l[c[m + j]];
      d2 += l[c[2 * m + j]];
      d3 += l[c[3 * m + j]];
      d4 += l[c[4 * m + j]];
      d5 += l[c[5 * m + j]];
      d6 += l[c[6 * m + j]];
      d7 += l[c[7 * m + j]];
    }
    buf[i] = d0; buf[i + 1] = d1; buf[i + 2] = d2; buf[i + 3] = d3;
    buf[i + 4] = d4; buf[i + 5] = d5; buf[i + 6] = d6; buf[i + 7] = d7;
  }
  for (; i < nb; ++i, c += m) {
    float d = 0;
    for (int j = 0; j < m; ++j) d += lut[(int64_t)j * h + c[j]];
    buf[i] = d;
  }
}

}  // namespace

extern "C" {

// ADC scan: for each query q, dist[i] = sum_j luts[q, j, codes[i, j]]
// (+ extra[i] if extra != nullptr), return the k smallest with indices.
//
//   dists : out [nq, k] float32
//   ids   : out [nq, k] int64 (0-based)
//   codes : in  [n, m] uint8 row-major
//   luts  : in  [nq, m, h] float32
//   extra : in  [n] float32 or nullptr (quantized database norms)
//   returns 0 on success.
int lsq_linscan(float* dists, int64_t* ids, const uint8_t* codes,
                const float* luts, const float* extra, int64_t n, int64_t nq,
                int m, int h, int k) {
  if (k > n || m <= 0 || h <= 0 || k <= 0) return 1;
  // 16 KB distance buffer (L1-resident); the codes block streams through L2.
  constexpr int BS = 4096;
  auto fill = adc_block<0>;
  if (m == 7) fill = adc_block<7>;
  if (m == 8) fill = adc_block<8>;
  if (m == 15) fill = adc_block<15>;
  if (m == 16) fill = adc_block<16>;

#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t q = 0; q < nq; ++q) {
    const float* lut = luts + q * (int64_t)m * h;
    float buf[BS];
    // Max-heap of size k over (dist, id): top is the current k-th best.
    std::vector<std::pair<float, int64_t>> heap;
    heap.reserve(k + 1);
    float thresh = std::numeric_limits<float>::infinity();
    for (int64_t row0 = 0; row0 < n; row0 += BS) {
      const int nb = (int)std::min<int64_t>(BS, n - row0);
      fill(buf, codes + row0 * (int64_t)m, lut, nb, m, h);
      if (extra) {
        const float* e = extra + row0;
        for (int i = 0; i < nb; ++i) buf[i] += e[i];
      }
      // Phase 2: threshold scan. Expected pass count over the whole db is
      // ~k * (1 + ln(n/k)) — the heap is cold code; this loop is a single
      // predictable compare per row.
      for (int i = 0; i < nb; ++i) {
        const float d = buf[i];
        if (d < thresh) {
          if ((int64_t)heap.size() < k) {
            heap.emplace_back(d, row0 + i);
            std::push_heap(heap.begin(), heap.end());
            if ((int64_t)heap.size() == k) thresh = heap.front().first;
          } else {
            std::pop_heap(heap.begin(), heap.end());
            heap.back() = {d, row0 + i};
            std::push_heap(heap.begin(), heap.end());
            thresh = heap.front().first;
          }
        }
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    float* dq = dists + q * (int64_t)k;
    int64_t* iq = ids + q * (int64_t)k;
    for (int j = 0; j < k; ++j) {
      dq[j] = heap[j].first;
      iq[j] = heap[j].second;
    }
  }
  return 0;
}

// Bulk TEXMEX reader. Each record: int32 dim header + dim * scalar_bytes.
//   out      : caller-allocated, count * dim * scalar_bytes bytes
//   dim_out  : receives the per-record dimension
//   returns number of records read, or -1 on format error, -2 on I/O error.
int64_t lsq_vecs_read(const char* path, int scalar_bytes, int64_t offset,
                      int64_t count, void* out, int* dim_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -2;
  int32_t dim = 0;
  if (std::fread(&dim, 4, 1, f) != 1 || dim <= 0) {
    std::fclose(f);
    return -1;
  }
  *dim_out = dim;
  const int64_t rec = 4 + (int64_t)dim * scalar_bytes;
#ifdef _WIN32
  std::fclose(f);
  return -2;
#else
  if (std::fseek(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    return -2;
  }
  const int64_t total = std::ftell(f) / rec;
  int64_t want = count < 0 ? total - offset : count;
  if (want > total - offset) want = total - offset;
  if (want < 0) {
    std::fclose(f);
    return -1;
  }
  std::fseek(f, offset * rec, SEEK_SET);
  std::vector<uint8_t> buf(rec);
  uint8_t* dst = static_cast<uint8_t*>(out);
  const int64_t body = (int64_t)dim * scalar_bytes;
  for (int64_t i = 0; i < want; ++i) {
    if (std::fread(buf.data(), 1, rec, f) != (size_t)rec) {
      std::fclose(f);
      return -1;
    }
    int32_t d2;
    std::memcpy(&d2, buf.data(), 4);
    if (d2 != dim) {
      std::fclose(f);
      return -1;  // inconsistent record dimension
    }
    std::memcpy(dst + i * body, buf.data() + 4, body);
  }
  std::fclose(f);
  return want;
#endif
}

int lsq_native_version() { return 1; }

}  // extern "C"
