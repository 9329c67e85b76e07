// tpusort host-side native runtime.
//
// The TPU framework's compute path is JAX/XLA/Pallas; this library is the
// host-native complement, covering what the reference implements in C++ on
// the host side:
//   * a fast trusted CPU oracle (the role CUB's reference sorts play in
//     msb/tests/test_sort_keys.cu:14-45 and CPU std::stable_sort plays in
//     lsb/cub/test/test_device_radix_sort.cu): an LSD radix
//     sort/argsort used to verify billion-key device outputs in seconds,
//   * sortedness/permutation verification kernels (the memcmp + mismatch
//     window logic of test_sort_keys.cu:59-78),
//   * a monotonic wall clock (msb/external/benchmark/get_real_time.cu).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Wall clock
// ---------------------------------------------------------------------------

double ts_real_time() {
  using clock = std::chrono::steady_clock;
  return std::chrono::duration<double>(clock::now().time_since_epoch())
      .count();
}

// ---------------------------------------------------------------------------
// LSD radix sort oracle (stable), keys and argsort variants
// ---------------------------------------------------------------------------

static void radix_pass_u32(const uint32_t* in, uint32_t* out,
                           const uint32_t* vin, uint32_t* vout, size_t n,
                           int shift) {
  size_t hist[257] = {0};
  for (size_t i = 0; i < n; i++) hist[((in[i] >> shift) & 0xFF) + 1]++;
  for (int b = 0; b < 256; b++) hist[b + 1] += hist[b];
  for (size_t i = 0; i < n; i++) {
    size_t d = (in[i] >> shift) & 0xFF;
    size_t p = hist[d]++;
    out[p] = in[i];
    if (vin) vout[p] = vin[i];
  }
}

void ts_sort_u32(const uint32_t* keys, uint32_t* out, size_t n) {
  std::vector<uint32_t> tmp(n);
  // 4 passes ping-pong: keys -> tmp -> out -> tmp -> out
  radix_pass_u32(keys, tmp.data(), nullptr, nullptr, n, 0);
  radix_pass_u32(tmp.data(), out, nullptr, nullptr, n, 8);
  radix_pass_u32(out, tmp.data(), nullptr, nullptr, n, 16);
  radix_pass_u32(tmp.data(), out, nullptr, nullptr, n, 24);
}

// stable argsort of u32 keys: writes the permutation into idx (uint32)
void ts_argsort_u32(const uint32_t* keys, uint32_t* idx, size_t n) {
  std::vector<uint32_t> k0(keys, keys + n), k1(n), i1(n);
  std::vector<uint32_t> i0(n);
  for (size_t i = 0; i < n; i++) i0[i] = (uint32_t)i;
  radix_pass_u32(k0.data(), k1.data(), i0.data(), i1.data(), n, 0);
  radix_pass_u32(k1.data(), k0.data(), i1.data(), i0.data(), n, 8);
  radix_pass_u32(k0.data(), k1.data(), i0.data(), i1.data(), n, 16);
  radix_pass_u32(k1.data(), k0.data(), i1.data(), i0.data(), n, 24);
  std::memcpy(idx, i0.data(), n * sizeof(uint32_t));
}

static void radix_pass_u64(const uint64_t* in, uint64_t* out,
                           const uint32_t* vin, uint32_t* vout, size_t n,
                           int shift) {
  size_t hist[257] = {0};
  for (size_t i = 0; i < n; i++) hist[((in[i] >> shift) & 0xFF) + 1]++;
  for (int b = 0; b < 256; b++) hist[b + 1] += hist[b];
  for (size_t i = 0; i < n; i++) {
    size_t d = (in[i] >> shift) & 0xFF;
    size_t p = hist[d]++;
    out[p] = in[i];
    if (vin) vout[p] = vin[i];
  }
}

void ts_sort_u64(const uint64_t* keys, uint64_t* out, size_t n) {
  std::vector<uint64_t> a(keys, keys + n), b(n);
  for (int p = 0; p < 8; p++) {
    radix_pass_u64(a.data(), b.data(), nullptr, nullptr, n, p * 8);
    a.swap(b);
  }
  std::memcpy(out, a.data(), n * sizeof(uint64_t));
}

void ts_argsort_u64(const uint64_t* keys, uint32_t* idx, size_t n) {
  std::vector<uint64_t> k0(keys, keys + n), k1(n);
  std::vector<uint32_t> i0(n), i1(n);
  for (size_t i = 0; i < n; i++) i0[i] = (uint32_t)i;
  for (int p = 0; p < 8; p++) {
    radix_pass_u64(k0.data(), k1.data(), i0.data(), i1.data(), n, p * 8);
    k0.swap(k1);
    i0.swap(i1);
  }
  std::memcpy(idx, i0.data(), n * sizeof(uint32_t));
}

// ---------------------------------------------------------------------------
// Multithreaded LSD radix sort (the oracle at billion-key scale)
//
// Per pass: each thread histograms its even-share chunk, a digit-major scan
// over the (digit, thread) matrix assigns stable global bases (the same
// striped-spine trick as CUB's upsweep/spine/downsweep,
// dispatch_radix_sort.cuh:72-193, on host threads instead of thread blocks),
// then each thread scatters its chunk.
// ---------------------------------------------------------------------------

static void mt_radix_pass_u32(const uint32_t* in, uint32_t* out,
                              const uint32_t* vin, uint32_t* vout, size_t n,
                              int shift, int nt) {
  std::vector<size_t> hist((size_t)nt * 256, 0);
  size_t chunk = (n + nt - 1) / nt;
  auto histo = [&](int t) {
    size_t lo = (size_t)t * chunk, hi = std::min(n, lo + chunk);
    size_t* h = &hist[(size_t)t * 256];
    for (size_t i = lo; i < hi; i++) h[(in[i] >> shift) & 0xFF]++;
  };
  {
    std::vector<std::thread> ths;
    for (int t = 1; t < nt; t++) ths.emplace_back(histo, t);
    histo(0);
    for (auto& th : ths) th.join();
  }
  // digit-major exclusive scan: base of (digit d, thread t)
  size_t base = 0;
  for (int d = 0; d < 256; d++) {
    for (int t = 0; t < nt; t++) {
      size_t c = hist[(size_t)t * 256 + d];
      hist[(size_t)t * 256 + d] = base;
      base += c;
    }
  }
  auto scatter = [&](int t) {
    size_t lo = (size_t)t * chunk, hi = std::min(n, lo + chunk);
    size_t* h = &hist[(size_t)t * 256];
    for (size_t i = lo; i < hi; i++) {
      size_t p = h[(in[i] >> shift) & 0xFF]++;
      out[p] = in[i];
      if (vin) vout[p] = vin[i];
    }
  };
  {
    std::vector<std::thread> ths;
    for (int t = 1; t < nt; t++) ths.emplace_back(scatter, t);
    scatter(0);
    for (auto& th : ths) th.join();
  }
}

void ts_sort_u32_mt(const uint32_t* keys, uint32_t* out, size_t n,
                    int nthreads) {
  if (nthreads <= 0) {
    nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads <= 0) nthreads = 1;
  }
  if (n < (size_t)nthreads * 4096 || nthreads == 1) {
    ts_sort_u32(keys, out, n);
    return;
  }
  std::vector<uint32_t> tmp(n);
  mt_radix_pass_u32(keys, tmp.data(), nullptr, nullptr, n, 0, nthreads);
  mt_radix_pass_u32(tmp.data(), out, nullptr, nullptr, n, 8, nthreads);
  mt_radix_pass_u32(out, tmp.data(), nullptr, nullptr, n, 16, nthreads);
  mt_radix_pass_u32(tmp.data(), out, nullptr, nullptr, n, 24, nthreads);
}

void ts_argsort_u32_mt(const uint32_t* keys, uint32_t* idx, size_t n,
                       int nthreads) {
  if (nthreads <= 0) {
    nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads <= 0) nthreads = 1;
  }
  if (n < (size_t)nthreads * 4096 || nthreads == 1) {
    ts_argsort_u32(keys, idx, n);
    return;
  }
  std::vector<uint32_t> k0(keys, keys + n), k1(n), i0(n), i1(n);
  for (size_t i = 0; i < n; i++) i0[i] = (uint32_t)i;
  mt_radix_pass_u32(k0.data(), k1.data(), i0.data(), i1.data(), n, 0,
                    nthreads);
  mt_radix_pass_u32(k1.data(), k0.data(), i1.data(), i0.data(), n, 8,
                    nthreads);
  mt_radix_pass_u32(k0.data(), k1.data(), i0.data(), i1.data(), n, 16,
                    nthreads);
  mt_radix_pass_u32(k1.data(), k0.data(), i1.data(), i0.data(), n, 24,
                    nthreads);
  std::memcpy(idx, i0.data(), n * sizeof(uint32_t));
}

// ---------------------------------------------------------------------------
// Verification kernels
// ---------------------------------------------------------------------------

// returns -1 if nondecreasing, else the first violating index
int64_t ts_first_unsorted_u32(const uint32_t* keys, size_t n) {
  for (size_t i = 1; i < n; i++)
    if (keys[i - 1] > keys[i]) return (int64_t)i;
  return -1;
}

int64_t ts_first_unsorted_u64(const uint64_t* keys, size_t n) {
  for (size_t i = 1; i < n; i++)
    if (keys[i - 1] > keys[i]) return (int64_t)i;
  return -1;
}

// returns -1 if arrays are bytewise equal, else first mismatching index
int64_t ts_first_mismatch_u32(const uint32_t* a, const uint32_t* b,
                              size_t n) {
  for (size_t i = 0; i < n; i++)
    if (a[i] != b[i]) return (int64_t)i;
  return -1;
}

// permutation check for unstable pairs (test_sort_pairs.cu:141-175):
// values must be a permutation of 0..n-1 and every (key, value) output pair
// must map back to its original key. returns -1 ok, else failing index.
int64_t ts_verify_pairs_u32(const uint32_t* orig_keys,
                            const uint32_t* out_keys,
                            const uint32_t* out_vals, size_t n) {
  std::vector<uint8_t> seen(n, 0);
  for (size_t i = 0; i < n; i++) {
    uint32_t v = out_vals[i];
    if (v >= n || seen[v]) return (int64_t)i;
    seen[v] = 1;
    if (orig_keys[v] != out_keys[i]) return (int64_t)i;
  }
  return -1;
}

}  // extern "C"
