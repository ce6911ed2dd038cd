// Native host-side dataset loader for mamimo_tpu.
//
// Role: the reference's data path is a Python per-sample dict-lookup
// generator (massiveMIMO_dataGenerator.py:294-316). On-device gathers
// replace it when the dataset fits in HBM; for larger-than-HBM datasets
// (e.g. the 9000-packet BS64 corpus) this library streams training
// batches from an mmap'd raw container with a worker-thread gather, so
// the host never materializes more than the in-flight batches.
//
// C ABI (consumed via ctypes from mamimo_tpu/data/native_loader.py):
//   dl_open(path)                        -> handle (0 on failure)
//   dl_meta(handle, out_int64[6])        -> B, L, R, C, T, sample_count
//   dl_gather(handle, idx, n, sig_out, y_out, n_threads) -> 0 on success
//     sig_out: n * 2 * L  float32  (real plane, imag plane per sample)
//     y_out:   n * 2 * C  float32
//   dl_prefetch(handle, idx, n, n_threads) -> 0: start an ASYNC gather
//     of the NEXT batch into an internal double buffer on a background
//     thread (overlaps host gather with device compute)
//   dl_wait(handle, sig_out, y_out) -> n: block for the prefetch and
//     copy it out (-1 if none pending)
//   dl_close(handle)
//
// Container layout (written by CSIDataset.save_raw):
//   [0:8)   magic "MMIMORAW"
//   [8:56)  6 little-endian int64: B, L, R, C, T, reserved
//   rx   : B*L*R complex64 (C-order), at offset 56
//   h_ls : B*C*T*R complex64, following rx
//
// Sample index contract (create_massiveMIMO_CSIest_dnn_dataset.py:62):
//   idx = p*(R*T) + r*T + t

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Handle {
  int fd = -1;
  size_t size = 0;
  const uint8_t* base = nullptr;
  int64_t B = 0, L = 0, R = 0, C = 0, T = 0;
  const float* rx = nullptr;    // interleaved complex64 => float pairs
  const float* h = nullptr;
  // async prefetch double buffer
  std::thread prefetcher;
  std::vector<float> pf_sig;
  std::vector<float> pf_y;
  int64_t pf_n = -1;            // -1: none pending
  int pf_status = 0;
};

constexpr char kMagic[8] = {'M', 'M', 'I', 'M', 'O', 'R', 'A', 'W'};

}  // namespace

extern "C" {

void* dl_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* p = static_cast<const uint8_t*>(base);
  if (st.st_size < 56 || memcmp(p, kMagic, 8) != 0) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle;
  h->fd = fd;
  h->size = st.st_size;
  h->base = p;
  const int64_t* dims = reinterpret_cast<const int64_t*>(p + 8);
  h->B = dims[0];
  h->L = dims[1];
  h->R = dims[2];
  h->C = dims[3];
  h->T = dims[4];
  size_t rx_elems = size_t(h->B) * h->L * h->R;
  size_t h_elems = size_t(h->B) * h->C * h->T * h->R;
  size_t need = 56 + (rx_elems + h_elems) * 8;
  if (size_t(st.st_size) < need) {
    munmap(base, st.st_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  h->rx = reinterpret_cast<const float*>(p + 56);
  h->h = h->rx + rx_elems * 2;
  return h;
}

int dl_meta(void* handle, int64_t* out) {
  if (!handle) return -1;
  auto* h = static_cast<Handle*>(handle);
  out[0] = h->B;
  out[1] = h->L;
  out[2] = h->R;
  out[3] = h->C;
  out[4] = h->T;
  out[5] = h->B * h->R * h->T;
  return 0;
}

// Gather one sample: de-interleave complex into (real plane, imag plane).
static void gather_one(const Handle* h, int64_t idx, float* sig_out,
                       float* y_out) {
  const int64_t per_pkt = h->R * h->T;
  const int64_t p = idx / per_pkt;
  const int64_t rem = idx % per_pkt;
  const int64_t r = rem / h->T;
  const int64_t t = rem % h->T;
  // rx[p, :, r]: stride over the R axis
  const float* rx = h->rx + (size_t(p) * h->L * h->R + r) * 2;
  float* sr = sig_out;
  float* si = sig_out + h->L;
  const int64_t stride = h->R * 2;
  for (int64_t i = 0; i < h->L; ++i) {
    sr[i] = rx[i * stride];
    si[i] = rx[i * stride + 1];
  }
  // h_ls[p, :, t, r]
  const float* hh =
      h->h + (size_t(p) * h->C * h->T * h->R + size_t(t) * h->R + r) * 2;
  float* yr = y_out;
  float* yi = y_out + h->C;
  const int64_t hstride = h->T * h->R * 2;
  for (int64_t i = 0; i < h->C; ++i) {
    yr[i] = hh[i * hstride];
    yi[i] = hh[i * hstride + 1];
  }
}

int dl_gather(void* handle, const int64_t* idx, int64_t n, float* sig_out,
              float* y_out, int n_threads) {
  if (!handle || n <= 0) return -1;
  auto* h = static_cast<Handle*>(handle);
  const int64_t total = h->B * h->R * h->T;
  for (int64_t i = 0; i < n; ++i) {
    if (idx[i] < 0 || idx[i] >= total) return -2;
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = int(n);
  const int64_t sig_stride = 2 * h->L;
  const int64_t y_stride = 2 * h->C;
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([=]() {
      for (int64_t i = w; i < n; i += n_threads) {
        gather_one(h, idx[i], sig_out + i * sig_stride,
                   y_out + i * y_stride);
      }
    });
  }
  for (auto& t : workers) t.join();
  return 0;
}

// Gather WHOLE PACKETS as plane tensors — the window-streaming IO path.
//
// Rationale (mirrors the reference's LTF hash-dedup,
// create_massiveMIMO_CSIest_dnn_dataset.py:52-67): a per-SAMPLE stream
// ships each (packet, rx-antenna) preamble T times per epoch (once per
// Tx sample) — a T-fold bandwidth blowup that makes larger-than-memory
// epochs infeasible over slow host→device links. Shipping packets once
// and expanding to samples on device (in-jit gather) moves exactly the
// corpus bytes per epoch.
//
//   sig_out: 2 * n * L * R float32  — planes of rx[pkts]   (2, n, L, R)
//   y_out:   2 * n * C * T * R f32  — planes of h_ls[pkts]  (2, n, C, T, R)
int dl_gather_packets(void* handle, const int64_t* pkts, int64_t n,
                      float* sig_out, float* y_out, int n_threads) {
  if (!handle || n <= 0) return -1;
  auto* h = static_cast<Handle*>(handle);
  for (int64_t i = 0; i < n; ++i) {
    if (pkts[i] < 0 || pkts[i] >= h->B) return -2;
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = int(n);
  const size_t rx_pkt = size_t(h->L) * h->R;        // complex elems/packet
  const size_t h_pkt = size_t(h->C) * h->T * h->R;
  const size_t sig_plane = size_t(n) * rx_pkt;      // floats per plane
  const size_t y_plane = size_t(n) * h_pkt;
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([=]() {
      for (int64_t i = w; i < n; i += n_threads) {
        const float* rx = h->rx + size_t(pkts[i]) * rx_pkt * 2;
        float* sr = sig_out + size_t(i) * rx_pkt;
        float* si = sig_out + sig_plane + size_t(i) * rx_pkt;
        for (size_t e = 0; e < rx_pkt; ++e) {
          sr[e] = rx[2 * e];
          si[e] = rx[2 * e + 1];
        }
        const float* hh = h->h + size_t(pkts[i]) * h_pkt * 2;
        float* yr = y_out + size_t(i) * h_pkt;
        float* yi = y_out + y_plane + size_t(i) * h_pkt;
        for (size_t e = 0; e < h_pkt; ++e) {
          yr[e] = hh[2 * e];
          yi[e] = hh[2 * e + 1];
        }
      }
    });
  }
  for (auto& t : workers) t.join();
  return 0;
}

// Start an async gather into the internal double buffer. One prefetch
// may be in flight per handle; callers alternate prefetch/wait to
// overlap the host-side gather of batch k+1 with device compute on
// batch k (the fit(host_stream=True) pipeline).
int dl_prefetch(void* handle, const int64_t* idx, int64_t n,
                int n_threads) {
  if (!handle || n <= 0) return -1;
  auto* h = static_cast<Handle*>(handle);
  if (h->pf_n >= 0) return -3;  // already pending: wait first
  const int64_t total = h->B * h->R * h->T;
  std::vector<int64_t> ids(idx, idx + n);
  for (int64_t i = 0; i < n; ++i) {
    if (ids[i] < 0 || ids[i] >= total) return -2;
  }
  h->pf_sig.resize(size_t(n) * 2 * h->L);
  h->pf_y.resize(size_t(n) * 2 * h->C);
  h->pf_n = n;
  h->pf_status = 0;
  float* sig_out = h->pf_sig.data();
  float* y_out = h->pf_y.data();
  h->prefetcher = std::thread([h, ids = std::move(ids), n, n_threads,
                               sig_out, y_out]() {
    h->pf_status =
        dl_gather(h, ids.data(), n, sig_out, y_out, n_threads);
  });
  return 0;
}

int64_t dl_wait(void* handle, float* sig_out, float* y_out) {
  if (!handle) return -1;
  auto* h = static_cast<Handle*>(handle);
  if (h->pf_n < 0) return -1;
  if (h->prefetcher.joinable()) h->prefetcher.join();
  const int64_t n = h->pf_n;
  h->pf_n = -1;
  if (h->pf_status != 0) return -2;
  memcpy(sig_out, h->pf_sig.data(), h->pf_sig.size() * sizeof(float));
  memcpy(y_out, h->pf_y.data(), h->pf_y.size() * sizeof(float));
  return n;
}

void dl_close(void* handle) {
  if (!handle) return;
  auto* h = static_cast<Handle*>(handle);
  if (h->prefetcher.joinable()) h->prefetcher.join();
  munmap(const_cast<uint8_t*>(h->base), h->size);
  ::close(h->fd);
  delete h;
}

}  // extern "C"
