// Native host-side BEV rasterizer — C++ twin of
// mv3d_tf_tpu/ops/bev.point_cloud_2_top_np (itself the faithful twin of
// the reference's tools/read_lidar.py:10-115 loop).
//
// Used for offline dataset preparation (tools/read_lidar.py CLI,
// synthetic dataset generation, lidar_bv cache builds), where the numpy
// per-slice fancy-indexing loop is the host bottleneck. The on-device
// path (ops/bev_pallas.py) is unrelated — this is the HOST twin.
//
// Exact-parity notes (tests/test_bev.py pins bit-equality):
//   * pixel coords use f32 division by f32(res) then int32 truncation
//     toward zero, matching numpy f32-array / python-float semantics;
//   * slice boundaries accumulate in f64 (numpy arange semantics);
//   * last-write-wins in file order per slice, channel 8 (reflectance)
//     overwritten per slice loop iteration — the winner is the last
//     point of the highest-indexed slice touching the cell.
//
// Plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Grid {
  float res, zres;
  float x_min, x_max;   // fwd range (0, 60)
  float y_abs;          // side half-range (30)
  double h_min, h_max;  // height range (-2, 0.4)
  int32_t H, W, C;      // 601, 601, 9
  int32_t n_slices;     // 8
  int32_t x_shift, y_shift;  // +300, +600
};

inline void raster_one(const float* pts, int64_t n, const Grid& g,
                       float* out) {
  // out: H*W*C float32, caller-zeroed.
  //
  // One bucketing pass (slice index resolved arithmetically, verified
  // against the f64 arange band bounds so boundary points land exactly
  // where numpy's `z >= h0 && z < h1` comparisons put them), then
  // slice-major writes — the write ORDER must be slice-major/file-order
  // to reproduce the reference's channel-8 winner (last point of the
  // highest-indexed slice touching the cell).
  const int64_t rowc = static_cast<int64_t>(g.W) * g.C;
  std::vector<std::vector<int64_t>> buckets(
      static_cast<size_t>(g.n_slices));
  for (auto& b : buckets) b.reserve(static_cast<size_t>(n / 8));

  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 4 + 0];
    const float y = pts[i * 4 + 1];
    if (!(x > g.x_min && x < g.x_max && y > -g.y_abs && y < g.y_abs))
      continue;
    const double zd = static_cast<double>(pts[i * 4 + 2]);
    int32_t s = static_cast<int32_t>((zd - g.h_min) / g.zres);
    if (s < 0) s = 0;
    if (s > g.n_slices - 1) s = g.n_slices - 1;
    bool found = false;
    for (int32_t d = 0; d < 3 && !found; ++d) {
      const int32_t c = s + (d == 0 ? 0 : (d == 1 ? -1 : 1));
      if (c < 0 || c >= g.n_slices) continue;
      const double h0 = g.h_min + static_cast<double>(c) * g.zres;
      if (zd >= h0 && zd < h0 + g.zres) {
        buckets[static_cast<size_t>(c)].push_back(i);
        found = true;
      }
    }
  }

  for (int32_t s = 0; s < g.n_slices; ++s) {
    for (const int64_t i : buckets[static_cast<size_t>(s)]) {
      const float x = pts[i * 4 + 0];
      const float y = pts[i * 4 + 1];
      const float z = pts[i * 4 + 2];
      const float r = pts[i * 4 + 3];
      const int32_t xi = static_cast<int32_t>(-y / g.res) + g.x_shift;
      const int32_t yi = static_cast<int32_t>(-x / g.res) + g.y_shift;
      if (xi < 0 || xi >= g.W || yi < 0 || yi >= g.H) continue;
      float* cell = out + yi * rowc + static_cast<int64_t>(xi) * g.C;
      // f32 arithmetic on purpose: numpy computes zi - height_range[0]
      // in f32 (value-based casting), and f64-then-round can double-round
      cell[s] = z - static_cast<float>(g.h_min);
      cell[g.C - 1] = r;
    }
  }
}

}  // namespace

extern "C" {

// Rasterize one in-memory point cloud (n x 4 f32) into out (H*W*C f32,
// zero-initialized by the caller).
void bev_raster(const float* pts, int64_t n, float res, float zres,
                float x_min, float x_max, float y_abs, double h_min,
                double h_max, int32_t H, int32_t W, int32_t C,
                int32_t n_slices, int32_t x_shift, int32_t y_shift,
                float* out) {
  Grid g{res, zres, x_min, x_max, y_abs, h_min, h_max,
         H, W, C, n_slices, x_shift, y_shift};
  raster_one(pts, n, g, out);
}

// Read many velodyne .bin files and rasterize each, with a thread pool.
// paths: NUL-separated; out: n_files*H*W*C f32 (caller-zeroed);
// counts[i] = points read, or -1 on IO error.
void bev_raster_files(const char* paths, int64_t n_files, float res,
                      float zres, float x_min, float x_max, float y_abs,
                      double h_min, double h_max, int32_t H, int32_t W,
                      int32_t C, int32_t n_slices, int32_t x_shift,
                      int32_t y_shift, float* out, int64_t* counts,
                      int64_t n_threads) {
  std::vector<const char*> files;
  const char* p = paths;
  for (int64_t i = 0; i < n_files; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  Grid g{res, zres, x_min, x_max, y_abs, h_min, h_max,
         H, W, C, n_slices, x_shift, y_shift};
  const int64_t frame = static_cast<int64_t>(H) * W * C;

  auto work = [&](int64_t t) {
    std::vector<float> buf;
    for (int64_t i = t; i < n_files; i += n_threads) {
      FILE* f = std::fopen(files[i], "rb");
      if (f == nullptr) { counts[i] = -1; continue; }
      std::fseek(f, 0, SEEK_END);
      const long bytes = std::ftell(f);
      std::fseek(f, 0, SEEK_SET);
      const int64_t n = bytes / (4 * sizeof(float));
      buf.resize(static_cast<size_t>(n) * 4);
      const int64_t got = static_cast<int64_t>(
          std::fread(buf.data(), 4 * sizeof(float), n, f));
      std::fclose(f);
      if (got != n) { counts[i] = -1; continue; }
      counts[i] = n;
      raster_one(buf.data(), n, g, out + i * frame);
    }
  };
  std::vector<std::thread> threads;
  const int64_t nt = n_threads > 0 ? n_threads : 1;
  for (int64_t t = 0; t < nt; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
}

}  // extern "C"
