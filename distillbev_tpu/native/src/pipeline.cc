// Native input-pipeline kernels (C++17, pthreads).
//
// The reference keeps its runtime-native code in CUDA ops; its *input*
// pipeline is pure python/numpy (reference:
// mmdet3d/datasets/pipelines/loading.py — LoadPointsFromMultiSweeps'
// per-sweep load/transform/concat loop:654-956 and the per-image
// normalize).  On TPU the accelerator-side ops are Pallas/XLA; the
// host-side feeding work is the part that deserves native treatment, so
// these kernels implement the loader hot paths: fused
// load+transform+filter+pad point-sweep aggregation and multi-threaded
// image normalization.  Exposed via a plain C ABI for ctypes.
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct SweepSpec {
  const char* path;      // .bin file of float32 rows [n, load_dim]
  float rot[9];          // sensor2lidar rotation (row major)
  float trans[3];        // sensor2lidar translation
  float time_lag;        // timestamp channel value
};

// Read one sweep file, transform into the key lidar frame, apply the
// remove-close filter, and append (x, y, z, extra..., time_lag) rows.
size_t load_one_sweep(const SweepSpec& s, int load_dim, const int* use_dim,
                      int n_use, float remove_close, float* out,
                      size_t out_stride, size_t max_rows) {
  FILE* f = fopen(s.path, "rb");
  if (!f) return 0;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  size_t n = static_cast<size_t>(bytes) / (sizeof(float) * load_dim);
  std::vector<float> buf(n * load_dim);
  size_t got = fread(buf.data(), sizeof(float), n * load_dim, f);
  fclose(f);
  n = got / load_dim;

  size_t written = 0;
  const bool identity =
      s.rot[0] == 1.f && s.rot[4] == 1.f && s.rot[8] == 1.f &&
      s.rot[1] == 0.f && s.rot[2] == 0.f && s.rot[3] == 0.f &&
      s.rot[5] == 0.f && s.rot[6] == 0.f && s.rot[7] == 0.f &&
      s.trans[0] == 0.f && s.trans[1] == 0.f && s.trans[2] == 0.f;
  for (size_t i = 0; i < n && written < max_rows; ++i) {
    const float* p = &buf[i * load_dim];
    float x = p[0], y = p[1], z = p[2];
    if (!identity) {
      // p' = R p + t  (sensor2lidar_rotation stored row-major; the
      // python path computes p @ R^T + t — identical math)
      float nx = s.rot[0] * x + s.rot[1] * y + s.rot[2] * z + s.trans[0];
      float ny = s.rot[3] * x + s.rot[4] * y + s.rot[5] * z + s.trans[1];
      float nz = s.rot[6] * x + s.rot[7] * y + s.rot[8] * z + s.trans[2];
      x = nx; y = ny; z = nz;
    }
    if (remove_close > 0.f &&
        std::fabs(p[0]) < remove_close && std::fabs(p[1]) < remove_close)
      continue;
    float* row = out + written * out_stride;
    row[0] = x; row[1] = y; row[2] = z;
    for (int d = 3; d < n_use; ++d) row[d] = p[use_dim[d]];
    row[n_use] = s.time_lag;
    ++written;
  }
  return written;
}

}  // namespace

extern "C" {

// Aggregate the key frame + sweeps into one padded [max_points, n_use+1]
// float buffer.  Returns the number of valid rows.
//
// paths: n_sweeps C strings; rots: [n_sweeps, 9]; trans: [n_sweeps, 3];
// time_lags: [n_sweeps].  Sweep 0 is the key frame (identity transform,
// lag 0 expected).  use_dim selects load_dim columns (first 3 must be
// xyz).  Multi-threaded across sweeps with per-sweep staging buffers.
int64_t aggregate_sweeps(const char** paths, const float* rots,
                         const float* trans, const float* time_lags,
                         int n_sweeps, int load_dim, const int* use_dim,
                         int n_use, float remove_close, float* out,
                         int64_t max_points) {
  const size_t stride = static_cast<size_t>(n_use) + 1;
  std::vector<std::vector<float>> staging(n_sweeps);
  std::vector<size_t> counts(n_sweeps, 0);

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = hw < 1 ? 1 : (hw > n_sweeps ? n_sweeps : hw);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n_sweeps;
         i = next.fetch_add(1)) {
      SweepSpec s;
      s.path = paths[i];
      std::memcpy(s.rot, rots + i * 9, 9 * sizeof(float));
      std::memcpy(s.trans, trans + i * 3, 3 * sizeof(float));
      s.time_lag = time_lags[i];
      staging[i].resize(static_cast<size_t>(max_points) * stride);
      counts[i] = load_one_sweep(s, load_dim, use_dim, n_use,
                                 remove_close, staging[i].data(), stride,
                                 static_cast<size_t>(max_points));
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  size_t total = 0;
  for (int i = 0; i < n_sweeps && total < (size_t)max_points; ++i) {
    size_t take = counts[i];
    if (total + take > (size_t)max_points)
      take = (size_t)max_points - total;
    std::memcpy(out + total * stride, staging[i].data(),
                take * stride * sizeof(float));
    total += take;
  }
  std::memset(out + total * stride, 0,
              ((size_t)max_points - total) * stride * sizeof(float));
  return static_cast<int64_t>(total);
}

// uint8 HWC images -> normalized float32, multi-threaded over images.
// imgs: [n, h, w, 3] uint8; out: [n, h, w, 3] float32;
// mean/std: [3] (pixel-value units when scale == 1, else 0-1 units with
// scale = 1/255).
void normalize_images(const uint8_t* imgs, float* out, int64_t n,
                      int64_t h, int64_t w, const float* mean,
                      const float* std_, float scale) {
  const float inv_std[3] = {1.f / std_[0], 1.f / std_[1], 1.f / std_[2]};
  const int64_t px_per_img = h * w;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = hw < 1 ? 1 : (hw > n ? (int)n : hw);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (int64_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      const uint8_t* src = imgs + i * px_per_img * 3;
      float* dst = out + i * px_per_img * 3;
      for (int64_t p = 0; p < px_per_img; ++p) {
        dst[p * 3 + 0] = (src[p * 3 + 0] * scale - mean[0]) * inv_std[0];
        dst[p * 3 + 1] = (src[p * 3 + 1] * scale - mean[1]) * inv_std[1];
        dst[p * 3 + 2] = (src[p * 3 + 2] * scale - mean[2]) * inv_std[2];
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// lidar points -> per-camera sparse min-depth maps at feature resolution
// (the python loop at datasets/pipelines/loading.py PointToMultiViewDepth
// costs ~0.35 s/sample at 6 cams x 300k points — numpy temporaries; this
// is one fused pass, threaded over cameras).
//
// points: [n, pt_stride] (xyz first); rots/intrins/post_rots: [n_cam, 9]
// row-major 3x3; trans/post_trans: [n_cam, 3]; out: [n_cam, h/ds, w/ds]
// zero-filled here (0 == no return, matching the python map).
void points_to_depth_maps(const float* points, int64_t n_pts,
                          int64_t pt_stride, const float* rots,
                          const float* trans, const float* intrins,
                          const float* post_rots,
                          const float* post_trans, int n_cam, int height,
                          int width, int downsample, float d_min,
                          float d_max, float* out) {
  const int fh = height / downsample, fw = width / downsample;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = hw < 1 ? 1 : (hw > n_cam ? n_cam : hw);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int c = next.fetch_add(1); c < n_cam; c = next.fetch_add(1)) {
      const float* R = rots + c * 9;        // cam2lidar rotation
      const float* t = trans + c * 3;
      const float* K = intrins + c * 9;
      const float* P = post_rots + c * 9;   // aug homography (2x2 used)
      const float* pt = post_trans + c * 3;
      float* map = out + (size_t)c * fh * fw;
      std::memset(map, 0, sizeof(float) * fh * fw);
      for (int64_t i = 0; i < n_pts; ++i) {
        const float* p = points + i * pt_stride;
        const float dx = p[0] - t[0], dy = p[1] - t[1], dz = p[2] - t[2];
        // python: (p - t) @ R  ->  p'_i = sum_j d_j R[j][i]
        const float z = R[2] * dx + R[5] * dy + R[8] * dz;
        if (z <= 0.f || z < d_min || z >= d_max) continue;
        const float x = R[0] * dx + R[3] * dy + R[6] * dz;
        const float y = R[1] * dx + R[4] * dy + R[7] * dz;
        const float inv = 1.f / (z > 1e-5f ? z : 1e-5f);
        float u = x * inv, v = y * inv;
        // uv @ K[:2,:2].T + K[:2,2]
        float ui = K[0] * u + K[1] * v + K[2];
        float vi = K[3] * u + K[4] * v + K[5];
        // uv @ P[:2,:2].T + pt[:2]
        const float ua = P[0] * ui + P[1] * vi + pt[0];
        const float va = P[3] * ui + P[4] * vi + pt[1];
        // nearbyint: round-half-even like np.round (lround would be
        // half-away-from-zero and disagree on exact .5 boundaries)
        const int cu = (int)std::nearbyint(ua / downsample);
        const int cv = (int)std::nearbyint(va / downsample);
        if (cu < 0 || cu >= fw || cv < 0 || cv >= fh) continue;
        float& cell = map[cv * fw + cu];
        if (cell == 0.f || z < cell) cell = z;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t2 = 0; t2 < n_threads; ++t2) threads.emplace_back(worker);
  for (auto& t2 : threads) t2.join();
}

// Range filter + pad: points [n, c] -> out [max_points, c]; returns kept.
int64_t range_filter_pad(const float* points, int64_t n, int64_t c,
                         const float* pcr /* [6] */, float* out,
                         int64_t max_points) {
  int64_t kept = 0;
  for (int64_t i = 0; i < n && kept < max_points; ++i) {
    const float* p = points + i * c;
    if (p[0] > pcr[0] && p[1] > pcr[1] && p[2] > pcr[2] &&
        p[0] < pcr[3] && p[1] < pcr[4] && p[2] < pcr[5]) {
      std::memcpy(out + kept * c, p, c * sizeof(float));
      ++kept;
    }
  }
  std::memset(out + kept * c, 0,
              (size_t)(max_points - kept) * c * sizeof(float));
  return kept;
}

}  // extern "C"
