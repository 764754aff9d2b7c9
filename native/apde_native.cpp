#include <functional>
// Native host runtime for apde_mvs_tpu — the C++ counterpart of the
// reference's host layer (fusion consistency loops, visibility filter,
// binary mat / PLY I/O; reference: APD.cpp:962-1608).
//
// Exposed as a plain C ABI consumed via ctypes; the Python layer falls back
// to vectorized numpy when the shared library is absent.
//
// Build: make -C native   (produces libapde_native.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Cam {
  // row-major K[9], R[9], t[3], c[3]
  const float* K;
  const float* R;
  const float* t;
  const float* c;
};

inline void backproject_world(const Cam& cam, float x, float y, float depth,
                              float out[3]) {
  const float px = depth * (x - cam.K[2]) / cam.K[0];
  const float py = depth * (y - cam.K[5]) / cam.K[4];
  const float pz = depth;
  out[0] = cam.R[0] * px + cam.R[3] * py + cam.R[6] * pz + cam.c[0];
  out[1] = cam.R[1] * px + cam.R[4] * py + cam.R[7] * pz + cam.c[1];
  out[2] = cam.R[2] * px + cam.R[5] * py + cam.R[8] * pz + cam.c[2];
}

inline void project(const Cam& cam, const float X[3], float* x, float* y,
                    float* depth) {
  const float cx = X[0] - cam.c[0];
  const float cy = X[1] - cam.c[1];
  const float cz = X[2] - cam.c[2];
  const float vx = cam.R[0] * cx + cam.R[1] * cy + cam.R[2] * cz;
  const float vy = cam.R[3] * cx + cam.R[4] * cy + cam.R[5] * cz;
  const float vz = cam.R[6] * cx + cam.R[7] * cy + cam.R[8] * cz;
  *depth = vz;
  *x = (cam.K[0] * vx + cam.K[2] * vz) / vz;
  *y = (cam.K[4] * vy + cam.K[5] * vz) / vz;
}

inline float angle_between(const float* a, const float* b) {
  const float dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
  const float na = std::sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2]);
  const float nb = std::sqrt(b[0] * b[0] + b[1] * b[1] + b[2] * b[2]);
  float v = dot / (na * nb > 1e-12f ? na * nb : 1e-12f);
  v = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
  const float ang = std::acos(v);
  return std::isfinite(ang) ? ang : 0.0f;
}

void parallel_for(int n, const std::function<void(int)>& fn) {
  const int num_threads =
      std::max(1u, std::min(std::thread::hardware_concurrency(), (unsigned)n));
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Per-(ref, src) neighbor geometry for fusion (reference inner loop,
// APD.cpp:1166-1196): for every ref pixel, project its world point into the
// src view, fetch the src surface, reproject, and emit the consistency
// measures. Outputs are full-resolution maps.
void fusion_neighbor_geometry(
    int h, int w, int sh, int sw,
    const float* ref_K, const float* ref_R, const float* ref_t,
    const float* ref_c, const float* src_K, const float* src_R,
    const float* src_t, const float* src_c,
    const float* ref_depth,            // (h, w)
    const float* ref_normal,           // (h, w, 3)
    const float* src_depth,            // (sh, sw)
    const float* src_normal,           // (sh, sw, 3)
    const uint8_t* src_mask,           // (sh, sw) consumed flags
    uint8_t* usable,                   // out (h, w)
    float* reproj,                     // out (h, w)
    float* rel_depth,                  // out (h, w)
    float* angle,                      // out (h, w)
    int32_t* src_rc                    // out (h, w, 2) row, col
) {
  Cam ref{ref_K, ref_R, ref_t, ref_c};
  Cam src{src_K, src_R, src_t, src_c};
  parallel_for(h, [&](int r) {
    for (int cix = 0; cix < w; ++cix) {
      const int i = r * w + cix;
      usable[i] = 0;
      reproj[i] = 1e30f;
      rel_depth[i] = 1e30f;
      angle[i] = 1e30f;
      src_rc[2 * i] = -1;
      src_rc[2 * i + 1] = -1;
      const float d = ref_depth[i];
      if (d <= 0.f) continue;
      float X[3];
      backproject_world(ref, (float)cix, (float)r, d, X);
      float px, py, pd;
      project(src, X, &px, &py, &pd);
      const int sr = (int)std::floor(py + 0.5f);
      const int sc = (int)std::floor(px + 0.5f);
      if (sc < 0 || sc >= sw || sr < 0 || sr >= sh) continue;
      const int si = sr * sw + sc;
      if (src_mask[si]) continue;
      const float sd = src_depth[si];
      if (sd <= 0.f) continue;
      float Xs[3];
      backproject_world(src, (float)sc, (float)sr, sd, Xs);
      float bx, by, bd;
      project(ref, Xs, &bx, &by, &bd);
      const float dx = (float)cix - bx;
      const float dy = (float)r - by;
      usable[i] = 1;
      reproj[i] = std::sqrt(dx * dx + dy * dy);
      rel_depth[i] = std::fabs(bd - d) / (d > 1e-12f ? d : 1e-12f);
      angle[i] = angle_between(&ref_normal[3 * i], &src_normal[3 * si]);
      src_rc[2 * i] = sr;
      src_rc[2 * i + 1] = sc;
    }
  });
}

// Visibility-conflict accumulation for one (ref, src) pair (reference:
// WeakVisFilter, APD.cpp:976-1018): counts strong/weak occlusions of each
// weak ref pixel.
void weak_vis_accumulate(
    int h, int w, int sh, int sw,
    const float* ref_K, const float* ref_R, const float* ref_t,
    const float* ref_c, const float* src_K, const float* src_R,
    const float* src_t, const float* src_c,
    const float* ref_depth, const uint8_t* ref_weak,
    const uint8_t* ref_conf, const float* src_depth,
    const uint8_t* src_weak, const uint8_t* src_conf,
    float max_baseline_deg, float depth_margin,
    int32_t* strong_occ, int32_t* weak_occ) {
  Cam ref{ref_K, ref_R, ref_t, ref_c};
  Cam src{src_K, src_R, src_t, src_c};
  const float max_rad = max_baseline_deg * (float)M_PI / 180.f;
  parallel_for(h, [&](int r) {
    for (int cix = 0; cix < w; ++cix) {
      const int i = r * w + cix;
      if (ref_weak[i] != 0) continue;  // WEAK == 0
      const float d = ref_depth[i];
      float X[3];
      backproject_world(ref, (float)cix, (float)r, d, X);
      float a[3] = {ref.c[0] - X[0], ref.c[1] - X[1], ref.c[2] - X[2]};
      float b[3] = {src.c[0] - X[0], src.c[1] - X[1], src.c[2] - X[2]};
      if (angle_between(a, b) > max_rad) continue;
      float px, py, pd;
      project(src, X, &px, &py, &pd);
      if (pd <= 0.f) continue;
      const int sr = (int)(py + 0.5f);
      const int sc = (int)(px + 0.5f);
      if (sc < 0 || sc >= sw || sr < 0 || sr >= sh) continue;
      const int si = sr * sw + sc;
      const float sd = src_depth[si];
      if (pd < sd - depth_margin * sd) {
        if (src_weak[si] == 1) {  // STRONG
          strong_occ[i] += 1;
        } else if (src_weak[si] == 0 && src_conf[si] < ref_conf[i]) {
          weak_occ[i] += 1;
        }
      }
    }
  });
}

// Binary little-endian PLY writer (reference: ExportPointCloud,
// APD.cpp:316-356).
int write_ply(const char* path, int64_t n, const float* xyz,
              const uint8_t* bgr) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "ply\nformat binary_little_endian 1.0\n");
  std::fprintf(f, "element vertex %lld\n", (long long)n);
  std::fprintf(f, "property float x\nproperty float y\nproperty float z\n");
  if (bgr)
    std::fprintf(f,
                 "property uchar blue\nproperty uchar green\nproperty uchar "
                 "red\n");
  std::fprintf(f, "end_header\n");
  if (!bgr) {
    std::fwrite(xyz, sizeof(float), 3 * n, f);
  } else {
    for (int64_t i = 0; i < n; ++i) {
      std::fwrite(xyz + 3 * i, sizeof(float), 3, f);
      std::fwrite(bgr + 3 * i, 1, 3, f);
    }
  }
  std::fclose(f);
  return 0;
}

// Bin-mat codec (reference: APD.cpp:18-83): version, rows, cols, cv type,
// raw bytes.
int write_bin_mat(const char* path, int rows, int cols, int cv_type,
                  const void* data, int64_t nbytes) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int header[4] = {1, rows, cols, cv_type};
  std::fwrite(header, sizeof(int), 4, f);
  std::fwrite(data, 1, nbytes, f);
  std::fclose(f);
  return 0;
}

int read_bin_mat_header(const char* path, int* rows, int* cols,
                        int* cv_type) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int header[4];
  if (std::fread(header, sizeof(int), 4, f) != 4 || header[0] != 1) {
    std::fclose(f);
    return -2;
  }
  *rows = header[1];
  *cols = header[2];
  *cv_type = header[3];
  std::fclose(f);
  return 0;
}

int read_bin_mat_data(const char* path, void* out, int64_t nbytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 16, SEEK_SET);
  const size_t got = std::fread(out, 1, nbytes, f);
  std::fclose(f);
  return got == (size_t)nbytes ? 0 : -2;
}

}  // extern "C"
