// Native host-runtime components for orb_slam_fusion_tpu.
//
// The TPU compute path is JAX/XLA; these are the host-side pieces where the
// reference also uses native code and Python is measurably slow:
//
//  * landmark grouping for the Schur complement (replaces the per-factor
//    Python loop in solver/ba.py::build_landmark_groups — runs on every
//    local-BA problem build, ~10k factors each)
//  * EuRoC dataset parsing (replaces tests/slam_euroc_si.cc LoadImages /
//    LoadIMU: camera timestamp CSVs and IMU measurement CSVs)
//  * covisibility accumulation from observation tables (host-side
//    incremental alternative to the device matmul for very large maps)
//
// Exposed as a plain C ABI consumed through ctypes (pybind11 is not
// available in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// Landmark grouping: for each landmark, the (padded) list of factor rows
// observing it. mp_idx[f] in [0, M); valid[f] in {0,1}. Outputs:
//   idx  (M*O) int32, mask (M*O) uint8
// Returns the maximum observation count seen (for max_obs sizing).
// ---------------------------------------------------------------------------
int32_t osf_build_landmark_groups(
    const int32_t* mp_idx, const uint8_t* valid, int64_t n_factors,
    int32_t num_points, int32_t max_obs,
    int32_t* out_idx, uint8_t* out_mask) {
  std::memset(out_mask, 0, (size_t)num_points * max_obs);
  std::memset(out_idx, 0, (size_t)num_points * max_obs * sizeof(int32_t));
  int32_t* cursor = (int32_t*)std::calloc(num_points, sizeof(int32_t));
  int32_t max_seen = 0;
  for (int64_t f = 0; f < n_factors; ++f) {
    if (!valid[f]) continue;
    int32_t l = mp_idx[f];
    if (l < 0 || l >= num_points) continue;
    int32_t c = cursor[l];
    if (c < max_obs) {
      out_idx[(int64_t)l * max_obs + c] = (int32_t)f;
      out_mask[(int64_t)l * max_obs + c] = 1;
    }
    cursor[l] = c + 1;
    if (cursor[l] > max_seen) max_seen = cursor[l];
  }
  std::free(cursor);
  return max_seen;
}

// ---------------------------------------------------------------------------
// Covisibility accumulation: given per-keyframe observation rows
// obs (K*F) int32 (-1 = none), count shared landmarks for every KF pair.
// Output W (K*K) int32. O(total_obs^2 / M) via per-landmark buckets.
// ---------------------------------------------------------------------------
void osf_covisibility(const int32_t* obs, int32_t K, int32_t F,
                      int32_t num_points, int32_t* W) {
  std::memset(W, 0, (size_t)K * K * sizeof(int32_t));
  // landmark -> list of KFs observing it (deduplicated per KF)
  const int32_t kMaxObs = 64;
  int32_t* owners = (int32_t*)std::malloc(
      (size_t)num_points * kMaxObs * sizeof(int32_t));
  int32_t* counts = (int32_t*)std::calloc(num_points, sizeof(int32_t));
  for (int32_t k = 0; k < K; ++k) {
    for (int32_t f = 0; f < F; ++f) {
      int32_t l = obs[(int64_t)k * F + f];
      if (l < 0 || l >= num_points) continue;
      int32_t c = counts[l];
      if (c > 0 && owners[(int64_t)l * kMaxObs + c - 1] == k) continue;
      if (c < kMaxObs) {
        owners[(int64_t)l * kMaxObs + c] = k;
        counts[l] = c + 1;
      }
    }
  }
  for (int32_t l = 0; l < num_points; ++l) {
    int32_t c = counts[l];
    for (int32_t a = 0; a < c; ++a)
      for (int32_t b = a + 1; b < c; ++b) {
        int32_t ka = owners[(int64_t)l * kMaxObs + a];
        int32_t kb = owners[(int64_t)l * kMaxObs + b];
        W[(int64_t)ka * K + kb] += 1;
        W[(int64_t)kb * K + ka] += 1;
      }
  }
  std::free(owners);
  std::free(counts);
}

// ---------------------------------------------------------------------------
// EuRoC CSV parsing.
//   cam data.csv lines:  timestamp_ns,filename.png
//   imu data.csv lines:  timestamp_ns,wx,wy,wz,ax,ay,az
// Two-pass API: first call with out=NULL to get the row count.
// ---------------------------------------------------------------------------
int64_t osf_parse_euroc_imu(const char* path, double* out_t,
                            float* out_gyro, float* out_acc,
                            int64_t capacity) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return -1;
  char line[512];
  int64_t n = 0;
  while (std::fgets(line, sizeof(line), fp)) {
    if (line[0] == '#' || line[0] == '\n') continue;
    long long ts;
    double w[3], a[3];
    if (std::sscanf(line, "%lld,%lf,%lf,%lf,%lf,%lf,%lf", &ts, &w[0], &w[1],
                    &w[2], &a[0], &a[1], &a[2]) == 7) {
      if (out_t != nullptr) {
        if (n >= capacity) break;
        out_t[n] = (double)ts * 1e-9;
        for (int i = 0; i < 3; ++i) {
          out_gyro[n * 3 + i] = (float)w[i];
          out_acc[n * 3 + i] = (float)a[i];
        }
      }
      ++n;
    }
  }
  std::fclose(fp);
  return n;
}

int64_t osf_parse_euroc_cam(const char* path, double* out_t,
                            char* out_names, int32_t name_stride,
                            int64_t capacity) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return -1;
  char line[512];
  int64_t n = 0;
  while (std::fgets(line, sizeof(line), fp)) {
    if (line[0] == '#' || line[0] == '\n') continue;
    long long ts;
    char name[256];
    if (std::sscanf(line, "%lld,%255[^,\r\n]", &ts, name) == 2) {
      if (out_t != nullptr) {
        if (n >= capacity) break;
        out_t[n] = (double)ts * 1e-9;
        std::strncpy(out_names + (int64_t)n * name_stride, name,
                     name_stride - 1);
        out_names[(int64_t)n * name_stride + name_stride - 1] = 0;
      }
      ++n;
    }
  }
  std::fclose(fp);
  return n;
}

// ---------------------------------------------------------------------------
// DBoW2 text vocabulary parsing (reference: TemplatedVocabulary.h
// loadFromTextFile:1248). Header "k L scoring weighting"; per node:
// "parent is_leaf b0..b31 weight". ORBvoc.txt is ~1.1M lines / 145 MB —
// Python-side parsing takes minutes, this sweep takes well under a second.
// Two-pass API: out_parent==NULL -> returns node count and fills header[4]
// with {k, L, scoring, weighting}.
// ---------------------------------------------------------------------------
int64_t osf_parse_dbow2_text(const char* path, int32_t* header,
                             int32_t* out_parent, uint8_t* out_is_leaf,
                             uint8_t* out_desc, float* out_weight,
                             int64_t capacity) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return -1;
  char line[2048];
  if (!std::fgets(line, sizeof(line), fp)) {
    std::fclose(fp);
    return -1;
  }
  int k = 0, L = 0, scoring = 0, weighting = 0;
  if (std::sscanf(line, "%d %d %d %d", &k, &L, &scoring, &weighting) < 2) {
    std::fclose(fp);
    return -1;
  }
  if (header) {
    header[0] = k;
    header[1] = L;
    header[2] = scoring;
    header[3] = weighting;
  }
  int64_t n = 0;
  while (std::fgets(line, sizeof(line), fp)) {
    char* p = line;
    char* end;
    long parent = std::strtol(p, &end, 10);
    if (end == p) continue;  // blank line
    p = end;
    long is_leaf = std::strtol(p, &end, 10);
    p = end;
    uint8_t d[32];
    bool ok = true;
    for (int i = 0; i < 32; ++i) {
      long b = std::strtol(p, &end, 10);
      if (end == p) { ok = false; break; }
      d[i] = (uint8_t)b;
      p = end;
    }
    if (!ok) continue;
    double w = std::strtod(p, &end);
    if (out_parent != nullptr) {
      if (n >= capacity) break;
      out_parent[n] = (int32_t)parent;
      out_is_leaf[n] = (uint8_t)(is_leaf > 0);
      std::memcpy(out_desc + n * 32, d, 32);
      out_weight[n] = (float)w;
    }
    ++n;
  }
  std::fclose(fp);
  return n;
}

// ---------------------------------------------------------------------------
// Timestamp association: for each query time, the index of the nearest
// reference time within max_dt (else -1). Both arrays sorted ascending.
// Replaces evaluation/associate.py's O(N*M) matching with a linear sweep.
// ---------------------------------------------------------------------------
void osf_associate(const double* query, int64_t nq, const double* ref,
                   int64_t nr, double max_dt, int64_t* out_idx) {
  int64_t j = 0;
  for (int64_t i = 0; i < nq; ++i) {
    while (j + 1 < nr && ref[j + 1] <= query[i]) ++j;
    int64_t best = j;
    if (j + 1 < nr &&
        (ref[j + 1] - query[i]) < (query[i] - ref[j]))
      best = j + 1;
    out_idx[i] = (nr > 0 &&
                  (query[i] - ref[best] <= max_dt) &&
                  (ref[best] - query[i] <= max_dt))
                     ? best
                     : -1;
  }
}

}  // extern "C"
