// Native scan-filter / replay-log preprocessor.
//
// The reference performs its scan filtering inline in C++
// (filterLaserReadings monte_carlo.cpp:254-278 + filterAngles :610-620 +
// the every-20th subsample :650).  Batch episode preprocessing is the
// framework's host-side data-loader hot path, so it stays native too:
// process a whole [T, R] raw range log into fixed-width [T, B] beam tables
// in one call (ctypes ABI; numpy fallback in models/sensor.filter_scan).
#include <cmath>
#include <cstdint>

namespace {
inline bool finite(float v) { return std::isfinite(v); }
}

extern "C" {

// Filter ONE scan.  Writes up to max_beams (angle, radius) pairs; returns
// the number of beams produced.
//   ranges[n]:  raw radii; NaN/Inf -> invalid_range replacement, kept;
//               finite out-of-[range_min,range_max] -> dropped.
//   crop_deg:   keep beams with angle strictly inside (-crop, +crop) deg.
//   skip:       keep every skip-th surviving beam.
int32_t mcl_filter_scan(const float* ranges, int32_t n, float angle_min,
                        float angle_increment, float range_min,
                        float range_max, float invalid_range,
                        float crop_deg, int32_t skip, float* out_angles,
                        float* out_radii, int32_t max_beams) {
  const double rad2deg = 180.0 / M_PI;
  int32_t kept = 0;   // index among beams surviving filter+crop
  int32_t out = 0;
  for (int32_t i = 0; i < n; ++i) {
    const float r = ranges[i];
    const float a = angle_min + i * angle_increment;
    float radius;
    if (!finite(r)) {
      radius = invalid_range;
    } else if (r >= range_min && r <= range_max) {
      radius = r;
    } else {
      continue;  // finite out-of-range: dropped (shifts the subsample)
    }
    const double deg = a * rad2deg;
    if (!(deg > -crop_deg && deg < crop_deg)) continue;
    if (kept % skip == 0 && out < max_beams) {
      out_angles[out] = a;
      out_radii[out] = radius;
      ++out;
    }
    ++kept;
  }
  return out;
}

// Filter a [T, n] episode log into fixed [T, max_beams] tables + masks.
// Returns the maximum beam count seen (useful to size max_beams).
int32_t mcl_filter_episode(const float* ranges, int32_t t, int32_t n,
                           float angle_min, float angle_increment,
                           float range_min, float range_max,
                           float invalid_range, float crop_deg,
                           int32_t skip, float* out_angles,
                           float* out_radii, uint8_t* out_mask,
                           int32_t max_beams) {
  int32_t max_seen = 0;
  for (int32_t k = 0; k < t; ++k) {
    float* oa = out_angles + (size_t)k * max_beams;
    float* orr = out_radii + (size_t)k * max_beams;
    uint8_t* om = out_mask + (size_t)k * max_beams;
    const int32_t b = mcl_filter_scan(
        ranges + (size_t)k * n, n, angle_min, angle_increment, range_min,
        range_max, invalid_range, crop_deg, skip, oa, orr, max_beams);
    for (int32_t j = 0; j < max_beams; ++j) om[j] = j < b ? 1 : 0;
    for (int32_t j = b; j < max_beams; ++j) {
      oa[j] = 0.0f;
      orr[j] = 0.0f;
    }
    if (b > max_seen) max_seen = b;
  }
  return max_seen;
}

}  // extern "C"
