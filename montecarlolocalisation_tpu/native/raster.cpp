// Native occupancy rasterizer — createOccupancyGrid semantics.
//
// The reference rasterizes the wall grid in C++ (publish_map_rviz.cpp:
// 306-437); this mirrors those drawing rules exactly over the dense wall
// tensor (see maps/raster.py for the rule-by-rule documentation; the
// Python implementation doubles as the parity oracle):
//   top:    row r0,        cols c0..c0+8 inclusive
//   left:   rows r0..r0+8 inclusive, col c0
//   right:  last column of the row only: rows r0..r0+7, col c0+8
//   bottom: last row, or next row shorter than this column:
//           row r0+8, cols c0+1..c0+8
//   ragged: missing cells vs the widest row fill rows r0..r0+7,
//           cols c0..c0+8.
#include <cstdint>
#include <cstring>

namespace {
constexpr int R = 0, T = 1, L = 2, B = 3;  // Cell.msg wall codes
}

extern "C" {

// walls: [rows*max_cols*4] uint8 (1 = wall listed).  row_lengths: [rows]
// actual cell counts per row (<= max_cols).  out: [H*W] uint8 with
// H = rows*cell_px+1, W = max_cols*cell_px+1, preset to free_value.
int32_t mcl_rasterize(const uint8_t* walls, const int32_t* row_lengths,
                      int32_t rows, int32_t max_cols, int32_t cell_px,
                      uint8_t occupied_value, uint8_t* out) {
  if (rows <= 0 || max_cols <= 0 || cell_px <= 0) return -1;
  const int32_t width = max_cols * cell_px + 1;
  const int32_t cs = cell_px;
  auto wall = [&](int32_t r, int32_t c, int32_t d) -> bool {
    return walls[((size_t)r * max_cols + c) * 4 + d] != 0;
  };
  auto set = [&](int32_t pr, int32_t pc) {
    out[(size_t)pr * width + pc] = occupied_value;
  };
  for (int32_t cy = 0; cy < rows; ++cy) {
    const int32_t row_width = row_lengths[cy];
    for (int32_t cx = 0; cx < row_width; ++cx) {
      const int32_t r0 = cy * cs, c0 = cx * cs;
      if (wall(cy, cx, T))
        for (int32_t d = 0; d <= cs; ++d) set(r0, c0 + d);
      if (wall(cy, cx, L))
        for (int32_t d = 0; d <= cs; ++d) set(r0 + d, c0);
      if (wall(cy, cx, R) && cx == row_width - 1)
        for (int32_t d = 0; d < cs; ++d) set(r0 + d, c0 + cs);
      if (wall(cy, cx, B)) {
        const bool last_row = cy == rows - 1;
        const bool next_shorter =
            cy + 1 < rows && !(cx < row_lengths[cy + 1]);
        if (last_row || next_shorter)
          for (int32_t d = 0; d < cs; ++d) set(r0 + cs, c0 + 1 + d);
      }
    }
    for (int32_t px = row_width; px < max_cols; ++px) {
      const int32_t r0 = cy * cs, c0 = px * cs;
      for (int32_t dy = 0; dy < cs; ++dy)
        for (int32_t dx = 0; dx <= cs; ++dx) set(r0 + dy, c0 + dx);
    }
  }
  return 0;
}

}  // extern "C"
