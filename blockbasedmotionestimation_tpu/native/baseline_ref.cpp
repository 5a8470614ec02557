// Single-threaded portable C++ replica of the reference pipeline, used ONLY
// to measure a grounded benchmark denominator (s/field at the bench
// workload).  The reference binary is Windows/MSVC+OpenCV and cannot run in
// this environment; this program re-implements the same algorithm from the
// semantics encoded in models/oracle.py (which cites every reference
// behavior to motion_framework.cpp line numbers):
//
//   * padding search + zero padding        (motion_framework.cpp:14-61)
//   * 5-tap Gaussian pyrDown, reflect-101  (:86-106, cv::pyrDown)
//   * spiral SAD search, strict-< updates  (:296-422)
//   * fast_array SAD cache                 (:77-78, 594-602)
//   * 9-border-case Gauss-Seidel sweeps    (:424-530)
//   * energy = SAD + lam*mult*smoothness   (:607, float32 arithmetic)
//   * progressive subdivision + densify    (:141-152, 845-862, 815-826)
//
// Workload = bench.py's: one 1080x1920 frame pair, 4 levels, 32px blocks,
// 64px search, interp 1.  Build: g++ -O3 (auto-vectorized inner SAD loops, a
// reasonable stand-in for OpenCV's SIMD cv::norm).  Output: one JSON line
// {"s_per_field": ..., "fields_per_sec": ...}.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <chrono>
#include <vector>
#include <limits>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> d;
  Image() = default;
  Image(int h_, int w_) : h(h_), w(w_), d((size_t)h_ * w_) {}
  uint8_t at(int y, int x) const { return d[(size_t)y * w + x]; }
  uint8_t* row(int y) { return d.data() + (size_t)y * w; }
  const uint8_t* row(int y) const { return d.data() + (size_t)y * w; }
};

struct Flow {
  int h = 0, w = 0;
  std::vector<float> d;  // interleaved u,v
  Flow() = default;
  Flow(int h_, int w_) : h(h_), w(w_), d((size_t)h_ * w_ * 2, 0.0f) {}
  float* at(int y, int x) { return d.data() + 2 * ((size_t)y * w + x); }
};

// fast_array entry: most recent (match_x, match_y, SAD, bs) per block origin
struct CacheEntry {
  int32_t x = 0, y = 0, sad = 0, bs = 0;
};

int64_t sad_u8(const Image& a, const Image& b, int y1, int x1, int y2, int x2,
               int bs) {
  int64_t s = 0;
  for (int r = 0; r < bs; ++r) {
    const uint8_t* pa = a.row(y1 + r) + x1;
    const uint8_t* pb = b.row(y2 + r) + x2;
    int32_t acc = 0;
    for (int c = 0; c < bs; ++c) acc += std::abs((int)pa[c] - (int)pb[c]);
    s += acc;
  }
  return s;
}

int reflect101(int i, int n) {
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
  }
  return i;
}

// cv::pyrDown: separable (1,4,6,4,1)/16 Gaussian + even-index decimation
Image pyr_down(const Image& src) {
  static const int k[5] = {1, 4, 6, 4, 1};
  Image dst(src.h / 2, src.w / 2);
  std::vector<int32_t> tmp((size_t)src.h * dst.w);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* r = src.row(y);
    for (int x = 0; x < dst.w; ++x) {
      int32_t acc = 0;
      for (int t = -2; t <= 2; ++t)
        acc += k[t + 2] * r[reflect101(2 * x + t, src.w)];
      tmp[(size_t)y * dst.w + x] = acc;
    }
  }
  for (int y = 0; y < dst.h; ++y) {
    for (int x = 0; x < dst.w; ++x) {
      int32_t acc = 0;
      for (int t = -2; t <= 2; ++t)
        acc += k[t + 2] * tmp[(size_t)reflect101(2 * y + t, src.h) * dst.w + x];
      dst.row(y)[x] = (uint8_t)((acc + 128) >> 8);
    }
  }
  return dst;
}

// spiral search (motion_framework.cpp:296-422)
void spiral_search(const Image& im1, const Image& im2, int y1, int x1, int y2,
                   int x2, int bs, int ss, int* out_y, int* out_x,
                   int64_t* out_sad) {
  const int shift = ss - bs;
  const int h = im1.h, w = im1.w;
  if (x2 < 0 || y2 < 0 || x2 + bs > w || y2 + bs > h) {
    *out_y = y1;
    *out_x = x1;
    *out_sad = sad_u8(im1, im2, y1, x1, y1, x1, bs);  // zero-MV early-out
    return;
  }
  int min_x = x2, min_y = y2;
  int64_t sad_min = sad_u8(im1, im2, y1, x1, y2, x2, bs);
  int l = x2, kk = y2;
  auto probe = [&](int px, int py) {
    if (px < 0 || py < 0 || px + bs > w || py + bs > h) return;
    int64_t s = sad_u8(im1, im2, y1, x1, py, px, bs);
    if (s < sad_min) {
      sad_min = s;
      min_x = px;
      min_y = py;
    }
  };
  int m = 1;
  while (m < shift) {
    for (int i = 0; i < m; ++i) { ++l; probe(l, kk); }
    for (int i = 0; i < m; ++i) { ++kk; probe(l, kk); }
    for (int i = 0; i < m + 1; ++i) { --l; probe(l, kk); }
    for (int i = 0; i < m + 1; ++i) { --kk; probe(l, kk); }
    m += 2;
  }
  for (int i = 0; i < m - 1; ++i) { ++l; probe(l, kk); }
  *out_y = min_y;
  *out_x = min_x;
  *out_sad = sad_min;
}

struct Level {
  Image im1, im2;
  Flow flow;
  std::vector<CacheEntry> cache;  // per pixel, like the CV_32SC4 fast_array
};

void calc_level_bm(Level& L, int bs, int ss) {
  for (int i = 0; i < L.im1.h; i += bs)
    for (int j = 0; j < L.im1.w; j += bs) {
      float* f = L.flow.at(i, j);
      int x2 = j + (int)f[0];  // (int) truncation toward zero (:233-234)
      int y2 = i + (int)f[1];
      int my, mx;
      int64_t s;
      spiral_search(L.im1, L.im2, i, j, y2, x2, bs, ss, &my, &mx, &s);
      f[0] = (float)(mx - j);
      f[1] = (float)(my - i);
      CacheEntry& e = L.cache[(size_t)i * L.im1.w + j];
      e.x = mx; e.y = my; e.sad = (int32_t)s; e.bs = bs;  // (:414)
    }
}

// candidate orderings (:439-522): (dy, dx) block offsets, own MV first
static const int INTERIOR[][2] = {{0,0},{0,-1},{0,1},{1,1},{-1,-1},{-1,1},{-1,0},{1,0},{1,-1}};
static const int TOPE[][2] = {{0,0},{0,-1},{0,1},{1,1},{1,0},{1,-1}};
static const int BOTTOME[][2] = {{0,0},{0,-1},{0,1},{-1,-1},{-1,1},{-1,0}};
static const int LEFTE[][2] = {{0,0},{0,1},{1,1},{-1,1},{-1,0},{1,0}};
static const int RIGHTE[][2] = {{0,0},{0,-1},{-1,-1},{-1,0},{1,0},{1,-1}};
static const int TL[][2] = {{0,0},{0,1},{1,1},{1,0}};
static const int TR[][2] = {{0,0},{0,-1},{1,0},{1,-1}};
static const int BL[][2] = {{0,0},{0,1},{-1,1},{-1,0}};
static const int BR[][2] = {{0,0},{0,-1},{-1,-1},{-1,0}};

void regularize(Level& L, int bs, float lam, int mult) {
  const int h = L.im1.h, w = L.im1.w;
  const float FLT_MAX_ = std::numeric_limits<float>::max();
  float cands[9][2];
  float energies[9];
  for (int i = 0; i < h; i += bs)
    for (int j = 0; j < w; j += bs) {
      const int(*offs)[2];
      int n;
      if (i - bs >= 0 && j - bs >= 0 && j + bs < w && i + bs < h) { offs = INTERIOR; n = 9; }
      else if (j - bs >= 0 && j + bs < w && i == 0) { offs = TOPE; n = 6; }
      else if (j - bs >= 0 && j + bs < w && i == h - bs) { offs = BOTTOME; n = 6; }
      else if (j == 0 && i - bs >= 0 && i + bs < h) { offs = LEFTE; n = 6; }
      else if (j == w - bs && i - bs >= 0 && i + bs < h) { offs = RIGHTE; n = 6; }
      else if (i == 0 && j == 0) { offs = TL; n = 4; }
      else if (i == 0) { offs = TR; n = 4; }
      else if (j == 0) { offs = BL; n = 4; }
      else { offs = BR; n = 4; }
      for (int k = 0; k < n; ++k) {
        float* f = L.flow.at(i + offs[k][0] * bs, j + offs[k][1] * bs);
        cands[k][0] = f[0];
        cands[k][1] = f[1];
      }
      for (int k = 0; k < n; ++k) {
        int x2 = j + (int)cands[k][0];
        int y2 = i + (int)cands[k][1];
        if (x2 < 0 || x2 > w - bs || y2 < 0 || y2 > h - bs) {
          energies[k] = FLT_MAX_;  // (:578-582)
          continue;
        }
        // fast_array hit iff cached (pos, bs) matches exactly (:594-602)
        CacheEntry& e = L.cache[(size_t)i * w + j];
        int64_t sad;
        if (e.x == x2 && e.y == y2 && e.bs == bs) {
          sad = e.sad;
        } else {
          sad = sad_u8(L.im1, L.im2, i, j, y2, x2, bs);
          e.x = x2; e.y = y2; e.sad = (int32_t)sad; e.bs = bs;
        }
        float smooth = 0.0f;  // (:623-644)
        for (int o = 0; o < n; ++o)
          smooth += std::fabs(cands[o][0] - cands[k][0]) +
                    std::fabs(cands[o][1] - cands[k][1]);
        energies[k] = (float)sad + lam * (float)mult * smooth;
      }
      int min_pos = 0;  // first strict minimum (:646-662)
      float min_val = energies[0];
      for (int k = 1; k < n; ++k)
        if (energies[k] < min_val) { min_val = energies[k]; min_pos = k; }
      float* f = L.flow.at(i, j);  // in-place Gauss-Seidel write (:616)
      f[0] = cands[min_pos][0];
      f[1] = cands[min_pos][1];
    }
}

void divide_blocks(Flow& flow, int bs) {
  int half = bs >> 1;
  for (int i = 0; i < flow.h; i += bs)
    for (int j = 0; j < flow.w; j += bs) {
      float u = flow.at(i, j)[0], v = flow.at(i, j)[1];
      float* a = flow.at(i + half, j); a[0] = u; a[1] = v;
      float* b = flow.at(i, j + half); b[0] = u; b[1] = v;
      float* c = flow.at(i + half, j + half); c[0] = u; c[1] = v;
    }
}

void fill_block(Flow& flow, int i, int j, int bs, float u, float v) {
  for (int y = i; y < i + bs; ++y)
    for (int x = j; x < j + bs; ++x) {
      float* f = flow.at(y, x);
      f[0] = u; f[1] = v;
    }
}

void copy_mvs(const Flow& coarse, Flow& fine, int coarse_bs) {
  for (int i = 0; i < coarse.h; i += coarse_bs)
    for (int j = 0; j < coarse.w; j += coarse_bs) {
      const float* f = coarse.d.data() + 2 * ((size_t)i * coarse.w + j);
      fill_block(fine, i << 1, j << 1, coarse_bs << 1, 2.0f * f[0], 2.0f * f[1]);
    }
}

}  // namespace

int main(int argc, char** argv) {
  const int H = 1080, W = 1920;
  const int LEVELS = 4, BS = 32, SS = 64, SWEEPS = 2;
  int reps = argc > 1 ? std::atoi(argv[1]) : 1;

  // padded size per the reference rule: smallest H' >= H with
  // H' % (2^i * 32) == 0 for every level (=> multiple of 256)
  auto pad_to = [](int n) { int m = 256; return ((n + m - 1) / m) * m; };
  const int PH = pad_to(H), PW = pad_to(W);
  const int py = (PH - H) / 2, px = (PW - W) / 2;

  // bench.py's workload: pseudo-random texture, planted shift (5, 9)
  Image base(PH + 16, PW + 16);
  uint64_t s = 0x9E3779B97F4A7C15ull;
  for (auto& v : base.d) {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    v = (uint8_t)(s & 0xFF);
  }
  Image im1(PH, PW), im2(PH, PW);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      im1.row(py + y)[px + x] = base.at(y, x);
      im2.row(py + y)[px + x] = base.at(y + 5, x + 9);
    }

  std::vector<Level> levels(LEVELS);
  levels[0].im1 = im1;
  levels[0].im2 = im2;
  for (int l = 1; l < LEVELS; ++l) {
    levels[l].im1 = pyr_down(levels[l - 1].im1);
    levels[l].im2 = pyr_down(levels[l - 1].im2);
  }

  double total = 0.0;
  for (int rep = 0; rep < reps; ++rep) {
    for (int l = 0; l < LEVELS; ++l) {
      levels[l].flow = Flow(levels[l].im1.h, levels[l].im1.w);
      levels[l].cache.assign((size_t)levels[l].im1.h * levels[l].im1.w, {});
    }
    auto t0 = std::chrono::steady_clock::now();
    for (int l = LEVELS - 1; l >= 0; --l) {
      Level& L = levels[l];
      if (l < LEVELS - 1) copy_mvs(levels[l + 1].flow, L.flow, BS);
      calc_level_bm(L, BS, SS);
      int bs = BS;
      float lam = (float)(BS / 2);
      while (bs > 1) {
        for (int sweep = 0; sweep < SWEEPS; ++sweep)
          regularize(L, bs, lam, sweep + 1);
        divide_blocks(L.flow, bs);
        bs >>= 1;
        lam *= 2.0f;
      }
    }
    // final densify with bs=2 (:205-206) - stride-1 grid: copy origins
    for (int i = 0; i < PH; i += 2)
      for (int j = 0; j < PW; j += 2) {
        float* f = levels[0].flow.at(i, j);
        fill_block(levels[0].flow, i, j, 2, f[0], f[1]);
      }
    auto t1 = std::chrono::steady_clock::now();
    total += std::chrono::duration<double>(t1 - t0).count();
  }
  double spf = total / reps;
  // sanity: the planted motion must dominate the recovered field
  size_t ok = 0, cnt = 0;
  for (int i = py; i < PH - py; i += 16)
    for (int j = px; j < PW - px; j += 16) {
      float* f = levels[0].flow.at(i, j);
      cnt++;
      // im2(y,x) = base(y+5, x+9) = im1(y+5, x+9) -> true flow (-9, -5)
      if (std::fabs(f[0] + 9.0f) < 0.5f && std::fabs(f[1] + 5.0f) < 0.5f) ok++;
    }
  std::printf(
      "{\"s_per_field\": %.3f, \"fields_per_sec\": %.4f, "
      "\"planted_motion_fraction\": %.4f, \"reps\": %d}\n",
      spf, 1.0 / spf, (double)ok / (double)cnt, reps);
  return 0;
}
