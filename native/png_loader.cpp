// Native dataset loader: multi-threaded PNG decode for Blender-synthetic
// scenes.
//
// The reference's data path decodes every PNG serially through Python
// imageio (/root/reference/mlx_nerf/dataset/dataloader.py:44-50 — flagged
// as the disk-I/O hot spot in SURVEY.md §3.5). This library decodes a batch
// of PNG files across hardware threads and writes straight into a caller-
// provided float32 [N, H, W, 4] buffer, normalized to [0, 1] — ready for
// jax.device_put without further host copies.
//
// Scope: 8-bit greyscale/RGB/RGBA, non-interlaced PNGs (what Blender
// emits and what this repo's synthetic writer produces). Returns a nonzero
// error for anything else; the Python binding falls back to imageio.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib)

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr unsigned char kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

inline uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode one PNG from memory into out_rgba [h*w*4] float32 in [0,1].
// Returns 0 on success.
int decode_one(const unsigned char* buf, size_t len, int exp_w, int exp_h,
               float* out_rgba) {
  if (len < 8 || std::memcmp(buf, kPngSig, 8) != 0) return 1;  // not a PNG
  size_t pos = 8;
  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<unsigned char> idat;

  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const unsigned char* tag = buf + pos + 4;
    const unsigned char* data = buf + pos + 8;
    if (pos + 12 + clen > len) return 2;  // truncated
    if (!std::memcmp(tag, "IHDR", 4)) {
      if (clen < 13) return 3;
      w = int(be32(data));
      h = int(be32(data + 4));
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (!std::memcmp(tag, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!std::memcmp(tag, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (w <= 0 || h <= 0 || idat.empty()) return 4;
  if (bit_depth != 8 || interlace != 0) return 5;  // unsupported flavor
  if (exp_w && (w != exp_w || h != exp_h)) return 6;  // shape mismatch

  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // grey
    case 2: ch = 3; break;  // rgb
    case 4: ch = 2; break;  // grey+alpha
    case 6: ch = 4; break;  // rgba
    default: return 5;      // palette unsupported
  }

  const size_t stride = size_t(w) * ch;
  std::vector<unsigned char> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return 7;
  }

  // un-filter in place into `img`
  std::vector<unsigned char> img(stride * h);
  for (int y = 0; y < h; ++y) {
    const unsigned char filter = raw[(stride + 1) * y];
    const unsigned char* src = raw.data() + (stride + 1) * y + 1;
    unsigned char* dst = img.data() + stride * y;
    const unsigned char* up = y ? img.data() + stride * (y - 1) : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(ch) ? dst[x - ch] : 0);
        break;
      case 2:  // up
        for (size_t x = 0; x < stride; ++x) dst[x] = src[x] + (up ? up[x] : 0);
        break;
      case 3:  // average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(ch) ? dst[x - ch] : 0;
          int b = up ? up[x] : 0;
          dst[x] = src[x] + ((a + b) >> 1);
        }
        break;
      case 4:  // paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(ch) ? dst[x - ch] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(ch)) ? up[x - ch] : 0;
          dst[x] = src[x] + paeth(a, b, c);
        }
        break;
      default:
        return 8;
    }
  }

  // expand to RGBA float32 [0,1]
  constexpr float kInv = 1.0f / 255.0f;
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = img.data() + stride * y;
    float* out = out_rgba + size_t(y) * w * 4;
    for (int x = 0; x < w; ++x) {
      const unsigned char* px = row + size_t(x) * ch;
      float r, g, b, a;
      switch (ch) {
        case 1: r = g = b = px[0] * kInv; a = 1.0f; break;
        case 2: r = g = b = px[0] * kInv; a = px[1] * kInv; break;
        case 3: r = px[0] * kInv; g = px[1] * kInv; b = px[2] * kInv; a = 1.0f; break;
        default: r = px[0] * kInv; g = px[1] * kInv; b = px[2] * kInv; a = px[3] * kInv;
      }
      out[size_t(x) * 4 + 0] = r;
      out[size_t(x) * 4 + 1] = g;
      out[size_t(x) * 4 + 2] = b;
      out[size_t(x) * 4 + 3] = a;
    }
  }
  return 0;
}

std::vector<unsigned char> read_file(const char* path) {
  std::vector<unsigned char> out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    out.resize(size_t(n));
    if (std::fread(out.data(), 1, size_t(n), f) != size_t(n)) out.clear();
  }
  std::fclose(f);
  return out;
}

}  // namespace

extern "C" {

// Probe a PNG's dimensions. Returns 0 on success.
int png_probe(const char* path, int* w, int* h) {
  auto buf = read_file(path);
  if (buf.size() < 33 || std::memcmp(buf.data(), kPngSig, 8) != 0) return 1;
  if (std::memcmp(buf.data() + 12, "IHDR", 4) != 0) return 2;
  *w = int(be32(buf.data() + 16));
  *h = int(be32(buf.data() + 20));
  return 0;
}

// Decode `n` PNG files (NUL-separated `paths` blob) of identical WxH into
// out [n, h, w, 4] float32 across `n_threads` threads. Returns 0 on
// success, else 100 + index of the first failing file.
int png_decode_batch(const char* paths_blob, int n, int w, int h,
                     float* out, int n_threads) {
  std::vector<const char*> paths;
  paths.reserve(n);
  const char* p = paths_blob;
  for (int i = 0; i < n; ++i) {
    paths.push_back(p);
    p += std::strlen(p) + 1;
  }

  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;

  std::atomic<int> next(0), first_err(-1);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || first_err.load() >= 0) return;
      auto buf = read_file(paths[i]);
      int rc = buf.empty()
                   ? 9
                   : decode_one(buf.data(), buf.size(), w, h,
                                out + size_t(i) * h * w * 4);
      if (rc != 0) {
        int expected = -1;
        first_err.compare_exchange_strong(expected, i);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int e = first_err.load();
  return e >= 0 ? 100 + e : 0;
}

}  // extern "C"
