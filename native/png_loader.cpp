// Native data-loader core: a minimal, dependency-light PNG decoder
// (zlib-inflate + per-scanline unfilter) exposed through a C ABI for
// ctypes binding (gan_aug_pfa_tpu/data/native_loader.py).
//
// Role: the reference's data layer decodes PNGs with PIL in DataLoader
// worker processes on every epoch (reference dataset.py:195-231); the TPU
// build decodes each file exactly ONCE at cache-build time
// (data/loader.py).  This native decoder accelerates that startup pass —
// multiple files are decoded concurrently from a Python thread pool since
// these calls never touch the GIL.
//
// Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
// 4 (gray+alpha), 6 (RGBA), non-interlaced.  Anything else returns an
// error code and the Python side falls back to PIL.  Conversions mirror
// PIL: RGBA->RGB drops alpha; gray requests on color files use PIL's
// ITU-R 601-2 integer luma ((r*299 + g*587 + b*114) / 1000).
//
// Build: make -C native  (g++ -O3 -shared -fPIC, links -lz only).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr unsigned char kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                      0x1a, '\n'};

// Error codes (keep in sync with native_loader.py).
enum {
  kOk = 0,
  kErrOpen = -1,
  kErrSignature = -2,
  kErrTruncated = -3,
  kErrUnsupported = -4,   // bit depth / color type / interlace
  kErrInflate = -5,
  kErrFilter = -6,
  kErrBadArgs = -7,
  kErrNoPalette = -8,
};

struct Png {
  uint32_t width = 0, height = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;          // concatenated compressed stream
  std::vector<uint8_t> palette;       // PLTE, 3 bytes per entry
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 8) { std::fclose(f); return kErrTruncated; }
  out.resize(size_t(n));
  size_t got = std::fread(out.data(), 1, size_t(n), f);
  std::fclose(f);
  return got == size_t(n) ? kOk : kErrTruncated;
}

int parse_chunks(const std::vector<uint8_t>& buf, Png& png) {
  if (std::memcmp(buf.data(), kPngSig, 8) != 0) return kErrSignature;
  size_t pos = 8;
  bool seen_ihdr = false;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + len > buf.size()) return kErrTruncated;
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return kErrTruncated;
      png.width = be32(data);
      png.height = be32(data + 4);
      png.bit_depth = data[8];
      png.color_type = data[9];
      png.interlace = data[12];
      seen_ihdr = true;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      png.palette.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      png.idat.insert(png.idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;  // len + type + data + crc (crc not verified)
  }
  return seen_ihdr ? kOk : kErrTruncated;
}

int channels_of(uint8_t color_type) {
  switch (color_type) {
    case 0: return 1;  // gray
    case 2: return 3;  // rgb
    case 3: return 1;  // palette index
    case 4: return 2;  // gray + alpha
    case 6: return 4;  // rgba
    default: return 0;
  }
}

int inflate_idat(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  uLongf out_len = uLongf(out.size());
  int rc = uncompress(out.data(), &out_len, in.data(), uLong(in.size()));
  if (rc != Z_OK || out_len != out.size()) return kErrInflate;
  return kOk;
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// In-place scanline unfilter: raw holds height * (1 + stride) bytes,
// result written to img (height * stride).
int unfilter(const std::vector<uint8_t>& raw, uint32_t height,
             size_t stride, int bpp, std::vector<uint8_t>& img) {
  img.resize(size_t(height) * stride);
  for (uint32_t y = 0; y < height; ++y) {
    uint8_t ft = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &img[size_t(y) * stride];
    const uint8_t* up = y ? &img[size_t(y - 1) * stride] : nullptr;
    switch (ft) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (up ? up[x] : 0));
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = uint8_t(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
          dst[x] = uint8_t(src[x] + paeth(a, b, c));
        }
        break;
      default:
        return kErrFilter;
    }
  }
  return kOk;
}

// Full decode to the file's native channel layout (8-bit).
int decode(const char* path, Png& png, std::vector<uint8_t>& img,
           int& nch) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, buf);
  if (rc != kOk) return rc;
  rc = parse_chunks(buf, png);
  if (rc != kOk) return rc;
  if (png.bit_depth != 8 || png.interlace != 0) return kErrUnsupported;
  nch = channels_of(png.color_type);
  if (nch == 0) return kErrUnsupported;
  if (png.color_type == 3 && png.palette.empty()) return kErrNoPalette;
  size_t stride = size_t(png.width) * nch;
  std::vector<uint8_t> raw(size_t(png.height) * (stride + 1));
  rc = inflate_idat(png.idat, raw);
  if (rc != kOk) return rc;
  return unfilter(raw, png.height, stride, nch, img);
}

// PIL ITU-R 601-2 integer luma (Convert.c: L24(rgb) >> 16 equivalent;
// PIL uses L = (r*19595 + g*38470 + b*7471 + 0x8000) >> 16).
inline uint8_t pil_luma(uint8_t r, uint8_t g, uint8_t b) {
  return uint8_t((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

}  // namespace

extern "C" {

// Probe image header: fills w, h, channels. Returns 0 or error code.
int png_probe(const char* path, int* w, int* h, int* channels) {
  if (!path || !w || !h || !channels) return kErrBadArgs;
  std::vector<uint8_t> buf;
  int rc = read_file(path, buf);
  if (rc != kOk) return rc;
  Png png;
  rc = parse_chunks(buf, png);
  if (rc != kOk) return rc;
  if (png.bit_depth != 8 || png.interlace != 0) return kErrUnsupported;
  int nch = channels_of(png.color_type);
  if (nch == 0) return kErrUnsupported;
  *w = int(png.width);
  *h = int(png.height);
  *channels = png.color_type == 3 ? 3 : nch;
  return kOk;
}

// Decode as RGB8 into caller buffer of size h*w*3 (values as PIL
// convert("RGB")). Caller passes the probed h/w (must match the file).
int png_decode_rgb8(const char* path, unsigned char* out, int h, int w) {
  if (!path || !out) return kErrBadArgs;
  Png png;
  std::vector<uint8_t> img;
  int nch = 0;
  int rc = decode(path, png, img, nch);
  if (rc != kOk) return rc;
  if (int(png.height) != h || int(png.width) != w) return kErrBadArgs;
  size_t n = size_t(h) * w;
  switch (png.color_type) {
    case 0:  // gray -> replicate
      for (size_t i = 0; i < n; ++i) {
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = img[i];
      }
      break;
    case 2:
      std::memcpy(out, img.data(), n * 3);
      break;
    case 3: {  // palette lookup
      size_t entries = png.palette.size() / 3;
      for (size_t i = 0; i < n; ++i) {
        size_t idx = img[i];
        if (idx >= entries) return kErrNoPalette;
        std::memcpy(&out[3 * i], &png.palette[3 * idx], 3);
      }
      break;
    }
    case 4:  // gray+alpha -> drop alpha, replicate
      for (size_t i = 0; i < n; ++i) {
        uint8_t v = img[2 * i];
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = v;
      }
      break;
    case 6:  // rgba -> drop alpha (PIL convert("RGB") semantics)
      for (size_t i = 0; i < n; ++i) {
        std::memcpy(&out[3 * i], &img[4 * i], 3);
      }
      break;
    default:
      return kErrUnsupported;
  }
  return kOk;
}

// Decode as gray8 (PIL convert("L")) into caller buffer of size h*w.
int png_decode_gray8(const char* path, unsigned char* out, int h, int w) {
  if (!path || !out) return kErrBadArgs;
  Png png;
  std::vector<uint8_t> img;
  int nch = 0;
  int rc = decode(path, png, img, nch);
  if (rc != kOk) return rc;
  if (int(png.height) != h || int(png.width) != w) return kErrBadArgs;
  size_t n = size_t(h) * w;
  switch (png.color_type) {
    case 0:
      std::memcpy(out, img.data(), n);
      break;
    case 2:
      for (size_t i = 0; i < n; ++i)
        out[i] = pil_luma(img[3 * i], img[3 * i + 1], img[3 * i + 2]);
      break;
    case 3: {
      size_t entries = png.palette.size() / 3;
      for (size_t i = 0; i < n; ++i) {
        size_t idx = img[i];
        if (idx >= entries) return kErrNoPalette;
        const uint8_t* p = &png.palette[3 * idx];
        out[i] = pil_luma(p[0], p[1], p[2]);
      }
      break;
    }
    case 4:
      for (size_t i = 0; i < n; ++i) out[i] = img[2 * i];
      break;
    case 6:
      for (size_t i = 0; i < n; ++i)
        out[i] = pil_luma(img[4 * i], img[4 * i + 1], img[4 * i + 2]);
      break;
    default:
      return kErrUnsupported;
  }
  return kOk;
}

// Library version/ABI marker for the ctypes side.
int png_loader_abi_version(void) { return 1; }

}  // extern "C"
