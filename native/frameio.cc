// Native frame I/O for recon3d_tpu: PNG codec + threaded RGBD batch loader.
//
// The reference pipelines checkpoint every captured frame to disk as a
// color PNG + 16-bit depth PNG and reload them for offline registration
// (mini1.py:154-158, 188-212). That host-side loop is decode-bound in
// Python (PIL, one image at a time); this library provides a minimal
// zlib-backed PNG codec (8-bit gray/RGB/RGBA, 16-bit gray, filters 0-4,
// non-interlaced) and a std::thread pool that decodes whole frame
// directories in parallel. Exposed as a plain C ABI for ctypes
// (recon3d_tpu/utils/native.py); Python falls back to PIL when the
// library is unbuilt or a file uses an unsupported PNG feature.
//
// Build: make -C native  (g++ -O3 -shared -fPIC frameio.cc -lz)

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr unsigned char kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

struct PngInfo {
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, channels = 0, interlace = 0;
};

uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_be32(unsigned char* p, uint32_t v) {
  p[0] = v >> 24;
  p[1] = v >> 16;
  p[2] = v >> 8;
  p[3] = v;
}

int channels_for(int color_type) {
  switch (color_type) {
    case 0: return 1;  // gray
    case 2: return 3;  // rgb
    case 4: return 2;  // gray+alpha
    case 6: return 4;  // rgba
    default: return 0; // palette unsupported
  }
}

bool read_file(const char* path, std::vector<unsigned char>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size_t(n));
  bool ok = fread(out->data(), 1, size_t(n), f) == size_t(n);
  fclose(f);
  return ok;
}

// Parse header + concatenate IDAT. Returns 0 on success.
int parse_png(const std::vector<unsigned char>& buf, PngInfo* info,
              std::vector<unsigned char>* idat) {
  if (buf.size() < 8 || memcmp(buf.data(), kSig, 8) != 0) return -1;
  size_t off = 8;
  bool have_ihdr = false;
  while (off + 8 <= buf.size()) {
    uint32_t len = be32(&buf[off]);
    const char* tag = reinterpret_cast<const char*>(&buf[off + 4]);
    if (off + 12 + len > buf.size()) return -2;
    const unsigned char* data = &buf[off + 8];
    if (!memcmp(tag, "IHDR", 4)) {
      if (len < 13) return -2;
      info->width = be32(data);
      info->height = be32(data + 4);
      info->bit_depth = data[8];
      info->color_type = data[9];
      info->interlace = data[12];
      info->channels = channels_for(info->color_type);
      have_ihdr = true;
      if (info->interlace != 0 || info->channels == 0 ||
          (info->bit_depth != 8 && info->bit_depth != 16))
        return -3;  // unsupported flavor -> caller falls back to PIL
    } else if (!memcmp(tag, "IDAT", 4)) {
      idat->insert(idat->end(), data, data + len);
    } else if (!memcmp(tag, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  return have_ihdr ? 0 : -2;
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

// Inflate + defilter into `out` (raw big-endian samples as stored).
int decode_pixels(const PngInfo& info, const std::vector<unsigned char>& idat,
                  unsigned char* out) {
  const size_t bpp = size_t(info.channels) * (info.bit_depth / 8);
  const size_t stride = bpp * info.width;
  std::vector<unsigned char> raw((stride + 1) * info.height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -4;
  std::vector<unsigned char> prev(stride, 0);
  for (uint32_t y = 0; y < info.height; ++y) {
    const unsigned char* src = &raw[(stride + 1) * y];
    unsigned char filter = src[0];
    unsigned char* dst = out + stride * y;
    memcpy(dst, src + 1, stride);
    switch (filter) {
      case 0: break;
      case 1:
        for (size_t i = bpp; i < stride; ++i) dst[i] += dst[i - bpp];
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) dst[i] += prev[i];
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i)
          dst[i] += (unsigned char)(((i >= bpp ? dst[i - bpp] : 0) + prev[i]) / 2);
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i)
          dst[i] += (unsigned char)paeth(i >= bpp ? dst[i - bpp] : 0, prev[i],
                                         i >= bpp ? prev[i - bpp] : 0);
        break;
      default:
        return -5;
    }
    memcpy(prev.data(), dst, stride);
  }
  return 0;
}

int write_png(const char* path, const unsigned char* pixels, uint32_t w,
              uint32_t h, int bit_depth, int color_type) {
  const int channels = channels_for(color_type);
  const size_t bpp = size_t(channels) * (bit_depth / 8);
  const size_t stride = bpp * w;
  std::vector<unsigned char> raw((stride + 1) * h);
  for (uint32_t y = 0; y < h; ++y) {
    raw[(stride + 1) * y] = 0;  // filter None
    memcpy(&raw[(stride + 1) * y + 1], pixels + stride * y, stride);
  }
  uLongf bound = compressBound(raw.size());
  std::vector<unsigned char> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(), raw.size(), 6) != Z_OK)
    return -4;

  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  auto chunk = [&](const char* tag, const unsigned char* data, uint32_t len) {
    unsigned char hdr[8];
    put_be32(hdr, len);
    memcpy(hdr + 4, tag, 4);
    fwrite(hdr, 1, 8, f);
    if (len) fwrite(data, 1, len, f);
    uLong crc = crc32(0, hdr + 4, 4);
    if (len) crc = crc32(crc, data, len);
    unsigned char tail[4];
    put_be32(tail, uint32_t(crc));
    fwrite(tail, 1, 4, f);
  };
  fwrite(kSig, 1, 8, f);
  unsigned char ihdr[13];
  put_be32(ihdr, w);
  put_be32(ihdr + 4, h);
  ihdr[8] = (unsigned char)bit_depth;
  ihdr[9] = (unsigned char)color_type;
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", comp.data(), uint32_t(bound));
  chunk("IEND", nullptr, 0);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 and fills w/h/channels/bit_depth, or a negative error code.
int frameio_png_info(const char* path, int* w, int* h, int* channels,
                     int* bit_depth) {
  std::vector<unsigned char> buf, idat;
  if (!read_file(path, &buf)) return -1;
  PngInfo info;
  int rc = parse_png(buf, &info, &idat);
  if (rc) return rc;
  *w = int(info.width);
  *h = int(info.height);
  *channels = info.channels;
  *bit_depth = info.bit_depth;
  return 0;
}

// out must hold w*h*channels*(bit_depth/8) bytes. 16-bit output is
// converted to native little-endian u16.
int frameio_png_read(const char* path, unsigned char* out, long capacity) {
  std::vector<unsigned char> buf, idat;
  if (!read_file(path, &buf)) return -1;
  PngInfo info;
  int rc = parse_png(buf, &info, &idat);
  if (rc) return rc;
  const size_t nbytes = size_t(info.width) * info.height * info.channels *
                        (info.bit_depth / 8);
  if (long(nbytes) > capacity) return -6;
  rc = decode_pixels(info, idat, out);
  if (rc) return rc;
  if (info.bit_depth == 16) {  // PNG stores big-endian samples
    for (size_t i = 0; i + 1 < nbytes; i += 2) {
      unsigned char t = out[i];
      out[i] = out[i + 1];
      out[i + 1] = t;
    }
  }
  return 0;
}

int frameio_png_write_rgb8(const char* path, const unsigned char* data,
                           int w, int h) {
  return write_png(path, data, uint32_t(w), uint32_t(h), 8, 2);
}

int frameio_png_write_gray8(const char* path, const unsigned char* data,
                            int w, int h) {
  return write_png(path, data, uint32_t(w), uint32_t(h), 8, 0);
}

int frameio_png_write_gray16(const char* path, const uint16_t* data,
                             int w, int h) {
  std::vector<unsigned char> be(size_t(w) * h * 2);
  for (size_t i = 0; i < size_t(w) * h; ++i) {
    be[2 * i] = (unsigned char)(data[i] >> 8);
    be[2 * i + 1] = (unsigned char)(data[i] & 0xff);
  }
  return write_png(path, be.data(), uint32_t(w), uint32_t(h), 16, 0);
}

// Decode n (color RGB8, depth GRAY16) frame pairs in parallel into
// preallocated buffers of shape (n, h, w, 3) u8 and (n, h, w) u16.
// status[i] receives 0 on success per frame. Returns 0 if all succeeded.
int frameio_load_rgbd_batch(const char** color_paths,
                            const char** depth_paths, int n, int w, int h,
                            unsigned char* colors, uint16_t* depths,
                            int* status, int threads) {
  if (threads < 1) threads = 1;
  const size_t cstride = size_t(w) * h * 3;
  const size_t dstride = size_t(w) * h;
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += threads) {
      int rc = frameio_png_read(color_paths[i], colors + cstride * i,
                                long(cstride));
      if (rc == 0)
        rc = frameio_png_read(depth_paths[i],
                              reinterpret_cast<unsigned char*>(depths) +
                                  dstride * 2 * i,
                              long(dstride * 2));
      status[i] = rc;
    }
  };
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker, t);
  for (auto& t : pool) t.join();
  int rc = 0;
  for (int i = 0; i < n; ++i)
    if (status[i]) rc = status[i];
  return rc;
}

}  // extern "C"
