// Native frame I/O for the TPU motion-estimation framework.
//
// C++ re-design of the reference's C frame layer
// (/root/reference/src/common/utils.c:49-134): raw YUV luma read/write with
// u8 <-> int32 widening/narrowing, |a-b| frame diffs, the 5-frame stacked
// output artifact, and block-wise motion compensation — the host-side
// pieces that sit outside the XLA compute path. Unlike the reference's
// fread loop, reads are mmap'd and copies are done in one pass; the writer
// narrows with a plain cast (mod-256) exactly like utils.c:57.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All functions
// return 0 on success, negative errno-style codes on failure.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Read the first h*w bytes of a raw YUV file into out_u8 (mmap + memcpy).
int me_read_frame_u8(const char* path, int64_t h, int64_t w,
                     uint8_t* out_u8) {
  const int64_t n = h * w;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    int e = -errno;
    close(fd);
    return e;
  }
  if (st.st_size < n) {
    close(fd);
    return -EINVAL;
  }
  void* m = mmap(nullptr, static_cast<size_t>(n), PROT_READ, MAP_PRIVATE,
                 fd, 0);
  if (m == MAP_FAILED) {
    int e = -errno;
    close(fd);
    return e;
  }
  memcpy(out_u8, m, static_cast<size_t>(n));
  munmap(m, static_cast<size_t>(n));
  close(fd);
  return 0;
}

// Widen u8 -> int32 (utils.c:49-53).
int me_widen_u8_i32(const uint8_t* in_u8, int64_t n, int32_t* out_i32) {
  for (int64_t i = 0; i < n; ++i) out_i32[i] = in_u8[i];
  return 0;
}

// Write an int32 frame as u8 bytes, plain-cast narrowing (utils.c:55-59).
int me_write_frame_i32(const char* path, const int32_t* in_i32, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -errno;
  constexpr int64_t kChunk = 1 << 20;
  uint8_t buf[kChunk];
  for (int64_t off = 0; off < n; off += kChunk) {
    const int64_t m = (n - off < kChunk) ? (n - off) : kChunk;
    for (int64_t i = 0; i < m; ++i)
      buf[i] = static_cast<uint8_t>(in_i32[off + i]);
    if (fwrite(buf, 1, static_cast<size_t>(m), f) !=
        static_cast<size_t>(m)) {
      fclose(f);
      return -EIO;
    }
  }
  if (fclose(f) != 0) return -errno;
  return 0;
}

// out = |a - b| elementwise (utils.c:94-100).
int me_frame_diff(const int32_t* a, const int32_t* b, int64_t n,
                  int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t d = a[i] - b[i];
    out[i] = d < 0 ? -d : d;
  }
  return 0;
}

// Motion-compensated frame: comp[p] = ref[p + mv(block(p))]
// (utils.c:102-134). mv_y/mv_x are [nby, nbx] row-major; edge blocks are
// truncated (prediction_frame.c:21-22). Out-of-frame gather targets are
// left untouched (the reference skips them, utils.c:123; callers
// zero-init, our documented deviation from its malloc garbage).
int me_motion_compensate(const int32_t* ref, int64_t h, int64_t w,
                         const int32_t* mv_y, const int32_t* mv_x,
                         int64_t nby, int64_t nbx, int64_t blk,
                         int32_t* comp) {
  for (int64_t by = 0; by < nby; ++by) {
    for (int64_t bx = 0; bx < nbx; ++bx) {
      const int64_t ty = by * blk, tx = bx * blk;
      const int64_t bh = (h - ty < blk) ? (h - ty) : blk;
      const int64_t bw = (w - tx < blk) ? (w - tx) : blk;
      const int64_t dy = mv_y[by * nbx + bx], dx = mv_x[by * nbx + bx];
      for (int64_t y = 0; y < bh; ++y) {
        const int64_t sy = ty + y + dy;
        if (sy < 0 || sy >= h) continue;
        for (int64_t x = 0; x < bw; ++x) {
          const int64_t sx = tx + x + dx;
          if (sx < 0 || sx >= w) continue;
          comp[(ty + y) * w + tx + x] = ref[sy * w + sx];
        }
      }
    }
  }
  return 0;
}

// Build the 5-frame stacked artifact [ref, cur, comp, |ref-cur|,
// |comp-cur|] (main.c:161-168) straight into out (size 5*h*w).
int me_stack_output(const int32_t* ref, const int32_t* cur,
                    const int32_t* comp, int64_t h, int64_t w,
                    int32_t* out) {
  const int64_t n = h * w;
  memcpy(out, ref, sizeof(int32_t) * n);
  memcpy(out + n, cur, sizeof(int32_t) * n);
  memcpy(out + 2 * n, comp, sizeof(int32_t) * n);
  me_frame_diff(ref, cur, n, out + 3 * n);
  me_frame_diff(comp, cur, n, out + 4 * n);
  return 0;
}

}  // extern "C"
