// Native frame I/O + host preprocessing for the capture hot path.
//
// The torch reference leaned on OpenCV/FFmpeg C++ through Python wrappers;
// this library is the framework's own native layer for the host-side work
// that feeds the TPU: exact-size pipe reads from the FFmpeg decoder
// (stream_capture_gpu_ffmpeg.py:215-260 analog), multi-threaded bilinear
// resize of uint8 BGR frames (the host-resize transfer mode's hot loop),
// and BGR -> YUV420 packing (2x transfer compression for low-bandwidth
// host<->device links).
//
// Plain C ABI, loaded via ctypes (no pybind11 in this image). All entry
// points are GIL-free by construction (ctypes releases the GIL around
// foreign calls).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>
#include <unistd.h>
#include <errno.h>

extern "C" {

// Read exactly `size` bytes from fd into buf. Returns bytes read (== size on
// success); short count means EOF/error.
long frameio_read_exact(int fd, uint8_t* buf, long size) {
    long total = 0;
    while (total < size) {
        ssize_t n = read(fd, buf + total, static_cast<size_t>(size - total));
        if (n < 0) {
            if (errno == EINTR) continue;
            break;
        }
        if (n == 0) break;  // EOF
        total += n;
    }
    return total;
}

namespace {

// One output row of half-pixel bilinear resize (uint8 HWC, C channels).
inline void resize_row(const uint8_t* src, int sh, int sw, int channels,
                       uint8_t* dst, int dw, int oy, float sy_scale,
                       float sx_scale) {
    float fy = (oy + 0.5f) * sy_scale - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(sh - 1));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    const uint8_t* row0 = src + static_cast<long>(y0) * sw * channels;
    const uint8_t* row1 = src + static_cast<long>(y1) * sw * channels;
    uint8_t* out = dst + static_cast<long>(oy) * dw * channels;
    for (int ox = 0; ox < dw; ++ox) {
        float fx = (ox + 0.5f) * sx_scale - 0.5f;
        fx = std::min(std::max(fx, 0.0f), static_cast<float>(sw - 1));
        int x0 = static_cast<int>(fx);
        int x1 = std::min(x0 + 1, sw - 1);
        float wx = fx - x0;
        float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
        float w10 = wy * (1 - wx), w11 = wy * wx;
        const uint8_t* p00 = row0 + x0 * channels;
        const uint8_t* p01 = row0 + x1 * channels;
        const uint8_t* p10 = row1 + x0 * channels;
        const uint8_t* p11 = row1 + x1 * channels;
        for (int c = 0; c < channels; ++c) {
            float v = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
            out[ox * channels + c] = static_cast<uint8_t>(v + 0.5f);
        }
    }
}

}  // namespace

// Bilinear resize (half-pixel centers, matches cv2 INTER_LINEAR /
// torch align_corners=False within 1 LSB). Multi-threaded over rows.
void frameio_resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                                int channels, uint8_t* dst, int dh, int dw,
                                int n_threads) {
    float sy_scale = static_cast<float>(sh) / dh;
    float sx_scale = static_cast<float>(sw) / dw;
    if (n_threads <= 1 || dh < 64) {
        for (int oy = 0; oy < dh; ++oy)
            resize_row(src, sh, sw, channels, dst, dw, oy, sy_scale, sx_scale);
        return;
    }
    n_threads = std::min(n_threads, 16);
    std::vector<std::thread> workers;
    int rows_per = (dh + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int begin = t * rows_per;
        int end = std::min(begin + rows_per, dh);
        if (begin >= end) break;
        workers.emplace_back([=] {
            for (int oy = begin; oy < end; ++oy)
                resize_row(src, sh, sw, channels, dst, dw, oy, sy_scale,
                           sx_scale);
        });
    }
    for (auto& w : workers) w.join();
}

// Batch variant: frames (n, sh, sw, 3) -> (n, dh, dw, 3), one thread per frame.
void frameio_resize_batch_u8(const uint8_t* src, int n, int sh, int sw,
                             uint8_t* dst, int dh, int dw) {
    std::vector<std::thread> workers;
    long src_stride = static_cast<long>(sh) * sw * 3;
    long dst_stride = static_cast<long>(dh) * dw * 3;
    for (int i = 0; i < n; ++i) {
        workers.emplace_back([=] {
            frameio_resize_bilinear_u8(src + i * src_stride, sh, sw, 3,
                                       dst + i * dst_stride, dh, dw, 1);
        });
    }
    for (auto& w : workers) w.join();
}

// Canonical full-range BT.601 forward transform in Q16 fixed point —
// integer-exact, so the C++ (row kernels below) and numpy
// (runtime/delta.bgr_to_yuv_planes_numpy) implementations are
// bit-identical by construction:
//   y_fp = 19595 R + 38470 G + 7471 B                 (Q16)
//   Y    = (y_fp + 32768) >> 16
//   U    = ((36963 * (B<<16 - y_fp) + 2^31) >> 32) + 128, clamped
//   V    = ((46727 * (R<<16 - y_fp) + 2^31) >> 32) + 128, clamped
//
// Row-wise passes in the vectorizer-friendly form: a simple counted loop
// with stride-3 (Y) / stride-6 (chroma) interleaved loads and no escaping
// pointers, which GCC's interleaved-access vectorization handles.
static void yuv_row_y(const uint8_t* p, uint8_t* y_row, int w) {
    for (int x = 0; x < w; ++x) {
        int32_t y_fp = 19595 * p[3 * x + 2] + 38470 * p[3 * x + 1] +
                       7471 * p[3 * x];
        y_row[x] = static_cast<uint8_t>((y_fp + 32768) >> 16);
    }
}

static void yuv_row_chroma(const uint8_t* p, uint8_t* u_row, uint8_t* v_row,
                           int half_w) {
    for (int x = 0; x < half_w; ++x) {
        int b = p[6 * x], g = p[6 * x + 1], r = p[6 * x + 2];
        int32_t y_fp = 19595 * r + 38470 * g + 7471 * b;
        int64_t u = ((36963 * ((static_cast<int64_t>(b) << 16) - y_fp) +
                      (1LL << 31)) >> 32) + 128;
        int64_t v = ((46727 * ((static_cast<int64_t>(r) << 16) - y_fp) +
                      (1LL << 31)) >> 32) + 128;
        u_row[x] = static_cast<uint8_t>(u < 0 ? 0 : (u > 255 ? 255 : u));
        v_row[x] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
}

// BGR888 -> planar YUV420 (BT.601). dst must hold h*w*3/2 bytes; h, w even.
void frameio_bgr_to_yuv420(const uint8_t* src, int h, int w, uint8_t* dst) {
    uint8_t* y_plane = dst;
    uint8_t* u_plane = dst + static_cast<long>(h) * w;
    uint8_t* v_plane = u_plane + static_cast<long>(h) * w / 4;
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* p = src + static_cast<long>(yy) * w * 3;
        yuv_row_y(p, y_plane + static_cast<long>(yy) * w, w);
        if ((yy & 1) == 0) {
            long ci = static_cast<long>(yy / 2) * (w / 2);
            yuv_row_chroma(p, u_plane + ci, v_plane + ci, w / 2);
        }
    }
}

// Tile-delta encode for the low-bandwidth transfer path (runtime/delta.py):
// compare frame vs the reference mirror per (tile x tile) block, emit the
// indices+payloads of blocks whose max |diff| exceeds threshold (plus a
// round-robin refresh window), and update the mirror in place. Semantics are
// bit-identical to DeltaEncoder's numpy path (tests pin this).
// frame/ref: (h, w, 3) u8 contiguous, h % tile == 0 and w % tile == 0.
// idx_out capacity: num_tiles int32; tiles_out capacity: num_tiles*tile*tile*3.
// Returns the number of tiles written.
int frameio_delta_encode(const uint8_t* frame, uint8_t* ref, int h, int w,
                         int tile, int threshold,
                         int refresh_start, int refresh_count,
                         int32_t* idx_out, uint8_t* tiles_out) {
    const int grid_w = w / tile;
    const int grid_h = h / tile;
    const int num_tiles = grid_w * grid_h;
    const long row_bytes = static_cast<long>(w) * 3;
    const long tile_row_bytes = static_cast<long>(tile) * 3;
    int k = 0;
    for (int t = 0; t < num_tiles; ++t) {
        const int ty = t / grid_w, tx = t % grid_w;
        const long base = (static_cast<long>(ty) * tile) * row_bytes +
                          static_cast<long>(tx) * tile_row_bytes;
        bool refresh = false;
        if (refresh_count > 0) {
            int rel = t - refresh_start;
            if (rel < 0) rel += num_tiles;
            refresh = rel < refresh_count;
        }
        bool changed = refresh;
        if (!changed) {
            // branchless max-absdiff per row: |a-b| as saturating u8 subs in
            // both directions, max-reduced — the form GCC/Clang auto-
            // vectorize to psubusb/pmaxub under -O3 -march=native (the old
            // early-exit byte loop defeated vectorization and made the scan
            // ~1.4 ms/frame; most tiles are unchanged, so the full-tile scan
            // dominates encode cost).
            uint8_t maxd = 0;
            for (int r = 0; r < tile; ++r) {
                const uint8_t* fp = frame + base + r * row_bytes;
                const uint8_t* rp = ref + base + r * row_bytes;
                uint8_t rowmax = 0;
                for (long i = 0; i < tile_row_bytes; ++i) {
                    uint8_t d1 = (uint8_t)(fp[i] - rp[i]);
                    uint8_t d2 = (uint8_t)(rp[i] - fp[i]);
                    uint8_t d = fp[i] > rp[i] ? d1 : d2;
                    rowmax = d > rowmax ? d : rowmax;
                }
                maxd = rowmax > maxd ? rowmax : maxd;
                if (maxd > threshold) break;  // row-granular early exit
            }
            changed = maxd > threshold;
        }
        if (!changed) continue;
        idx_out[k] = t;
        uint8_t* out = tiles_out + static_cast<long>(k) * tile * tile_row_bytes;
        for (int r = 0; r < tile; ++r) {
            const uint8_t* fp = frame + base + r * row_bytes;
            std::memcpy(out + r * tile_row_bytes, fp, tile_row_bytes);
            std::memcpy(ref + base + r * row_bytes, fp, tile_row_bytes);
        }
        ++k;
    }
    return k;
}

// BGR888 -> TILED planar YUV420 (BT.601, same math as frameio_bgr_to_yuv420):
// dst is (num_tiles, tile*tile*3/2) where each row holds one tile's bytes as
// [Y tile*tile | U (tile/2)^2 | V (tile/2)^2], tiles row-major over the
// frame grid. Pairs with runtime/delta.py's YUV payload mode and
// ops/delta.untile_yuv_tiles on device. h % tile == 0, w % tile == 0,
// tile even.
void frameio_bgr_to_yuv_tiles(const uint8_t* src, int h, int w, int tile,
                              uint8_t* dst) {
    const int grid_w = w / tile;
    const int grid_h = h / tile;
    const int t2 = tile / 2;
    const int y_bytes = tile * tile;
    const int c_bytes = t2 * t2;
    const long row_sz = y_bytes + 2 * c_bytes;
    // pass 1: full planes via the vectorized row kernels
    std::vector<uint8_t> scratch(static_cast<size_t>(h) * w * 3 / 2);
    uint8_t* y_plane = scratch.data();
    uint8_t* u_plane = y_plane + static_cast<long>(h) * w;
    uint8_t* v_plane = u_plane + static_cast<long>(h) * w / 4;
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* p = src + static_cast<long>(yy) * w * 3;
        yuv_row_y(p, y_plane + static_cast<long>(yy) * w, w);
        if ((yy & 1) == 0) {
            long ci = static_cast<long>(yy / 2) * (w / 2);
            yuv_row_chroma(p, u_plane + ci, v_plane + ci, w / 2);
        }
    }
    // pass 2: reorder planes into per-tile records (pure memcpy)
    for (int ty = 0; ty < grid_h; ++ty) {
        for (int tx = 0; tx < grid_w; ++tx) {
            uint8_t* out = dst + (static_cast<long>(ty) * grid_w + tx) * row_sz;
            for (int yy = 0; yy < tile; ++yy) {
                std::memcpy(out + yy * tile,
                            y_plane + (static_cast<long>(ty) * tile + yy) * w +
                                static_cast<long>(tx) * tile,
                            tile);
            }
            uint8_t* u_out = out + y_bytes;
            uint8_t* v_out = u_out + c_bytes;
            for (int yy = 0; yy < t2; ++yy) {
                long ci = (static_cast<long>(ty) * t2 + yy) * (w / 2) +
                          static_cast<long>(tx) * t2;
                std::memcpy(u_out + yy * t2, u_plane + ci, t2);
                std::memcpy(v_out + yy * t2, v_plane + ci, t2);
            }
        }
    }
}

// Row-delta encode over contiguous fixed-size records (the YUV tile layout
// above: one record per tile). Same semantics as frameio_delta_encode but
// records are contiguous, so the branchless max-absdiff scan vectorizes
// cleanly. Updates ref in place; returns the number of records emitted.
int frameio_delta_encode_rows(const uint8_t* data, uint8_t* ref, int n_rows,
                              long row_bytes, int threshold,
                              int refresh_start, int refresh_count,
                              int32_t* idx_out, uint8_t* rows_out) {
    int k = 0;
    for (int t = 0; t < n_rows; ++t) {
        const uint8_t* dp = data + t * row_bytes;
        uint8_t* rp = ref + t * row_bytes;
        bool refresh = false;
        if (refresh_count > 0) {
            int rel = t - refresh_start;
            if (rel < 0) rel += n_rows;
            refresh = rel < refresh_count;
        }
        bool changed = refresh;
        if (!changed) {
            uint8_t maxd = 0;
            for (long i = 0; i < row_bytes; ++i) {
                uint8_t d1 = (uint8_t)(dp[i] - rp[i]);
                uint8_t d2 = (uint8_t)(rp[i] - dp[i]);
                uint8_t d = dp[i] > rp[i] ? d1 : d2;
                maxd = d > maxd ? d : maxd;
            }
            changed = maxd > threshold;
        }
        if (!changed) continue;
        idx_out[k] = t;
        std::memcpy(rows_out + static_cast<long>(k) * row_bytes, dp, row_bytes);
        std::memcpy(rp, dp, row_bytes);
        ++k;
    }
    return k;
}

}  // extern "C"
