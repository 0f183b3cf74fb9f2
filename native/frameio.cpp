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

// BGR888 -> planar YUV420 (BT.601). dst must hold h*w*3/2 bytes; h, w even.
void frameio_bgr_to_yuv420(const uint8_t* src, int h, int w, uint8_t* dst) {
    uint8_t* y_plane = dst;
    uint8_t* u_plane = dst + static_cast<long>(h) * w;
    uint8_t* v_plane = u_plane + static_cast<long>(h) * w / 4;
    for (int yy = 0; yy < h; ++yy) {
        for (int xx = 0; xx < w; ++xx) {
            const uint8_t* p = src + (static_cast<long>(yy) * w + xx) * 3;
            float b = p[0], g = p[1], r = p[2];
            float yv = 0.299f * r + 0.587f * g + 0.114f * b;
            y_plane[static_cast<long>(yy) * w + xx] =
                static_cast<uint8_t>(std::min(std::max(yv, 0.f), 255.f) + 0.5f);
            if ((yy & 1) == 0 && (xx & 1) == 0) {
                float u = (b - yv) * 0.564f + 128.f;
                float v = (r - yv) * 0.713f + 128.f;
                long ci = static_cast<long>(yy / 2) * (w / 2) + xx / 2;
                u_plane[ci] = static_cast<uint8_t>(
                    std::min(std::max(u, 0.f), 255.f) + 0.5f);
                v_plane[ci] = static_cast<uint8_t>(
                    std::min(std::max(v, 0.f), 255.f) + 0.5f);
            }
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
            for (int r = 0; r < tile && !changed; ++r) {
                const uint8_t* fp = frame + base + r * row_bytes;
                const uint8_t* rp = ref + base + r * row_bytes;
                for (long i = 0; i < tile_row_bytes; ++i) {
                    int d = static_cast<int>(fp[i]) - static_cast<int>(rp[i]);
                    if (d < 0) d = -d;
                    if (d > threshold) { changed = true; break; }
                }
            }
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

}  // extern "C"
