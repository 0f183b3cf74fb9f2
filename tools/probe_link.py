"""Microbenchmark the host<->device link (axon relay or real PCIe).

Measures: H2D put latency vs payload size/compressibility, parallel-put
overlap across threads, and exec+readback round trip. Timing forces a
device->host readback (block_until_ready does not block on axon).
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def force_put_ms(arr: np.ndarray, reps: int = 3) -> float:
    """Median ms to put arr and observe it on device (touch 1 elem)."""
    @jax.jit
    def touch(x):
        return x.ravel()[0]
    touch(jnp.zeros((1,), arr.dtype))  # compile once
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jnp.asarray(arr)
        np.asarray(touch(x))
        times.append((time.perf_counter() - t0) * 1000)
    return sorted(times)[len(times) // 2]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)

    # baseline RTT: tiny payload
    tiny = rng.integers(0, 255, (64,), dtype=np.uint8)
    print(f"tiny put+touch RTT: {force_put_ms(tiny, 5):.1f} ms")

    # bandwidth + compressibility
    for mb in (1, 5, 10):
        n = mb * 1024 * 1024
        noise = rng.integers(0, 256, (n,), dtype=np.uint8)
        zeros = np.zeros((n,), np.uint8)
        # synthetic-frame-like: smooth + sigma-2 noise
        smooth = np.tile(rng.integers(60, 140, (n // 1024,), np.uint8), 1024)[:n]
        frames = (smooth.astype(np.int16) +
                  rng.normal(0, 2, n).astype(np.int16)).clip(0, 255).astype(np.uint8)
        # delta-like: 99% zeros, 1% random
        delta = np.zeros((n,), np.uint8)
        idx = rng.integers(0, n, n // 100)
        delta[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
        print(f"{mb}MB  noise={force_put_ms(noise):.0f}ms  "
              f"frame={force_put_ms(frames):.0f}ms  "
              f"zeros={force_put_ms(zeros):.0f}ms  "
              f"sparse-delta={force_put_ms(delta):.0f}ms")

    # parallel puts: do N concurrent 5MB puts overlap?
    n = 5 * 1024 * 1024
    payloads = [rng.integers(0, 256, (n,), dtype=np.uint8) for _ in range(4)]

    @jax.jit
    def touch(x):
        return x.ravel()[0]

    def one(arr):
        np.asarray(touch(jnp.asarray(arr)))

    one(payloads[0])  # warm
    t0 = time.perf_counter()
    for p in payloads:
        one(p)
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=one, args=(p,)) for p in payloads]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    par = time.perf_counter() - t0
    print(f"4x5MB serial={serial*1000:.0f}ms  parallel={par*1000:.0f}ms  "
          f"overlap={serial/par:.2f}x")

    # exec round trip: jitted matmul on resident data
    a = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))

    @jax.jit
    def mm(x):
        return (x @ x).sum()

    np.asarray(mm(a))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(mm(a))
    print(f"exec+readback RTT: {(time.perf_counter()-t0)/5*1000:.1f} ms")


if __name__ == "__main__":
    main()
