"""TPU availability + capability probe.

Measures what the solve-path optimizations depend on:
  - tunnel upload/download bandwidth (MB/s) at a few sizes
  - dispatch round-trip latency
  - whether f64 dot_general / einsum work on this TPU (emulated), and
    their cost relative to f32 — gates the device-side f64 refinement
    residual design.

Usage: python benchmarks/probe_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # Upload bandwidth
    for mb in (4, 32):
        a = np.random.default_rng(0).standard_normal(
            mb * 1024 * 1024 // 4).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(a, dev)
        d.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"upload   {mb:3d} MB: {dt:6.2f}s  {mb/dt:7.1f} MB/s",
              flush=True)
        # Download bandwidth
        t0 = time.perf_counter()
        _ = np.asarray(d)
        dt = time.perf_counter() - t0
        print(f"download {mb:3d} MB: {dt:6.2f}s  {mb/dt:7.1f} MB/s",
              flush=True)

    # Async-ness of uploads: does jnp.asarray return before the
    # transfer completes?  (The eager start_upload overlap depends on
    # it.)
    a = np.random.default_rng(2).standard_normal(
        32 * 1024 * 1024 // 4).astype(np.float32)
    t0 = time.perf_counter()
    d = jnp.asarray(a)
    t_call = time.perf_counter() - t0
    d.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"asarray 32MB: call returns {t_call:.3f}s, complete "
          f"{t_total:.3f}s ({'ASYNC' if t_call < 0.5 * t_total else 'SYNC'})",
          flush=True)

    # Dispatch round-trip
    tiny = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    f(tiny).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(tiny)
    r.block_until_ready()
    print(f"dispatch rt: {(time.perf_counter()-t0)/20*1e3:.2f} ms",
          flush=True)

    # f64 capability + cost: (n, k) @ (k, k) matvec-ish shapes like the
    # DIA slab contraction.
    rng = np.random.default_rng(1)
    for dt_ in ("float32", "float64"):
        try:
            x = jnp.asarray(rng.standard_normal((1024, 128)), dtype=dt_)
            w = jnp.asarray(rng.standard_normal((128, 128)), dtype=dt_)
            g = jax.jit(lambda a, b: a @ b)
            y = g(x, w)
            y.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(50):
                y = g(x, w)
            y.block_until_ready()
            dt = (time.perf_counter() - t0) / 50
            print(f"dot {dt_}: ok  {dt*1e6:.0f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"dot {dt_}: FAILED ({type(e).__name__}: {e})",
                  flush=True)

    # f64 elementwise + reduction (the einsum-style fallback)
    try:
        x = jnp.asarray(rng.standard_normal((2048, 128)))
        w32 = jnp.asarray(
            rng.standard_normal((2048, 128)).astype(np.float32))
        h = jax.jit(lambda a, b: (a * b.astype(jnp.float64)).sum(axis=1))
        y = h(x, w32)
        y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            y = h(x, w32)
        y.block_until_ready()
        print(f"f64 elementwise*reduce: ok  "
              f"{(time.perf_counter()-t0)/50*1e6:.0f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"f64 elementwise: FAILED ({e})", flush=True)


if __name__ == "__main__":
    main()
