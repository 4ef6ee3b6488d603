"""Dispatch-overhead investigation (VERDICT r2 item 8).

On the axon tunnel, per-dispatch overhead scales with program size
(PERF_NOTES round 1: 10 encoder passes = 83 ms/pass inside one jit vs
1391 ms/pass as separate dispatches). This script separates the variables:

  1. overhead vs UNROLL FACTOR: one tiny op chained k times in one program,
     dispatched back-to-back chained — wall minus in-graph compute gives the
     per-dispatch overhead as a function of program size;
  2. scan vs unroll: the same k-times-repeated body as a lax.scan (program
     contains ONE body copy) — if overhead is proportional to serialized
     program size, scan recovers it; the residual is scan's own per-iteration
     fixed cost (~8 ms in round 1 — re-measured here);
  3. arg-count sensitivity: same program called with params as one fused
     array vs hundreds of leaves — tests whether per-dispatch cost is
     host-side pytree/buffer-handle work.

Usage: python scripts/bench_dispatch.py [size scan args]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _cache():
    import os

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _wall(fn, x, n=6):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)  # chained across dispatches: output feeds next input
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def body(x, w):
    # one representative op: a real matmul so in-graph compute is measurable
    return jnp.tanh(x @ w)


def bench_size():
    w = jnp.asarray(np.random.RandomState(0).randn(1024, 1024), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(1024, 1024), jnp.float32)

    print("unrolled-k program, chained dispatches (wall per dispatch):")
    walls = {}
    for k in (1, 4, 16, 64):
        @jax.jit
        def fn(x, k=k):
            for _ in range(k):
                x = body(x, w)
            return x

        walls[k] = _wall(fn, x)
        print(f"  k={k:3d}: {walls[k]*1e3:8.1f} ms/dispatch")
    # in-graph marginal from the k-slope; the rest is per-dispatch overhead
    marg = (walls[64] - walls[16]) / 48
    for k in (1, 4, 16, 64):
        print(f"  k={k:3d}: overhead ~= {(walls[k] - marg*k)*1e3:8.1f} ms "
              f"(marginal {marg*1e6:.0f} us/iter)")


def bench_scan():
    w = jnp.asarray(np.random.RandomState(0).randn(1024, 1024), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(1024, 1024), jnp.float32)

    print("scan-k program, chained dispatches (wall per dispatch):")
    for k in (16, 64, 256):
        @jax.jit
        def fn(x, k=k):
            return jax.lax.scan(lambda c, _: (body(c, w), None), x,
                                None, length=k)[0]

        wall = _wall(fn, x)
        print(f"  k={k:3d}: {wall*1e3:8.1f} ms/dispatch "
              f"({wall/k*1e3:.2f} ms/iter incl. overhead)")


def bench_args():
    rng = np.random.RandomState(0)
    n_leaves = 256
    leaves = [jnp.asarray(rng.randn(64, 64), jnp.float32) for _ in range(n_leaves)]
    fused = jnp.stack(leaves)
    x = jnp.asarray(rng.randn(64, 64), jnp.float32)

    @jax.jit
    def many(x, leaves):
        for l in leaves[:8]:
            x = jnp.tanh(x @ l)
        s = sum(jnp.sum(l) for l in leaves)
        return x + s * 1e-30

    @jax.jit
    def one(x, fused):
        for i in range(8):
            x = jnp.tanh(x @ fused[i])
        return x + jnp.sum(fused) * 1e-30

    wm = _wall(lambda x: many(x, leaves), x)
    wo = _wall(lambda x: one(x, fused), x)
    print(f"args: {n_leaves} leaves {wm*1e3:.1f} ms/dispatch vs "
          f"1 fused {wo*1e3:.1f} ms/dispatch")


def bench_const():
    """Closed-over device arrays become HLO CONSTANTS; if the tunnel's
    per-dispatch cost scales with serialized program size, a big embedded
    constant should inflate every dispatch even though the compute is
    identical to the as-argument version."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1024, 1024), jnp.float32)
    for mb in (4, 64):
        n = mb * 1024 * 1024 // (1024 * 4)
        big = jnp.asarray(rng.randn(n, 1024).astype(np.float32))

        @jax.jit
        def as_const(x):
            return jnp.tanh(x @ big[:1024]) + jnp.sum(big) * 1e-30

        @jax.jit
        def as_arg(x, big):
            return jnp.tanh(x @ big[:1024]) + jnp.sum(big) * 1e-30

        wc = _wall(as_const, x)
        wa = _wall(lambda xx: as_arg(xx, big), x)
        print(f"const {mb:3d} MB: embedded {wc*1e3:8.1f} ms/dispatch vs "
              f"argument {wa*1e3:8.1f} ms/dispatch")


def main():
    _cache()
    which = sys.argv[1:] or ["size", "scan", "args", "const"]
    if "size" in which:
        bench_size()
    if "scan" in which:
        bench_scan()
    if "args" in which:
        bench_args()
    if "const" in which:
        bench_const()


if __name__ == "__main__":
    main()
