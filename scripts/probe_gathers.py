"""Platform probe: gather cost vs row width/count on the TPU.

Informs the raycast formulation (PERF_NOTES.md): XLA lowers generic
gathers to serial per-row loops here, so the viable designs gather few,
wide rows. All timings are chained in-graph (out feeds next iteration's
input) — unchained dispatch timing is meaningless on this tunnel.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def chained_time(fn, args, iters=8):
    """Median in-graph time per call by chaining fn through a carry."""

    @jax.jit
    def chained(carry, args):
        def body(c, _):
            out = fn(*args, c)
            return out, None

        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out

    carry = jnp.zeros((), jnp.float32)
    out = np.asarray(chained(carry, args))  # compile + hard fetch
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(chained(carry, args))  # only a real fetch blocks here
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)

    for (nrows, width, n_idx) in [
        (4096, 128, 100_000),
        (4096, 128, 500_000),
        (40_000, 128, 100_000),
        (40_000, 8, 100_000),
        (40_000, 8, 500_000),
        (262_144, 128, 100_000),
        (4096, 512, 100_000),
    ]:
        table = jnp.asarray(rng.randn(nrows, width).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, nrows, size=n_idx).astype(np.int32))

        def f(table, idx, c):
            rows = jnp.take(table, idx + (c.astype(jnp.int32) % 2), axis=0)
            return rows.sum()

        t = chained_time(f, (table, idx))
        per_row = t / n_idx * 1e9
        print(f"take rows: table ({nrows}x{width}), {n_idx} rows: "
              f"{t*1e3:.2f} ms ({per_row:.2f} ns/row)")

    # one-hot matmul extraction: (S, Z) weights @ z-columns
    for (n_pix, S, Z) in [(12_288, 64, 128), (12_288, 256, 128)]:
        cols = jnp.asarray(rng.randn(n_pix, Z).astype(np.float32))
        wts = jnp.asarray(rng.randn(S, Z).astype(np.float32) / Z)

        def f(cols, wts, c):
            # per-pixel z-profile extraction as a dense matmul
            out = jnp.einsum("nz,sz->ns", cols + c, wts,
                             precision=jax.lax.Precision.DEFAULT)
            return out.sum()

        t = chained_time(f, (cols, wts))
        print(f"one-hot matmul ({n_pix}px, S={S}, Z={Z}): {t*1e3:.2f} ms")

    # dynamic_slice loop: many small slices (per-sample dynamic slice)
    table = jnp.asarray(rng.randn(40_000, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 39_000, size=1024).astype(np.int32))

    def f(table, idx, c):
        def body(i, acc):
            row = jax.lax.dynamic_slice(table, (idx[i] + c.astype(jnp.int32) % 2, 0), (8, 128))
            return acc + row.sum()

        return jax.lax.fori_loop(0, 1024, body, 0.0)

    t = chained_time(f, (table, idx))
    print(f"dyn-slice (8x128) x1024: {t*1e3:.2f} ms ({t/1024*1e6:.1f} us/slice)")


if __name__ == "__main__":
    main()
