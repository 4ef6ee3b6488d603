"""Measure the BN sharding deviation (VERDICT r2 weak #5 -> r3 item 9).

Trains the tiny synthetic config twice with the SAME global batch stream:
  A) 1 device   — BN batch statistics over the full global batch
  B) 8 devices  — shard_map data parallelism, per-device BN stats
     (torch-DDP semantics; 1 sample/device here = worst case)

and reports the loss-curve deviation. Run on CPU:
  python scripts/measure_bn_deviation.py [steps]

Writes TB scalars for both runs under /tmp/bn_deviation/{1dev,8dev} and
prints a summary line. Results recorded in PERF_NOTES.md round 3.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main(steps=200):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_training import make_batch, small_opts

    from doubletake_tpu.runners import common
    from doubletake_tpu.training import train_loop

    opts = small_opts()
    opts.lr = 1e-4
    model = common.build_model(opts)
    tx, _ = train_loop.make_optimizer(opts)
    batch = make_batch(opts, 8)
    cur, src = train_loop._train_batch(*batch)

    curves = {}
    for name, mesh in (("1dev", None), ("8dev", train_loop.data_mesh())):
        state = train_loop.init_train_state(opts, model, tx, batch)
        step_fn = train_loop.make_train_step(model, tx, mesh,
                                             use_hint_model=True)
        losses = []
        for i in range(steps):
            rng = jax.random.PRNGKey(1000 + i)
            state, ld = step_fn(state, cur, src, rng)
            losses.append(float(ld["loss"]))
        curves[name] = np.asarray(losses)

        writer = train_loop._make_writer(
            os.path.join("/tmp/bn_deviation", name)
        )
        for i, l in enumerate(losses):
            train_loop._write_scalars(writer, {"loss": l}, i)

    a, b = curves["1dev"], curves["8dev"]
    tail = slice(steps // 2, None)
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-8)
    print(f"steps={steps}")
    print(f"final loss: 1dev {a[-1]:.5f}  8dev {b[-1]:.5f}")
    print(f"mean |rel dev|: full {rel.mean():.4f}  tail {rel[tail].mean():.4f}")
    print(f"max  |rel dev|: {rel.max():.4f}")
    print(f"both decreasing: {a[-1] < a[0]} {b[-1] < b[0]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
