"""Diagnostic: per-dispatch latency and the closed-over-constant trap.

On a tunneled TPU (axon), a jitted function that CLOSES OVER a concrete
device array (any ``jax.Array`` leaf captured from Python scope, even a
scalar) permanently drops the whole process out of the fast dispatch path:
~0.026 ms/dispatch before, ~2 ms/dispatch after — for EVERY executable in
the process, not just the offending one. Measured 2026-08-16 on TPU v5e;
the effect cost bench.py a 21x throughput loss (107.7 -> 2269.9 pairs/s
once fixed).

Rule enforced across the library: jit-time constants must be Python
numbers or numpy arrays (weak-typed, baked into the HLO) — device arrays
enter jitted code only as ARGUMENTS. Closures over *tracers* inside an
enclosing jit are fine.

Run: python scripts/probe_dispatch_latency.py
Healthy output: every row < 0.1 ms except the matmul; if "after poison"
rows jump to ~2 ms the trap still exists in your jax/runtime version.
"""

import time

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=20):
    # NOTE: jax.block_until_ready is a NO-OP on the tunneled axon platform
    # (a 75 s matmul chain "blocks" in 0 ms) — only a host fetch of a value
    # actually waits for completion. The scalar fetch below is the sync.
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.time() - t0) / n
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    x = jnp.ones((128, 128))
    triv = jax.jit(lambda a: a + 1.0)
    bench("trivial jit (fresh process)", triv, x)

    m = jnp.ones((2048, 2048), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    bench("matmul 2048 bf16", mm, m)

    # the poison: close over a device-array scalar constant
    c = jnp.float32(2.5)  # ArrayImpl scalar
    poison = jax.jit(lambda a: a * c)
    bench("poison (closes over ArrayImpl scalar)", poison, x)

    bench("trivial jit (after poison)", triv, x)
    bench("matmul 2048 bf16 (after poison)", mm, m)

    big = jnp.ones((512, 512))
    poison2 = jax.jit(lambda a: a[:128, :128] + big[:128, :128])
    bench("poison2 (closes over 1MB array)", poison2, x)
    bench("trivial jit (after poison2)", triv, x)


if __name__ == "__main__":
    main()
