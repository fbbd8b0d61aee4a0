"""Keep the remote Mosaic compile cache warm for bench.py's kernel.

The axon tunnel's remote compile service evicts unpredictably; a cold
compile of the headline Pallas kernel costs 150-650 s and can blow the
driver's bench time slot (round 1 recorded the matmul fallback for
exactly this reason — see VERDICT.md "What's weak" #1).  Running this
script periodically re-compiles the EXACT kernel + scan wrapper that
bench.py times (same shapes, same options, same persistent-cache dir),
so a subsequent bench.py run compiles in seconds.

Usage:  timeout 800 python tools/warm_compile.py
Exits 0 and prints one status line either way; safe to run in a loop.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    t0 = time.perf_counter()
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"warm_compile: not on TPU (platform={platform}); nothing to do")
        return

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, resolve_packed

    K, READ_LEN, BATCH, DISTINCT = 8, 150, 8192, 4
    pk = resolve_packed(True, READ_LEN - K + 1)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 4, size=(DISTINCT, BATCH, READ_LEN)).astype(np.int8)
    )

    @jax.jit
    def step_chk(x):
        _counts, chk = count_perread_pallas(
            x, K, packed=pk, read_block=16, checksum=True
        )
        return jnp.sum(chk)

    _ = int(np.asarray(step_chk(xs[0])))
    t_bare = time.perf_counter() - t0

    def run(xs):
        def body(c, i):
            return c + step_chk(xs[i % DISTINCT]), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(64))
        return c

    fn = jax.jit(run)
    _ = int(np.asarray(fn(xs)))
    print(
        f"warm_compile: bare kernel ready in {t_bare:.0f}s, "
        f"scan wrapper in {time.perf_counter() - t0 - t_bare:.0f}s"
    )


if __name__ == "__main__":
    main()
