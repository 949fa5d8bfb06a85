r"""Microbenchmark: the per-batch group-route cost as the group count grows.

The route (`engine/batch.py::_route_groups`) is an argmax Tanimoto over live
group centroids — a tiled MXU matmul of (M, F) bf16 rows against (G_live, F)
bf16 centroids, paid once per batch step.  The 10M t=0.65 run decays
77k -> 56k fps/s as G grows to 43k (ROADMAP), and this isolates how much of
that is the route itself, plus what an int8 MXU path (centroids are exactly
0/1, so int8 is value-identical) would buy.

Usage: python benchmarks/route_cost.py [block]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)

from bblean_tpu.engine.batch import _route_groups

M = 8192
F = 2048
G_CAP = 1 << 16


def main() -> None:
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    row_cent = jnp.asarray(
        rng.integers(0, 2, (M, F)).astype(np.float32), dtype=jnp.bfloat16
    )
    g_cent = jnp.asarray(
        rng.integers(0, 2, (G_CAP, F)).astype(np.float32), dtype=jnp.bfloat16
    )
    row_pop = jnp.asarray(rng.integers(600, 900, (M,)), dtype=jnp.int32)
    g_pops = jnp.asarray(rng.integers(600, 900, (G_CAP,)), dtype=jnp.int32)
    pending = jnp.ones((M,), dtype=bool)

    route = jax.jit(_route_groups, static_argnames=("block",))

    for g_live in (4096, 8192, 16384, 32768, 43008, 65536):
        g_num = jnp.int32(g_live)
        out = route(
            row_cent, row_pop, g_cent, g_pops, g_num, pending, block=block
        )
        # np.asarray, not block_until_ready: through the axon tunnel
        # block_until_ready returns before device execution completes, so
        # only a readback of the LAST output (device programs execute in
        # dispatch order on one stream) is a true barrier
        _ = np.asarray(out)
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = route(
                row_cent, row_pop, g_cent, g_pops, g_num, pending, block=block
            )
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_rep
        flops = 2.0 * M * g_live * F
        print(
            f"G={g_live:6d}: {dt * 1e3:8.2f} ms/batch  "
            f"({flops / dt / 1e12:6.1f} Tflop/s)  "
            f"route share at 8192 rows/batch: "
            f"{dt / (8192 / 120_000):.1%} of a 120k-fps/s batch budget"
        )


if __name__ == "__main__":
    main()
