r"""Headline benchmark: fingerprints clustered per second on TPU.

Config mirrors the reference's speed-regression setting (seeded synthetic
2048-bit fingerprints, diameter merge — reference caps its own C++ path at
10k fps in < 0.9 s on CI, i.e. ~11.1k fps/s single-core; see BASELINE.md).

Runs the depth-2 batched TPU engine end-to-end (upload packed fps once, then
level-synchronous batch insertion with host-side topology control), timing
everything after a small warm-up that triggers compilation.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference anchor: 10k fps / 0.9 s (C++ ext, single core) — BASELINE.md
BASELINE_FPS_PER_S = 10_000 / 0.9

N_FPS = 500_000
N_FEATURES = 2048
THRESHOLD = 0.65
SEED = 12620509540149709235


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bblean_tpu.engine.batch import BatchTree
    from bblean_tpu.fingerprints import make_fake_fingerprints

    import jax.numpy as jnp

    fps = make_fake_fingerprints(N_FPS, n_features=N_FEATURES, seed=SEED)
    # Stage the packed fps in HBM up-front (the reference's speed-regression
    # benchmark likewise times fit() with fps already resident in RAM); the
    # timed region below is pure clustering work
    dev_fps = jax.device_put(jnp.asarray(fps))
    jax.block_until_ready(dev_fps)

    batch_size = 8192
    # Warm-up: one full fit compiles every program and settles the device
    # memory arena (the reference's speed-regression methodology likewise
    # times repeat in-process runs, reference tests/test_regression.py)
    warm = BatchTree(
        N_FEATURES,
        threshold=THRESHOLD,
        batch_size=batch_size,
        initial_capacity=1 << 20,
    )
    warm.split_interval = 8
    warm.fit_packed(dev_fps, range(N_FPS))
    del warm

    tree = BatchTree(
        N_FEATURES,
        threshold=THRESHOLD,
        batch_size=batch_size,
        initial_capacity=1 << 20,  # ~N singletons at threshold 0.65: no growth
    )
    tree.split_interval = 8
    t0 = time.perf_counter()
    tree.fit_packed(dev_fps, range(N_FPS))
    num = tree.num_clusters  # device sync
    dt = time.perf_counter() - t0

    value = N_FPS / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"fps_clustered_per_sec_{N_FPS // 1000}k_x{N_FEATURES}bit"
                    f"_diameter_t{THRESHOLD}"
                ),
                "value": round(value, 1),
                "unit": "fingerprints/s",
                "vs_baseline": round(value / BASELINE_FPS_PER_S, 2),
                "wall_s": round(dt, 2),
                "n_clusters": int(num),
                "n_groups": tree.num_groups,
            }
        )
    )


if __name__ == "__main__":
    main()
