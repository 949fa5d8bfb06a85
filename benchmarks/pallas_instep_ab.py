r"""A/B: in-step sorted Pallas tile search vs the fused XLA gather.

Runs the 1M bench workload twice (same capacities as bench.py), with
``use_pallas_search`` off and on.  Round-2 measured the kernel 3.6-15x
faster standalone but ~5% SLOWER in-step because of its per-round argsort;
round 3 hoists the sort plan to once per step (``sorted_search_plan``), so
this measures whether the kernel now wins inside the fused scan.

    python benchmarks/pallas_instep_ab.py [threshold]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.30
    n = 1_000_000

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bblean_tpu.engine.batch import BatchTree
    from bblean_tpu.fingerprints import make_fake_fingerprints

    fps = make_fake_fingerprints(n, seed=12620509540149709235)
    dev = jax.device_put(fps)
    jax.block_until_ready(dev)
    cap = 1 << 21 if threshold >= 0.5 else 1 << 19

    def run(use_pallas: bool) -> tuple[float, int]:
        def build():
            return BatchTree(
                2048, threshold=threshold, batch_size=8192,
                initial_capacity=cap, ls_capacity=1 << 18,
                use_pallas_search=use_pallas,
            )

        warm = build()
        if use_pallas and not warm.use_pallas_search:
            raise SystemExit("pallas probe failed on this backend")
        warm.fit_packed(dev[: 1 << 16], range(1 << 16))
        jax.block_until_ready(warm.state.n)
        del warm
        best = (float("inf"), 0)
        for _ in range(2):
            tree = build()
            t0 = time.perf_counter()
            tree.fit_packed(dev, range(n))
            num = tree.num_clusters
            dt = time.perf_counter() - t0
            best = min(best, (dt, num))
            del tree
        return best

    dt_x, num_x = run(False)
    dt_p, num_p = run(True)
    print(
        f"t={threshold}: XLA gather {n / dt_x:,.0f} fps/s ({dt_x:.2f}s, "
        f"{num_x} clusters) | pallas {n / dt_p:,.0f} fps/s ({dt_p:.2f}s, "
        f"{num_p} clusters) | speedup x{dt_x / dt_p:.3f}"
    )


if __name__ == "__main__":
    main()
