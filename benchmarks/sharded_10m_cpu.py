r"""VERDICT-r2 #1 proof: 10M rows through the SPMD sharded engine on an
8-virtual-device CPU mesh, within bounded per-device memory.

The round-2 sharded design held dense ``(rows_per_device, F)`` int32 tables
(~17 GB/device at 10M/8) and could not run this workload at all.  The
round-3 ``ShardedForest`` streams the input in windows and keeps per-device
state in the same sparse bounded structure as the single-chip ``BatchTree``
(packed tiles + sparse linear-sum pool), so per-device memory tracks the
*clusters a device discovers*, never the input size.

This script fits the cached 10M synthetic fingerprints (t=0.65 by default —
the regime with ~1M clusters/device, the memory worst case) over 8 virtual
CPU devices and reports wall time, cluster count, and the per-device
capacity-sized table bytes.  Run on a quiet host:

    python benchmarks/sharded_10m_cpu.py [n_millions] [threshold]

Reference semantics being scaled: ``/root/reference/bblean/multiround.py``
(bin-size-bounded per-worker state; here per-device capacity grows on
demand, decoupled from N).
"""

import os
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bblean_tpu.fingerprints import make_fake_fingerprints  # noqa: E402
from bblean_tpu.parallel import ShardedForest, get_mesh  # noqa: E402

SEED = 12620509540149709235
CACHE = Path(__file__).resolve().parent.parent / ".scratch" / "fps10m.npy"


def main() -> None:
    n_millions = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.65
    n = int(n_millions * 1_000_000)

    if CACHE.exists() and n <= 10_000_000:
        fps = np.load(CACHE, mmap_mode="r")[:n]
        print(f"using cached fingerprints ({CACHE})")
    else:
        fps = make_fake_fingerprints(n, seed=SEED)

    mesh = get_mesh(8)
    assert mesh.devices.size == 8, mesh
    forest = ShardedForest(
        2048,
        mesh,
        threshold=threshold,
        batch_size=4096,
        scan_batches=4,
        fanout=384,
        tile=512,
        initial_capacity=1 << 17,
        ls_capacity=1 << 15,
    )
    print(
        f"n={n} t={threshold} D=8 (virtual CPU) "
        f"window={8 * forest.scan_batches * forest.batch_size}"
    )
    t0 = time.perf_counter()
    forest.fit_packed(fps)
    fit_s = time.perf_counter() - t0
    print(f"fit: {fit_s:.1f} s = {n / fit_s:.0f} rows/s (8 shards, 1 core)")

    t0 = time.perf_counter()
    forest.merge()
    merge_s = time.perf_counter() - t0
    print(f"merge: {merge_s:.1f} s")

    labels = forest.labels()
    sizes = forest.cluster_sizes()
    assert labels.shape == (n,)
    assert int(sizes.sum()) == n, (sizes.sum(), n)
    per_dev = forest.state_bytes_per_device()
    print(
        f"clusters={forest.num_clusters} "
        f"capacity={forest.capacity} g_capacity={forest.g_capacity} "
        f"ls_capacity={forest.ls_capacity} "
        f"table_bytes_per_device={per_dev / 2**30:.2f} GiB"
    )
    # Bounded-memory claim: device tables must stay far below the dense
    # round-2 design's ~17 GiB/device
    assert per_dev < 6 * 2**30, per_dev
    print("OK")


if __name__ == "__main__":
    main()
