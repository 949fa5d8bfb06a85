r"""Multi-device (SPMD) clustering over ``jax.sharding`` meshes.

The TPU-native replacement for the reference's multiprocessing + files-on-disk
parallel pipeline (``bblean/multiround.py``): fingerprints are sharded over a
1-D data-parallel mesh axis, every device builds its own CF-tree shard with
the batched engine, CF buffers are exchanged with ``all_gather`` over ICI,
and a merge pass re-clusters the gathered buffers — all inside one compiled
SPMD program.
"""

from bblean_tpu.parallel.mesh import get_mesh
from bblean_tpu.parallel.sharded import sharded_fit, ShardedClusters

__all__ = ["get_mesh", "sharded_fit", "ShardedClusters"]
