r"""JAX/XLA/Pallas device ops — the TPU compute path.

Design: the reference's hot kernels (C++ popcount/Tanimoto loops,
``bblean/csrc/similarity.cpp``) do not translate to TPU; instead:

- Similarity *search* (many fps vs many centroids) is an MXU matmul over
  unpacked 0/1 int8/bf16 planes: ``|x & y| == <x, y>`` for binary vectors
  (``bblean_tpu.ops.tanimoto``).
- Packed-domain reductions (popcount, AND+popcount for a few vectors) run on
  the VPU via ``lax.population_count`` over int32 lanes
  (``bblean_tpu.ops.popcount``).
- iSIM / merge-criteria evaluation is batched elementwise arithmetic over
  candidate linear sums (``bblean_tpu.ops.isim``, ``bblean_tpu.ops.merges``).
- Bit pack/unpack is shift/compare arithmetic (``bblean_tpu.ops.packing``).
"""

from bblean_tpu.ops.packing import pack_fingerprints_device, unpack_fingerprints_device
from bblean_tpu.ops.popcount import popcount_device, popcount_rows
from bblean_tpu.ops.tanimoto import (
    tanimoto_matmul,
    tanimoto_packed_arr_vec,
)
from bblean_tpu.ops.isim import (
    isim_from_sums,
    isim_radius_compl_from_sums,
)

__all__ = [
    "pack_fingerprints_device",
    "unpack_fingerprints_device",
    "popcount_device",
    "popcount_rows",
    "tanimoto_matmul",
    "tanimoto_packed_arr_vec",
    "isim_from_sums",
    "isim_radius_compl_from_sums",
]
