r"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that the multi-device sharded
paths can be exercised without TPU pod hardware (the same strategy the driver
uses for ``dryrun_multichip``).

Note: this environment force-registers a TPU PJRT plugin and pins
``JAX_PLATFORMS=axon`` at interpreter start, so the env var alone is not
enough — ``jax.config.update("jax_platforms", "cpu")`` after import is what
actually re-pins tests to CPU.  XLA_FLAGS must still be set before the CPU
client is first created.

Set ``BBLEAN_TPU_TEST_PLATFORM=axon`` (or any platform name) to run the
suite on real hardware instead — ``make test-tpu`` runs the device-kernel
and batch-engine tests on the real chip this way.  Multi-device tests
detect the single-chip case and skip themselves.
"""

import os
import sys
from pathlib import Path

_platform = os.environ.get("BBLEAN_TPU_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: the sharded SPMD programs take minutes to
# compile on a 1-core CPU host.  The cache lives IN-REPO (committed for the
# expensive entries) so a fresh environment's cold `make test` skips the
# multi-minute shard_map compiles; stale entries (different jaxlib) are
# ignored by XLA's cache key, costing nothing but disk.  The committed
# entries were built with jax/jaxlib 0.9.0 on linux-x86_64 (CPU PJRT) —
# on any other jaxlib/platform they are dead weight and the first run
# re-populates the cache locally (see tests/.jax_cache/README.md).
jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
