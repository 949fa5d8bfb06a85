r"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that the multi-device sharded
paths can be exercised without TPU pod hardware (the same strategy the driver
uses for ``dryrun_multichip``).  These env vars must be set before JAX is
first imported anywhere in the test process.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).parent.parent))
