r"""Performance and memory regression guards for the host engines.

Modeled on the reference's regression suite
(``/root/reference/tests/test_regression.py:31-101``), which pins
process-time caps per fingerprint count and memray allocation
high-watermarks. memray is not available in this image, so the memory guard
uses a psutil RSS delta instead; caps are set at ~2x the values measured on
this box so a 2x slowdown/bloat fails while run-to-run noise does not.

Measured on the dev box (2026-08-16): 10k fps @ t=0.65 packed fit =
1.8 s native / 2.0 s python; RSS delta ~200 MB.
"""

import os
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import numpy as np
import pytest

from bblean_tpu.fingerprints import make_fake_fingerprints
from bblean_tpu.tree import BitBirch

REPO = Path(__file__).resolve().parent.parent

# (n_fps, native_cap_s, python_cap_s): ~2x measured dev-box process time
_TIME_CAPS = [
    (10_000, 3.6, 4.2),
    (20_000, 7.6, 9.9),
]

# RSS growth cap for a 10k-fps fit, ~2x measured (memray is unavailable;
# this is a coarse high-water guard, not an allocation profile)
_RSS_DELTA_CAP_MB = 450.0


def _fit_process_time(fps) -> float:
    tree = BitBirch(threshold=0.65)
    start = time.process_time()
    tree.fit(fps)
    return time.process_time() - start


@pytest.mark.parametrize("n_fps,native_cap,python_cap", _TIME_CAPS)
def test_fit_speed_native(n_fps, native_cap, python_cap, monkeypatch) -> None:
    from bblean_tpu.engine.native import native_engine_available

    if not native_engine_available():
        pytest.skip("native engine not built")
    monkeypatch.setenv("BBLEAN_TPU_NO_EXTENSIONS", "0")
    fps = make_fake_fingerprints(n_fps, seed=3, pack=True)
    elapsed = min(_fit_process_time(fps) for _ in range(2))
    assert elapsed < native_cap, (
        f"native fit of {n_fps} fps took {elapsed:.2f}s (cap {native_cap}s)"
    )


@pytest.mark.parametrize("n_fps,native_cap,python_cap", _TIME_CAPS)
def test_fit_speed_python(n_fps, native_cap, python_cap, monkeypatch) -> None:
    monkeypatch.setenv("BBLEAN_TPU_NO_EXTENSIONS", "1")
    fps = make_fake_fingerprints(n_fps, seed=3, pack=True)
    elapsed = min(_fit_process_time(fps) for _ in range(2))
    assert elapsed < python_cap, (
        f"python fit of {n_fps} fps took {elapsed:.2f}s (cap {python_cap}s)"
    )


def test_fit_memory_rss_delta() -> None:
    r"""A 10k-fps fit must not grow the process by more than the cap.

    Runs in a subprocess so interpreter/module baseline is excluded and
    prior tests' allocations cannot pollute the measurement.
    """
    code = textwrap.dedent(
        """
        import psutil
        from bblean_tpu.fingerprints import make_fake_fingerprints
        from bblean_tpu.tree import BitBirch

        proc = psutil.Process()
        fps = make_fake_fingerprints(10_000, seed=3, pack=True)
        before = proc.memory_info().rss
        BitBirch(threshold=0.65).fit(fps)
        after = proc.memory_info().rss
        print((after - before) / 2**20)
        """
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        env=dict(os.environ, BBLEAN_TPU_TEST_KEEP_PLATFORM="1"),
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    delta_mb = float(result.stdout.strip().splitlines()[-1])
    assert delta_mb < _RSS_DELTA_CAP_MB, (
        f"10k-fps fit grew RSS by {delta_mb:.0f} MB (cap {_RSS_DELTA_CAP_MB})"
    )


def test_batch_engine_insert_throughput_floor() -> None:
    r"""Gross-regression guard on the batched device engine (CPU backend):
    a 20k-row fit at t=0.65 must sustain at least 700 rows/s post-compile
    (measured ~1.4k on this box).  Skips when the host is already loaded —
    the XLA:CPU backend shares every core, so a wall-clock floor under
    external load measures the contention, not the engine."""
    if os.getloadavg()[0] > 0.75 * (os.cpu_count() or 1):
        pytest.skip("host under load; wall-clock floor would be meaningless")
    from bblean_tpu.engine.batch import BatchTree

    fps = make_fake_fingerprints(20_000, seed=5, pack=True)

    def run(packed):
        tree = BatchTree(2048, threshold=0.65, initial_capacity=1 << 15)
        tree.fit_packed(packed, range(len(packed)))
        return tree

    run(fps[:4096])  # warm-up compile
    # Best of 2 wall-clock runs: a single run is vulnerable to transient
    # host load (process time would be worse — XLA-CPU is multi-threaded,
    # so it sums every worker thread)
    elapsed = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        run(fps)
        elapsed = min(elapsed, time.perf_counter() - start)
    rate = len(fps) / elapsed
    assert rate > 700, f"batch engine: {rate:.0f} rows/s (floor 700)"
