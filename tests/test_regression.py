r"""Performance and memory regression guards for the host engines.

Modeled on the reference's regression suite
(``/root/reference/tests/test_regression.py:31-101``), which pins
process-time caps per fingerprint count and memray allocation
high-watermarks.  memray is not available in this image, so the memory
guard uses a psutil RSS delta instead.

Every cap below pins a constant measured ON THIS BOX (1-core CI host,
2026-08-17, box idle) at ~1.8x the measurement, so a 2x regression in any
engine fails while run-to-run noise does not:

    native exact engine  10k fps @ t=0.65: 0.37 s   (27.0k fps/s)
    native exact engine  20k fps @ t=0.65: 0.70 s   (28.7k fps/s)
    python exact engine  10k fps @ t=0.65: 1.46 s   ( 6.8k fps/s)
    python exact engine  20k fps @ t=0.65: 3.20 s   ( 6.3k fps/s)
    batch engine (XLA:CPU) 20k rows @ t=0.65: 20.5 s (976 rows/s)
    RSS delta, 10k-fps python fit: ~200 MB

All speed guards use ``time.process_time`` (CPU time of this process), not
wall clock: external host load cannot inflate it, so the guards hold in a
loaded CI instead of skipping themselves.  On this 1-core box process time
== wall time for the XLA:CPU engine as well.
"""

import os
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

from bblean_tpu.fingerprints import make_fake_fingerprints
from bblean_tpu.tree import BitBirch

REPO = Path(__file__).resolve().parent.parent

# (n_fps, native_cap_s, python_cap_s): ~1.8x measured process time (above)
_TIME_CAPS = [
    (10_000, 0.67, 2.7),
    (20_000, 1.30, 5.8),
]

# RSS growth cap for a 10k-fps fit, ~1.5x measured
_RSS_DELTA_CAP_MB = 300.0

# Batch engine (XLA:CPU): ~1.8x the 20.5 s measured -> 540 rows/s floor
_BATCH_ROWS_PER_CPU_SECOND_FLOOR = 540.0


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
    monkeypatch.delenv("BBLEAN_TPU_NO_EXTENSIONS", raising=False)
    monkeypatch.delenv("BITBIRCH_NO_EXTENSIONS", raising=False)
    fps = make_fake_fingerprints(n_fps, seed=3, pack=True)
    # The engine must actually be the native one (a selection regression
    # once made this test silently measure the python engine)
    probe = BitBirch(threshold=0.65)
    probe.fit(fps[:64])
    assert type(probe._engine).__name__ == "NativeExactTree"
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


@pytest.mark.parametrize("n_fps", [10_000, 15_000, 20_000, 25_000])
def test_fit_memory_rss_delta(n_fps) -> None:
    r"""A fit must not grow the process by more than ~linear-in-rows caps
    (the reference pins memray high-watermarks at 43/63/86/105 MB for
    10k/15k/20k/25k; RSS includes allocator slack, hence the headroom).

    Runs in a subprocess so interpreter/module baseline is excluded and
    prior tests' allocations cannot pollute the measurement.
    """
    code = textwrap.dedent(
        f"""
        import psutil
        from bblean_tpu.fingerprints import make_fake_fingerprints
        from bblean_tpu.tree import BitBirch

        proc = psutil.Process()
        fps = make_fake_fingerprints({n_fps}, seed=3, pack=True)
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
    cap = _RSS_DELTA_CAP_MB * n_fps / 10_000
    assert delta_mb < cap, (
        f"{n_fps}-fps fit grew RSS by {delta_mb:.0f} MB (cap {cap:.0f})"
    )


def test_batch_engine_insert_throughput_floor() -> None:
    r"""Gross-regression guard on the batched device engine (CPU backend):
    a 20k-row fit at t=0.65 must sustain the measured CPU-time rate.  CPU
    time (all threads of this process) is immune to external host load, so
    this guard never skips itself."""
    from bblean_tpu.engine.batch import BatchTree

    fps = make_fake_fingerprints(20_000, seed=5, pack=True)

    def run(packed):
        tree = BatchTree(2048, threshold=0.65, initial_capacity=1 << 15)
        tree.fit_packed(packed, range(len(packed)))
        return tree

    run(fps[:4096])  # warm-up compile
    elapsed = float("inf")
    for _ in range(2):
        start = time.process_time()
        run(fps)
        elapsed = min(elapsed, time.process_time() - start)
    rate = len(fps) / elapsed
    assert rate > _BATCH_ROWS_PER_CPU_SECOND_FLOOR, (
        f"batch engine: {rate:.0f} rows per CPU-second "
        f"(floor {_BATCH_ROWS_PER_CPU_SECOND_FLOOR})"
    )
