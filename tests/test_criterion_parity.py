r"""Near-threshold device/host merge-criterion parity (SURVEY §7 hard-part d).

The device predicates (``ops/merges.py``) run in float32; the host criteria
(``_merges.py``) run in float64 over exact uint64 integer sums.  A decision
can only differ where rounding moves the cohesion across the threshold, so
this suite pins the size of that band with an adversarial grid:

- Constructed clusters with ``c`` features at count ``x`` (rest zero) have
  EXACT rational iSIM ``(x - 1) / (2n - x - 1)`` independent of ``c``, so
  integer sweeps of ``x`` sample the threshold neighborhood at ~``1/(2n)``
  spacing while ``c = F`` maximizes the f32 reduction error (K ~ c*x,
  Ksq ~ c*x^2).
- Ground truth is arbitrary-precision (``fractions.Fraction``); both the
  f32 device path and the f64 host path are graded against it.

Asserted contract: outside a ``PARITY_BAND`` relative band around the
threshold, the f32 device decision equals the exact rational decision for
every case up to 10M-member clusters at full 2048-bit width; inside the
band flips may occur (they are also measured and reported via the assert
message on failure).  The measured worst flip in this grid is ~1e-7
relative; the asserted band keeps 30x headroom.

Also pinned: the adaptive-tolerance decay (``tolerance-diameter`` knees at
``old_n`` in {1, 2, n_max-1, n_max, n_max+1}) where the f32 ``exp`` and the
f64 host ``exp`` are compared at decision level.
"""

import math
from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp

from bblean_tpu._merges import get_merge_accept_fn
from bblean_tpu.ops.merges import merge_accept_batch

F = 2048
# Device-decision flips vs the exact rational decision may only happen
# within this relative distance of the threshold (measured worst case in
# this grid: ~1.2e-7 at n=10M, c=2048; 30x headroom on top)
PARITY_BAND = 4e-6


def _case(n: int, x: int, c: int = F):
    r"""Cluster of ``n`` members whose linear sum has ``c`` features at
    ``x`` (rest 0).  Exact iSIM: a/(a + nK - Ksq) with K = c*x,
    Ksq = c*x^2, a = (Ksq - K)/2  ==  (x-1)/(2n - x - 1)."""
    ls = np.zeros(F, dtype=np.int64)
    ls[:c] = x
    isim = Fraction(x - 1, 2 * n - x - 1)
    return ls, isim


def _x_for(n: int, s: float) -> int:
    r"""Integer count whose exact iSIM is nearest ``s``."""
    return max(2, round((s * (2 * n - 1) + 1) / (1 + s)))


def _sweep_cases(threshold: float, n: int, halfwidth: int = 60):
    x0 = _x_for(n, threshold)
    for x in range(max(2, x0 - halfwidth), min(n, x0 + halfwidth + 1)):
        yield _case(n, x)


@pytest.mark.parametrize("threshold", [0.3, 0.65])
@pytest.mark.parametrize("n", [1_000, 100_000, 10_000_000])
def test_diameter_screen_band(threshold: float, n: int) -> None:
    r"""f32 device diameter decisions == exact rational decisions outside
    the parity band; f64 host decisions likewise (tighter)."""
    host_fn = get_merge_accept_fn("diameter")
    cases = list(_sweep_cases(threshold, n))
    ls_rows = np.stack([ls for ls, _ in cases])
    n_rows = np.full(len(cases), n, dtype=np.int64)

    dev = np.asarray(
        merge_accept_batch(
            "diameter",
            jnp.float32(threshold),
            jnp.asarray(ls_rows, dtype=jnp.int32),
            jnp.asarray(n_rows, dtype=jnp.int32),
            jnp.asarray(ls_rows, dtype=jnp.int32),  # old: unused by screen
            jnp.asarray(n_rows, dtype=jnp.int32),
            jnp.ones(len(cases), dtype=jnp.int32),
        )
    )
    thr_frac = Fraction(threshold).limit_denominator(10**12)
    for i, (ls, isim) in enumerate(cases):
        true_accept = isim >= thr_frac
        # nom contribution: the screen uses new_ls/new_n directly, so the
        # constructed row IS the merged candidate
        host_accept = bool(
            host_fn(
                threshold,
                ls.astype(np.uint64),
                n,
                ls.astype(np.uint64),
                np.zeros(F, dtype=np.uint64),
                n - 1,
                1,
            )
        )
        rel_dist = abs(float(isim) - threshold)
        if rel_dist > PARITY_BAND:
            assert bool(dev[i]) == true_accept, (
                f"f32 flip outside band: n={n} isim={float(isim):.9f} "
                f"threshold={threshold} dist={rel_dist:.2e}"
            )
            assert host_accept == true_accept, (
                f"f64 flip outside band: n={n} isim={float(isim):.9f}"
            )


@pytest.mark.parametrize("threshold", [0.3, 0.65])
def test_diameter_screen_flip_rate_measured(threshold: float) -> None:
    r"""Measure (not just bound) the worst-case f32 flip distance over the
    adversarial grid; regression-guard it under PARITY_BAND."""
    worst = 0.0
    flips = total = 0
    for n in (1_000, 100_000, 10_000_000):
        cases = list(_sweep_cases(threshold, n))
        ls_rows = np.stack([ls for ls, _ in cases])
        n_rows = np.full(len(cases), n, dtype=np.int64)
        dev = np.asarray(
            merge_accept_batch(
                "diameter",
                jnp.float32(threshold),
                jnp.asarray(ls_rows, dtype=jnp.int32),
                jnp.asarray(n_rows, dtype=jnp.int32),
                jnp.asarray(ls_rows, dtype=jnp.int32),
                jnp.asarray(n_rows, dtype=jnp.int32),
                jnp.ones(len(cases), dtype=jnp.int32),
            )
        )
        thr_frac = Fraction(threshold).limit_denominator(10**12)
        for i, (_ls, isim) in enumerate(cases):
            total += 1
            if bool(dev[i]) != (isim >= thr_frac):
                flips += 1
                worst = max(worst, abs(float(isim) - threshold))
    assert worst <= PARITY_BAND, (
        f"worst f32 flip distance {worst:.2e} exceeds the documented "
        f"band {PARITY_BAND:.0e} ({flips}/{total} flips)"
    )


@pytest.mark.parametrize("old_n", [1, 2, 999, 1000, 1001, 10_000])
@pytest.mark.parametrize("threshold", [0.3, 0.65])
def test_adaptive_tolerance_knees(threshold: float, old_n: int) -> None:
    r"""tolerance-diameter decisions at the decay knees: f32 device vs f64
    host on merged rows whose exact iSIM brackets ``old_c - tol``."""
    host_fn = get_merge_accept_fn("tolerance-diameter", tolerance=0.05)
    n_new = max(old_n + 1, 64)
    cases = list(_sweep_cases(threshold, n_new, halfwidth=40))
    # Old cluster: same construction at a slightly higher cohesion so the
    # tolerance comparison (new_c >= old_c - tol) is the binding test
    old_x = _x_for(old_n, min(0.95, threshold + 0.02)) if old_n > 1 else 1
    old_ls = np.zeros(F, dtype=np.int64)
    old_ls[:F] = old_x
    ls_rows = np.stack([ls for ls, _ in cases])
    n_rows = np.full(len(cases), n_new, dtype=np.int64)
    dev = np.asarray(
        merge_accept_batch(
            "tolerance-diameter",
            jnp.float32(threshold),
            jnp.asarray(ls_rows, dtype=jnp.int32),
            jnp.asarray(n_rows, dtype=jnp.int32),
            jnp.asarray(np.broadcast_to(old_ls, ls_rows.shape), jnp.int32),
            jnp.full(len(cases), old_n, dtype=jnp.int32),
            jnp.ones(len(cases), dtype=jnp.int32),
            tolerance=0.05,
        )
    )
    mismatches = []
    for i, (ls, isim) in enumerate(cases):
        host_accept = bool(
            host_fn(
                threshold,
                ls.astype(np.uint64),
                n_new,
                old_ls.astype(np.uint64),
                np.zeros(F, dtype=np.uint64),
                old_n,
                n_new - old_n,
            )
        )
        if bool(dev[i]) != host_accept:
            mismatches.append(float(isim))
    # Host f64 and device f32 may flip within the band of EITHER binding
    # comparison: the screen (new_c >= threshold) or the tolerance keep
    # (new_c >= old_c - tol).  Measure each mismatch's distance to its
    # NEAREST binding knee; everything farther than the band must agree.
    if mismatches:
        knees = [threshold]
        if old_n > 1:
            old_c = float(Fraction(old_x - 1, 2 * old_n - old_x - 1))
            tol = max(
                0.05 * (math.exp(-1e-3 * old_n) - math.exp(-1e-3 * 1000)),
                0.0,
            )
            knees.append(old_c - tol)
        dists = [min(abs(s - k) for k in knees) for s in mismatches]
        assert max(dists) <= PARITY_BAND * 2, (
            f"tolerance-diameter mismatch beyond band at old_n={old_n}: "
            f"isims={mismatches[:5]} knees={knees}"
        )
