"""Hypothesis property tests for the pure driver-side math the whole
engine leans on: HEALPix pixelization, pixel algebra, distance bounds,
and the deterministic sampling primitives.  (The Spark-side oracle gate
covers query plans; these fuzz the numeric foundations directly.)"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import lsd2_spark.healpix as hpx

_ra = st.floats(min_value=0.0, max_value=360.0, exclude_max=True,
                allow_nan=False, allow_infinity=False)
_dec = st.floats(min_value=-90.0, max_value=90.0,
                 allow_nan=False, allow_infinity=False)
_order = st.integers(min_value=0, max_value=16)


@settings(max_examples=200, deadline=None)
@given(_ra, _dec, _order)
def test_ang2pix_in_range_and_hierarchy(ra, dec, order):
    """Every position maps to a valid pixel, and the parent at any
    coarser order is the bit-shifted pixel (nested-scheme hierarchy —
    the invariant the crossmatch single-pass assignment relies on)."""
    p = hpx.ang2pix(order, np.array([ra]), np.array([dec]))[0]
    assert 0 <= p < hpx.npix(order)
    for coarser in range(order + 1):
        pc = hpx.ang2pix(coarser, np.array([ra]), np.array([dec]))[0]
        assert pc == (p >> (2 * (order - coarser)))


@settings(max_examples=100, deadline=None)
@given(_ra, _dec, _order)
def test_pix2ang_roundtrip_within_pixel(ra, dec, order):
    """The pixel center re-pixelizes to the same pixel, and the input
    point is within max_pixrad of the center."""
    p = hpx.ang2pix(order, np.array([ra]), np.array([dec]))
    cra, cdec = hpx.pix2ang(order, p)
    assert hpx.ang2pix(order, cra, cdec)[0] == p[0]
    d = hpx.gc_dist_deg(np.array([ra]), np.array([dec]), cra, cdec)[0]
    assert d <= hpx.max_pixrad(order) * (1 + 1e-9)


@settings(max_examples=100, deadline=None)
@given(_ra, _dec, _ra, _dec)
def test_gc_dist_metric_properties(ra1, dec1, ra2, dec2):
    """Distance is symmetric, bounded by 180°, and zero on identity."""
    a = hpx.gc_dist_deg(np.array([ra1]), np.array([dec1]), np.array([ra2]), np.array([dec2]))[0]
    b = hpx.gc_dist_deg(np.array([ra2]), np.array([dec2]), np.array([ra1]), np.array([dec1]))[0]
    assert abs(a - b) < 1e-9
    assert -1e-12 <= a <= 180.0 + 1e-9
    assert hpx.gc_dist_deg(np.array([ra1]), np.array([dec1]), np.array([ra1]), np.array([dec1]))[0] < 1e-6


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10), st.integers(min_value=0, max_value=10_000))
def test_parent_children_inverse_property(order, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, hpx.npix(order), 5).astype(np.int64)
    kids = hpx.children(pix, 2)
    assert (hpx.parent(kids, 2) == pix[:, None]).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**62), st.text(max_size=8))
def test_deterministic_uniform_is_stable_and_bounded(doc_id, salt):
    """The sampling uniform depends only on (id, salt) and stays in
    [0, 1) — computed via the same md5 math the Column expr uses."""
    import hashlib

    h = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:15], 16)
    u = h / float(1 << 60)
    assert 0.0 <= u < 1.0
    h2 = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:15], 16)
    assert h == h2
