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


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=10_000),
)
def test_png_roundtrip_property(w, h, ch, seed):
    """encode→decode is the identity for every shape/channel count the
    codec supports."""
    from lsd2_spark.sources import imagecodec as ic

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert (ic.decode_png(ic.encode_png(arr)) == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8, 16]),
    st.integers(min_value=0, max_value=10_000),
)
def test_wav_roundtrip_property(n, chans, bits, seed):
    """encode→decode recovers samples within the PCM quantization step
    and preserves frame/channel geometry and rate."""
    from lsd2_spark.sources import audiocodec as ac

    sig = np.random.default_rng(seed).uniform(-0.95, 0.95, (n, chans))
    dec, rate = ac.decode_wav(ac.encode_wav(sig, 12_345, bits=bits))
    assert rate == 12_345 and dec.shape == (n, chans)
    assert np.abs(dec - sig).max() <= 1.0 / (1 << (bits - 1))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=10_000),
)
def test_resize_nearest_property(w, h, out_w, out_h, seed):
    """Every output pixel is a genuine source pixel from the floor
    mapping, for any up/down-scale combination."""
    from lsd2_spark.sources.imagecodec import resize_nearest

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = resize_nearest(arr, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    assert (out == arr[rows][:, cols]).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=10_000),
)
def test_ppm_stream_roundtrip_property(n_frames, w, h, seed):
    """Concatenated encode→stream decode recovers every frame."""
    from lsd2_spark.sources import imagecodec as ic

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    got = ic.decode_ppm_stream(b"".join(ic.encode_ppm(f) for f in frames))
    assert len(got) == n_frames
    for a, b in zip(got, frames):
        assert (a == b).all()
