"""refine_hot_cells — the automatic coverage-map skew lever.

The bench ``crossmatch_skew`` probe proved a HAND-refined map under a
50x-density hot cell is a >3x wall win with identical pair sets; at
100 TB nobody hand-refines, so the planner grows an automatic step
that splits any cell whose projected pair count (rows1 x rows2 from
the plan-sized density histograms) exceeds a bound.  Pure driver math
— no Spark session needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lsd2_spark.plans.partition_map import refine_hot_cells

ORDER_K = 4


def _descendants(o: int, p: int, target_o: int) -> set[int]:
    d = 2 * (target_o - o)
    return set(range(p << d, (p + 1) << d))


def _covered_kpix(hips: dict[int, list[int]]) -> list[set[int]]:
    """Per-cell order_k footprints (for disjointness + union checks)."""
    return [
        _descendants(o, p, ORDER_K) for o in sorted(hips) for p in hips[o]
    ]


def test_hot_pixel_splits_and_cold_cells_survive():
    # uniform background: 10 rows in every order-2 pixel, both sides;
    # one hot order-2 pixel with 10_000 rows per side
    npix2 = 12 * 4**2
    hot2 = 7
    kpix, counts = [], []
    for p2 in range(npix2):
        k = p2 << 4  # one occupied order-4 child per order-2 pixel
        kpix.append(k)
        counts.append(10_000 if p2 == hot2 else 10)
    hips = {2: list(range(npix2))}
    refined = refine_hot_cells(
        hips,
        np.array(kpix), np.array(counts),
        np.array(kpix), np.array(counts),
        order_k=ORDER_K,
        max_pairs_per_cell=1e6,  # 10k*10k = 1e8 trips; 10*10 doesn't
        max_cell_order=ORDER_K,
    )
    # every cold cell survives at order 2
    assert set(refined[2]) == set(range(npix2)) - {hot2}
    # the hot subtree was split; its footprint is exactly preserved
    split = [
        (o, p)
        for o in refined
        for p in refined[o]
        if o > 2 and (p >> (2 * (o - 2))) == hot2
    ]
    assert split, "hot cell was not split"
    foot = set()
    for o, p in split:
        foot |= _descendants(o, p, ORDER_K)
    assert foot == _descendants(2, hot2, ORDER_K)
    # the dense order-4 child sits alone in its own cell now
    assert (4, hot2 << 4) in split


def test_noop_when_bound_is_large():
    hips = {1: list(range(48))}
    kpix = np.arange(0, 48 << 6, 1 << 6)
    counts = np.full(48, 1000)
    refined = refine_hot_cells(
        hips, kpix, counts, kpix, counts,
        order_k=ORDER_K, max_pairs_per_cell=1e12, max_cell_order=ORDER_K,
    )
    assert refined == {1: list(range(48))}


def test_zero_on_one_side_never_splits():
    # pair count is a PRODUCT: a dense left cell with an empty right
    # side projects zero kernel work and must not split
    hips = {2: [0]}
    kpix = np.array([0])
    big = np.array([10**9])
    refined = refine_hot_cells(
        hips, kpix, big, np.array([1 << 4]), np.array([10**9]),
        order_k=ORDER_K, max_pairs_per_cell=1.0, max_cell_order=ORDER_K,
    )
    assert refined == {2: [0]}


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    bound=st.floats(1.0, 1e9),
    cap=st.integers(2, ORDER_K),
)
def test_refinement_tiles_exactly_and_respects_bound(seed, bound, cap):
    rng = np.random.default_rng(seed)
    # random sparse order-4 histograms over a 12-base-pixel order-1 map
    n = rng.integers(1, 200)
    kpix = rng.choice(12 * 4**ORDER_K, size=n, replace=False)
    c1 = rng.integers(1, 10**5, size=n)
    c2 = rng.integers(1, 10**5, size=n)
    hips = {1: list(range(12 * 4))}
    refined = refine_hot_cells(
        hips, kpix, c1, kpix, c2,
        order_k=ORDER_K, max_pairs_per_cell=bound, max_cell_order=cap,
    )
    foots = _covered_kpix(refined)
    # disjoint cells...
    total = sum(len(f) for f in foots)
    union = set().union(*foots)
    assert total == len(union)
    # ...that tile exactly the input sky
    assert union == set().union(*_covered_kpix(hips))
    # every cell at an order below the cap meets the bound
    per1 = dict(zip(kpix.tolist(), c1.tolist()))
    per2 = dict(zip(kpix.tolist(), c2.tolist()))
    for o in refined:
        for p in refined[o]:
            if o < cap:
                kids = _descendants(o, p, ORDER_K)
                r1 = sum(per1.get(k, 0) for k in kids)
                r2 = sum(per2.get(k, 0) for k in kids)
                assert r1 * r2 <= bound
