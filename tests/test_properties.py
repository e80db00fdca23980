"""Property-based tests (hypothesis) for the pure-python/numpy core.

No SparkSession anywhere — these check algebraic invariants of the kernels
the distributed operators are built from, over randomized inputs the
fixture corpora cannot enumerate.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoharvest_spark import index as ix

lons = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@given(lons, lats, st.integers(0, 9), st.integers(1, 4))
@settings(max_examples=200, deadline=None)
def test_ghcell_parent_containment(lon, lat, res, k):
    """The cell of a point at res r equals the parent of its cell at
    res r+k — the invariant the hierarchical tile rollup relies on."""
    child_res = res + k
    child = int(ix.ghcell_np(np.array([lon]), np.array([lat]), child_res)[0])
    parent_direct = int(ix.ghcell_np(np.array([lon]), np.array([lat]), res)[0])
    # parent via pure integer arithmetic (aperture-4: x>>k, y>>k)
    rem = child % ix.GHCELL_RES_BITS
    x, y = rem // ix.GHCELL_X_BITS, rem % ix.GHCELL_X_BITS
    parent_derived = (
        res * ix.GHCELL_RES_BITS
        + (x >> k) * ix.GHCELL_X_BITS
        + (y >> k)
    )
    assert parent_direct == parent_derived


@given(lons, lats, st.integers(0, 8), st.integers(1, 3))
@settings(max_examples=100, deadline=None)
def test_ghcell_kring_contains_center_and_wraps(lon, lat, res, k):
    cell = int(ix.ghcell_np(np.array([lon]), np.array([lat]), res)[0])
    ring = ix.ghcell_kring_np(cell, k)
    assert cell in ring
    nx, ny = ix.ghcell_nx(res), ix.ghcell_ny(res)
    rem = cell % ix.GHCELL_RES_BITS
    x0, y0 = rem // ix.GHCELL_X_BITS, rem % ix.GHCELL_X_BITS
    for c in ring:
        r = c % ix.GHCELL_RES_BITS
        x, y = r // ix.GHCELL_X_BITS, r % ix.GHCELL_X_BITS
        dx = min((x - x0) % nx, (x0 - x) % nx)  # antimeridian wrap
        assert dx <= k and abs(y - y0) <= k
        assert 0 <= y < ny


@given(lons, lats, st.integers(1, 30))
@settings(max_examples=200, deadline=None)
def test_s2_cell_level_and_parent_chain(lon, lat, level):
    """s2 ids carry their level in the lsb position, and the parent chain
    is consistent: the cell at level L-1 contains the cell at level L."""
    c = ix.s2_cell_np(np.array([lon]), np.array([lat]), level)
    assert int(ix.s2_level_np(c)[0]) == level
    if level > 1:
        cp = ix.s2_cell_np(np.array([lon]), np.array([lat]), level - 1)
        # parent derived from the child by truncation must equal direct
        lsb = np.uint64(1) << np.uint64(2 * (30 - (level - 1)))
        derived = (c.view(np.uint64) & ~(lsb - np.uint64(1))) | lsb
        assert int(derived.view(np.int64)[0]) == int(cp[0])


@given(
    st.lists(
        st.tuples(
            st.floats(-179, 179, allow_nan=False),
            st.floats(-89, 89, allow_nan=False),
        ),
        min_size=3,
        max_size=8,
    ),
    st.floats(-180, 180, allow_nan=False),
    st.floats(-90, 90, allow_nan=False),
)
@settings(max_examples=150, deadline=None)
def test_ray_cast_matches_scalar_reference(pts, qx, qy):
    """The vectorized (points x edges) ray cast equals a scalar even-odd
    reference on arbitrary (possibly self-intersecting) rings."""
    from geoharvest_spark.geo import points_in_ring

    ring = np.array(pts + pts[:1])

    def scalar_inside(px, py):
        inside = False
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                if px < xint:
                    inside = not inside
        return inside

    got = bool(points_in_ring(np.array([qx]), np.array([qy]), ring)[0])
    assert got == scalar_inside(qx, qy)


@given(st.lists(st.text(alphabet="abcXYZ ", min_size=1, max_size=8), max_size=12))
@settings(max_examples=150, deadline=None)
def test_dedupe_list_case_preference_properties(values):
    """dedupe keeps one value per casefold class, preferring Title > UPPER
    > lower (reference utils.py dedupe semantics), preserves first-seen
    order of classes, and is idempotent."""
    from geoharvest_spark.normalize.base import dedupe_list_of_values

    out = dedupe_list_of_values(values)
    # one entry per lower().strip() class, classes in first-seen order
    # (strip mirrors the reference's key derivation, utils.py:24-72)
    classes = []
    for v in values:
        k = v.lower().strip() if isinstance(v, str) else v
        if k not in classes:
            classes.append(k)
    out_classes = [v.lower().strip() if isinstance(v, str) else v for v in out]
    assert out_classes == classes
    # idempotent
    assert dedupe_list_of_values(out) == out


@given(st.integers(0, 10**9))
@settings(max_examples=100, deadline=None)
def test_minhash_params_in_field_range(seed):
    """Minhash affine params stay inside the 2^31-1 field for any seed, so
    products with 32-bit token hashes can never overflow int64 — the
    invariant the DuckDB oracle arithmetic depends on."""
    from geoharvest_spark.textops import _MINHASH_P, _minhash_params

    a, b = _minhash_params(64, seed=seed)
    assert (1 <= a).all() and (a < _MINHASH_P).all()
    assert (0 <= b).all() and (b < _MINHASH_P).all()
    assert int(a.max()) * (_MINHASH_P - 1) < 2**63 - 1
