"""Property tests for the geometry layer against closed forms.

Covers the (dims x geometry) matrix combinatorially — the reference can only
exercise one combination per build (compile-time #if, Src/geometry.c).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mcrat_tpu.config import Config, Dims, Geometry
from mcrat_tpu import geometry as geo


def _cfg(dims, geom):
    return Config(dims=dims, geometry=geom)


ALL_COMBOS = [
    (Dims.TWO, Geometry.CARTESIAN),
    (Dims.TWO, Geometry.CYLINDRICAL),
    (Dims.TWO, Geometry.SPHERICAL),
    (Dims.TWO_POINT_FIVE, Geometry.CYLINDRICAL),
    (Dims.TWO_POINT_FIVE, Geometry.SPHERICAL),
    (Dims.THREE, Geometry.CARTESIAN),
    (Dims.THREE, Geometry.SPHERICAL),
    (Dims.THREE, Geometry.POLAR),
]


@pytest.mark.parametrize("dims,geom", ALL_COMBOS)
def test_roundtrip_hydro_to_mcrat(dims, geom, rng):
    """hydro -> mcrat -> hydro is the identity for in-range coordinates."""
    cfg = _cfg(dims, geom)
    n = 256
    if geom is Geometry.CARTESIAN and dims is Dims.THREE:
        r0 = rng.uniform(-1, 1, n)
        r1 = rng.uniform(-1, 1, n)
        r2 = rng.uniform(-1, 1, n)
    elif geom is Geometry.SPHERICAL:
        r0 = rng.uniform(0.1, 10, n)
        r1 = rng.uniform(0.01, np.pi - 0.01, n)
        r2 = rng.uniform(0.01, 2 * np.pi - 0.01, n) if dims is Dims.THREE else rng.uniform(
            0, 2 * np.pi, n
        )
    elif geom is Geometry.POLAR:
        r0 = rng.uniform(0.1, 10, n)
        r1 = rng.uniform(0.01, 2 * np.pi - 0.01, n)
        r2 = rng.uniform(-5, 5, n)
    else:  # 2-D cartesian/cylindrical: r0 = cylindrical radius >= 0, r1 = z
        r0 = rng.uniform(0.1, 10, n)
        r1 = rng.uniform(-5, 5, n)
        r2 = rng.uniform(0, 2 * np.pi, n)  # phi passed through in 2-D

    x, y, z = geo.hydro_to_mcrat(cfg, jnp.asarray(r0), jnp.asarray(r1), jnp.asarray(r2))
    b0, b1, b2 = geo.mcrat_to_hydro(cfg, x, y, z)
    np.testing.assert_allclose(np.asarray(b0), r0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b1), r1, rtol=1e-10, atol=1e-12)
    if dims is Dims.THREE:
        np.testing.assert_allclose(np.asarray(b2), r2, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("dims,geom", ALL_COMBOS)
def test_spherical_radius_matches_cartesian_norm(dims, geom, rng):
    cfg = _cfg(dims, geom)
    n = 128
    x = rng.uniform(0.1, 5, n)
    y = rng.uniform(0.1, 5, n)
    z = rng.uniform(0.1, 5, n)
    h0, h1, h2 = geo.mcrat_to_hydro(cfg, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    r, theta = geo.hydro_to_spherical(cfg, h0, h1, h2)
    r_expect = np.sqrt(x * x + y * y + z * z)
    np.testing.assert_allclose(np.asarray(r), r_expect, rtol=1e-10)
    theta_expect = np.arccos(z / r_expect)
    np.testing.assert_allclose(np.asarray(theta), theta_expect, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("dims,geom", ALL_COMBOS)
def test_vector_transform_preserves_magnitude(dims, geom, rng):
    """Orthonormal basis change must preserve |v| (2-D drops nothing: v2 unused)."""
    cfg = _cfg(dims, geom)
    n = 128
    v0 = rng.uniform(-1, 1, n)
    v1 = rng.uniform(-1, 1, n)
    v2 = rng.uniform(-1, 1, n)
    x0 = rng.uniform(0.1, 5, n)
    x1 = rng.uniform(0.1, np.pi - 0.1, n)
    x2 = rng.uniform(0, 2 * np.pi, n)
    cx, cy, cz = geo.hydro_vector_to_cartesian(
        cfg, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(x2)
    )
    got = np.sqrt(np.asarray(cx) ** 2 + np.asarray(cy) ** 2 + np.asarray(cz) ** 2)
    if dims is Dims.TWO:
        # 2-D uses only (v0, v1) — and explicitly zeroes any phi-component.
        expect = np.sqrt(v0 * v0 + v1 * v1)
    else:
        expect = np.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_radial_vector_points_radially_2d_spherical(rng):
    """A pure r-hat vector in 2-D spherical must point along the position vector."""
    cfg = _cfg(Dims.TWO, Geometry.SPHERICAL)
    n = 64
    r = rng.uniform(1, 10, n)
    th = rng.uniform(0.05, np.pi / 2, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    vx, vy, vz = geo.hydro_vector_to_cartesian(
        cfg, jnp.ones(n), jnp.zeros(n), jnp.zeros(n), jnp.asarray(r), jnp.asarray(th), jnp.asarray(phi)
    )
    px, py, pz = geo.hydro_to_mcrat(cfg, jnp.asarray(r), jnp.asarray(th), jnp.asarray(phi))
    pos = np.stack([px, py, pz], -1)
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    vec = np.stack([vx, vy, vz], -1)
    np.testing.assert_allclose(vec, pos, atol=1e-12)


def test_volume_sums_to_shell_2d_spherical():
    """Sum of 2-D spherical cell volumes over a (r, theta) tiling = shell volume."""
    cfg = _cfg(Dims.TWO, Geometry.SPHERICAL)
    nr, nt = 50, 40
    r_edges = np.linspace(1.0, 2.0, nr + 1)
    t_edges = np.linspace(0.0, np.pi, nt + 1)
    rc = 0.5 * (r_edges[:-1] + r_edges[1:])
    tc = 0.5 * (t_edges[:-1] + t_edges[1:])
    R, T = np.meshgrid(rc, tc, indexing="ij")
    dr = np.full_like(R, r_edges[1] - r_edges[0])
    dt = np.full_like(T, t_edges[1] - t_edges[0])
    v = geo.element_volume(
        cfg, jnp.asarray(R.ravel()), jnp.asarray(T.ravel()), 0.0, jnp.asarray(dr.ravel()), jnp.asarray(dt.ravel()), 0.0
    )
    expect = 4.0 / 3.0 * np.pi * (2.0**3 - 1.0**3)
    np.testing.assert_allclose(float(jnp.sum(v)), expect, rtol=1e-12)


def test_volume_sums_to_annulus_2d_cylindrical():
    cfg = _cfg(Dims.TWO, Geometry.CYLINDRICAL)
    nr, nz = 30, 20
    r_edges = np.linspace(0.0, 3.0, nr + 1)
    z_edges = np.linspace(0.0, 2.0, nz + 1)
    rc = 0.5 * (r_edges[:-1] + r_edges[1:])
    zc = 0.5 * (z_edges[:-1] + z_edges[1:])
    R, Z = np.meshgrid(rc, zc, indexing="ij")
    dr = np.full_like(R, r_edges[1] - r_edges[0])
    dz = np.full_like(Z, z_edges[1] - z_edges[0])
    v = geo.element_volume(
        cfg, jnp.asarray(R.ravel()), jnp.asarray(Z.ravel()), 0.0, jnp.asarray(dr.ravel()), jnp.asarray(dz.ravel()), 0.0
    )
    expect = np.pi * 3.0**2 * 2.0
    np.testing.assert_allclose(float(jnp.sum(v)), expect, rtol=1e-12)


def test_in_block():
    ok = geo.in_block(
        jnp.array([1.0, 1.6]), jnp.array([2.0, 2.0]), 0.0,
        1.0, 2.0, 0.0, 1.0, 1.0, 0.0, use_r2=False,
    )
    assert bool(ok[0]) and not bool(ok[1])


def test_uniform_rectilinear_index_matches_searchsorted():
    """Arithmetic O(1) point location on uniform axes must agree with the
    binary search everywhere, including points near cell seams."""
    import dataclasses

    from mcrat_tpu.grid import build_rectilinear_index

    e0 = np.linspace(0.0, 3.2e11, 161)
    e1 = np.linspace(1.8e12, 2.9e12, 513)
    idx = build_rectilinear_index(e0, e1, dtype="float32")
    assert idx.uniform[0] and idx.uniform[1]
    # force the searchsorted path on an otherwise identical index
    idx_ss = dataclasses.replace(idx, uniform=(False, False, False))

    rng = np.random.default_rng(5)
    r0 = np.concatenate([
        rng.uniform(-1e10, 3.3e11, 20000),
        e0.astype(np.float32),           # exactly on seams
        e0.astype(np.float32) + 1.0,     # just inside
    ]).astype(np.float32)
    r1 = np.concatenate([
        rng.uniform(1.79e12, 2.91e12, r0.size - e1.size * 2),
        e1.astype(np.float32),
        e1.astype(np.float32) - 1.0,
    ]).astype(np.float32)
    a = np.asarray(idx.find(jnp.asarray(r0), jnp.asarray(r1), 0.0, None, None))
    b = np.asarray(idx_ss.find(jnp.asarray(r0), jnp.asarray(r1), 0.0, None, None))
    # in/out decisions are identical by construction (same `inside` test);
    # assigned cells may differ only for points within float32 rounding of a
    # seam, where either neighbor is acceptable — the seam-loaded samples
    # above are ~6% of the population, so the disagreement rate must stay
    # below that, and every disagreement must be a +/-1 neighbor flip
    disagree = a != b
    assert disagree.mean() < 0.07
    ij_a = np.stack(np.divmod(a[disagree], 512), -1)
    ij_b = np.stack(np.divmod(b[disagree], 512), -1)
    assert np.all(np.abs(ij_a - ij_b) <= 1)


def test_nonuniform_axis_falls_back_to_searchsorted():
    from mcrat_tpu.grid import build_rectilinear_index

    e0 = np.geomspace(1e10, 1e13, 101)  # log spacing: not uniform
    e1 = np.linspace(0.0, 1.0, 33)
    idx = build_rectilinear_index(e0, e1)
    assert not idx.uniform[0] and idx.uniform[1]
    r0 = np.geomspace(1.1e10, 0.9e13, 5000)
    r1 = np.full_like(r0, 0.5)
    got = np.asarray(idx.find(jnp.asarray(r0), jnp.asarray(r1), 0.0, None, None))
    want_i = np.searchsorted(e0, r0, side="right") - 1
    np.testing.assert_array_equal(got, want_i * 32 + 16)
