"""Samplers match the reference distributions (SURVEY.md C7/C9/C15)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argon_monte_carlo_tpu import rng


def test_maxwell_speed_moments():
    a = 249.0
    speeds = rng.maxwell_speeds(jax.random.PRNGKey(0), 200_000, a,
                                jnp.float32)
    # Maxwell(a): mean = 2a sqrt(2/pi), E[v^2] = 3a^2.
    mean = float(jnp.mean(speeds))
    ms = float(jnp.mean(speeds**2))
    assert mean == pytest.approx(2 * a * math.sqrt(2 / math.pi), rel=5e-3)
    assert ms == pytest.approx(3 * a * a, rel=5e-3)


def test_maxwell_vs_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    a = 249.0
    speeds = np.asarray(
        rng.maxwell_speeds(jax.random.PRNGKey(1), 100_000, a, jnp.float32)
    )
    # KS test against scipy's maxwell with the reference's scale param
    # (Open_Air_Cube_MC.py:159).
    stat, pvalue = scipy_stats.kstest(
        speeds, scipy_stats.maxwell(scale=a).cdf
    )
    assert pvalue > 1e-3


def test_velocities_isotropic():
    v = rng.maxwell_velocities(jax.random.PRNGKey(2), 200_000, 249.0)
    mean = jnp.mean(v, axis=0)
    assert float(jnp.max(jnp.abs(mean))) < 2.0  # ~0 vs scale 249
    # Component variances equal.
    var = jnp.var(v, axis=0)
    np.testing.assert_allclose(np.asarray(var), 249.0**2, rtol=2e-2)


def test_uniform_disk():
    x, y = rng.uniform_disk(jax.random.PRNGKey(3), 100_000, 2.0)
    r2 = np.asarray(x**2 + y**2)
    assert r2.max() <= 4.0 + 1e-6
    # r^2 should be uniform on (0, R^2) for a uniform disk.
    assert np.mean(r2) == pytest.approx(2.0, rel=2e-2)


def test_orthonormal_frame():
    n = jax.random.normal(jax.random.PRNGKey(4), (1000, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    e1, e2 = rng.orthonormal_frame(n)
    for e in (e1, e2):
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(e, axis=-1)), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.sum(e * n, axis=-1)), 0.0, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(jnp.sum(e1 * e2, axis=-1)), 0.0, atol=1e-5
    )


def test_cone_directions_distribution():
    """Matches random_inbounds_direction (Temperature_Pore_MC.py:131-141):
    uniform over the 85-degree cap about the inward normal."""
    k = jax.random.PRNGKey(5)
    n = 200_000
    cos_max = math.cos(math.radians(85.0))
    axis = jnp.tile(jnp.asarray([[0.6, -0.64, 0.48]]), (n, 1))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    u = jax.random.uniform(k, (n, 2))
    d = rng.cone_directions(u, axis, cos_max)
    norms = np.asarray(jnp.linalg.norm(d, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    cos_t = np.asarray(jnp.sum(d * axis, axis=-1))
    # All within the cap and never within 5 degrees of the tangent plane.
    assert cos_t.min() >= cos_max - 1e-6
    assert cos_t.max() <= 1.0 + 1e-6
    # cos(theta) uniform on (cos_max, 1).
    assert np.mean(cos_t) == pytest.approx((1 + cos_max) / 2, abs=2e-3)
    hist, _ = np.histogram(cos_t, bins=20, range=(cos_max, 1.0))
    assert hist.min() > 0.8 * n / 20


def test_stratified_cube_init_matches_reference_scheme():
    """CubeConfig.stratified_init=True reproduces the reference's
    per-cell fill (Open_Air_Cube_MC.py:144-156): exactly floor(N/c^3)
    particles inside every init cell plus a uniform remainder, all in
    bounds, same single-particle distribution as the uniform default."""
    import argon_monte_carlo_tpu as amc
    from argon_monte_carlo_tpu.init import init_cube

    c = 5
    cfg = amc.CubeConfig(num_particles_override=5 ** 3 * 11 + 7,
                         stratified_init=True, init_cells_per_axis=c)
    state = init_cube(cfg, jax.random.PRNGKey(3))
    pos = np.asarray(state.pos)
    n = cfg.num_molecules
    assert pos.shape == (n, 3)
    L = cfg.geometry.lx
    assert pos.min() >= 0.0 and pos.max() <= L

    # The first c^3 * q rows are the per-cell block: each consecutive
    # q-row group lies inside its own cell.
    q = n // c ** 3
    cells = np.floor(pos[: c ** 3 * q] / (L / c)).astype(int)
    flat = cells[:, 0] * c * c + cells[:, 1] * c + cells[:, 2]
    expect = np.repeat(np.arange(c ** 3), q)
    np.testing.assert_array_equal(flat, expect)

    # Every cell holds >= q particles overall; per-axis mean near L/2.
    assert abs(pos.mean() - L / 2) < 0.02 * L
