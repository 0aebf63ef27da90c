"""L0 physics constants vs values derivable from the reference scripts."""

import math

import numpy as np
import pytest

from argon_monte_carlo_tpu import physics
from argon_monte_carlo_tpu.geometry import CubeGeometry, PoreGeometry
from argon_monte_carlo_tpu.utils import debye


def test_argon_radius():
    # Open_Air_Cube_MC.py:49 quotes 1.692568750643269e-10 m.
    assert physics.CUBE_PHYSICS.argon_radius == pytest.approx(
        1.692568750643269e-10, rel=1e-12
    )


def test_mean_free_path():
    # Open_Air_Cube_MC.py:53: lambda ~ 79.7nm.
    assert physics.CUBE_PHYSICS.lambda_mfp == pytest.approx(
        7.9718889e-08, rel=1e-6
    )


def test_v_mean_rms_formula():
    # Reference "mean speed" = sqrt(3RT/M) (Open_Air_Cube_MC.py:54).
    v = physics.CUBE_PHYSICS.v_mean
    assert v == pytest.approx(
        math.sqrt(3 * 8.3145 * 298 / 0.039948), rel=1e-12
    )
    assert v == pytest.approx(431.36, rel=1e-4)


def test_cube_molecule_count():
    # Open_Air_Cube_MC.py:57 prints 24627 for the 100nm cube.
    assert physics.CUBE_PHYSICS.num_molecules(CubeGeometry().volume) == 24627


def test_pore_molecule_count():
    # SURVEY.md C5: 557,649 molecules for the default pore stack.
    n = physics.PORE_PHYSICS.num_molecules(PoreGeometry().volume)
    assert n == 557649


def test_pore_segment_partition():
    # SURVEY.md C5: open-air 174,079 each, cold 204,717, hot 2,088,
    # gap 2,683 + remainder to the top segment.
    g = PoreGeometry()
    n = physics.PORE_PHYSICS.num_molecules(g.volume)
    counts = g.segment_particle_counts(n)
    assert counts["open_air_bottom"] == 174079
    assert counts["cold"] == 204717
    assert counts["hot"] == 2088
    assert counts["gap"] == 2683
    assert sum(counts.values()) == n


def test_timesteps():
    from argon_monte_carlo_tpu.config import CubeConfig, PoreConfig

    cube = CubeConfig()
    assert cube.num_timesteps == 500
    assert cube.dt == pytest.approx(7.392e-12, rel=1e-3)
    pore = PoreConfig()
    assert pore.num_timesteps == 20000
    assert pore.dt == pytest.approx(1.848e-13, rel=1e-3)


def test_debye_integral_vs_mpmath():
    mp = pytest.importorskip("mpmath")
    for upper in (0.5, 1813.0 / 353.0, 1813.0 / 293.0, 980.0 / 300.0):
        expected = float(
            mp.quad(lambda x: x**3 / (mp.exp(x) - 1), [0, upper])
        )
        got = float(debye.debye_integral(np.array(upper)))
        assert got == pytest.approx(expected, rel=1e-10)


def test_surface_energies_vs_reference_formula():
    """E_surf for the graphene coatings (Temperature_Pore_MC.py:83-84).

    SURVEY.md C18 quotes E_cold(293K)=1.7463e-21 J, E_hot(353K)=3.2454e-21 J.
    """
    kb = physics.BOLTZMANN_TEMP_PORE
    e_cold = float(debye.surface_energy(293.0, 1813.0, 2, kb))
    e_hot = float(debye.surface_energy(353.0, 1813.0, 2, kb))
    assert e_cold == pytest.approx(1.7463e-21, rel=1e-3)
    assert e_hot == pytest.approx(3.2454e-21, rel=1e-3)


def test_gap_energy_table_interpolation():
    table = debye.GapEnergyTable.build(
        gap_bottom=130e-9, gap_top=160e-9, t_hot=353.0, t_cold=293.0,
        boltzmann=physics.BOLTZMANN_TEMP_PORE,
    )
    # Midpoint temperature 323K; direct evaluation must match interp.
    import jax.numpy as jnp

    from argon_monte_carlo_tpu.ops.walls import gap_energy_interp

    interp = gap_energy_interp(
        table.z_lo, table.z_hi, jnp.asarray(table.energies)
    )
    z = np.linspace(130e-9, 160e-9, 37)
    frac = (z - 130e-9) / 30e-9
    temps = 353.0 + (293.0 - 353.0) * frac
    expected = debye.surface_energy(
        temps, 980.0, 10, physics.BOLTZMANN_TEMP_PORE
    )
    got = np.asarray(interp(jnp.asarray(z)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # Ends: hot at bottom, cold at top; hot > cold.
    assert table.energies[0] > table.energies[-1]


def test_top_level_api_exports():
    """The spellings documented in docs/MIGRATION.md construct and agree
    with the reference constant block (Temperature_Pore_MC.py:28-110)."""
    import argon_monte_carlo_tpu as amc

    geo = amc.PoreGeometry()
    assert geo.pore_coated_radius == 30e-9
    assert geo.gap_extra_radius == 4e-9
    assert amc.CubeGeometry().lx == 100e-9
    gas = amc.GasPhysics()
    assert gas.sigma == 3.6e-19
    assert gas.collision_radius_factor == 1.0
    cfg = amc.temperature_pore_config()
    assert (cfg.seed, cfg.t_cold, cfg.t_hot) == (17, 293.0, 353.0)
    assert cfg.cone_half_angle_deg == 85.0
    assert cfg.nmft * cfg.steps_per_mft == 20_000
