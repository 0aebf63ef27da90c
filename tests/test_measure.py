"""Free-path state machine and histogram accumulation (SURVEY.md C16/C27)."""

import jax.numpy as jnp
import numpy as np
import pytest

from argon_monte_carlo_tpu.ops import measure as measure_ops
from argon_monte_carlo_tpu.state import Measurements, ParticleState


def test_partial_path_discarded_then_full_emitted():
    """First collision ends a partial path (discarded); the second emits
    (Open_Air_Cube_MC.py:267-280)."""
    st = ParticleState.zeros(1, jnp.float64)
    st.vel = jnp.asarray([[3.0, 0.0, 4.0]], jnp.float64)  # speed 5
    st.paths = jnp.asarray([[10.0, 6.0, 0.0, 8.0]], jnp.float64)
    measure = Measurements.zeros(200, jnp.float64, num_particles=1)
    mask = jnp.asarray([True])
    t = jnp.asarray([0.0])

    # First event: no emission, has_collided flips.
    measure = measure_ops.record_completed(
        measure, st.paths, st.has_collided, st.vel, t, mask, 200, 1e-6
    )
    measure = measure_ops.flush_pending(measure, 200, 1e-6)
    assert int(measure.path_count) == 0
    st = measure_ops.end_paths(st, mask, t, st.vel, zero_residual=False)
    assert bool(st.has_collided[0])
    np.testing.assert_allclose(np.asarray(st.paths[0]), 0.0)

    # Accrue some distance, then a second event with back-trace t.
    st.paths = jnp.asarray([[10.0, 6.0, 0.0, 8.0]], jnp.float64)
    t = jnp.asarray([1.0])
    measure = measure_ops.record_completed(
        measure, st.paths, st.has_collided, st.vel, t, mask, 200, 1e-6
    )
    measure = measure_ops.flush_pending(measure, 200, 1e-6)
    assert int(measure.path_count) == 1
    # Emitted values: |path - |v_k| * t| = |10-5|, |6-3|, |0-0|, |8-4|.
    np.testing.assert_allclose(
        np.asarray(measure.path_sum), [5.0, 3.0, 0.0, 4.0]
    )


def test_histogram_binning():
    measure = Measurements.zeros(200, jnp.float64, num_particles=3)
    paths = jnp.asarray(
        [[0.5e-9, 0.5e-9, 0.5e-9, 0.5e-9],     # bin 0
         [7.5e-9, 7.5e-9, 7.5e-9, 7.5e-9],     # bin 1 (width 5e-9)
         [2e-6, 2e-6, 2e-6, 2e-6]],            # overflow bin 200
        jnp.float64,
    )
    vel = jnp.zeros((3, 3), jnp.float64)
    has = jnp.asarray([True, True, True])
    mask = jnp.asarray([True, True, False])
    t = jnp.zeros(3, jnp.float64)
    measure = measure_ops.record_completed(
        measure, paths, has, vel, t, mask, 200, 1e-6
    )
    measure = measure_ops.flush_pending(measure, 200, 1e-6)
    hist = np.asarray(measure.hist)
    assert hist[0, 0] == 1  # total axis bin 0
    assert hist[0, 1] == 1
    assert hist[0, 200] == 0  # masked-out overflow not recorded
    assert hist.sum() == 8  # 2 particles x 4 axes
    assert int(measure.path_count) == 2


def test_accumulate_drift():
    st = ParticleState.zeros(1, jnp.float64)
    st.vel = jnp.asarray([[3.0, -4.0, 0.0]], jnp.float64)
    paths = measure_ops.accumulate_drift(st, dt=2.0)
    np.testing.assert_allclose(
        np.asarray(paths[0]), [10.0, 6.0, 8.0, 0.0]
    )


def test_residual_after_specular():
    """Residual path after a specular event is |v'_k| * t
    (Open_Air_Pore_MC.py:281-284)."""
    st = ParticleState.zeros(1, jnp.float64)
    st.vel = jnp.asarray([[3.0, 0.0, -4.0]], jnp.float64)
    st.paths = jnp.asarray([[99.0, 99.0, 99.0, 99.0]], jnp.float64)
    st = measure_ops.end_paths(
        st, jnp.asarray([True]), jnp.asarray([2.0]), st.vel,
        zero_residual=False,
    )
    np.testing.assert_allclose(
        np.asarray(st.paths[0]), [10.0, 6.0, 0.0, 8.0]
    )


def test_flush_pending_compacted_superset_and_drops():
    """The shared-compaction flush bins exactly the events covered by
    event_idx (superset indices fine) and counts crowded-out events in
    hist_drop_count without touching the exact sums."""
    import jax.numpy as jnp

    from argon_monte_carlo_tpu.state import Measurements

    n = 64
    m = Measurements.zeros(200, jnp.float64, num_particles=n)
    vals = jnp.zeros((n, 4), jnp.float64)
    for i, v in [(3, 1e-8), (10, 2e-8), (50, 9e-7)]:
        vals = vals.at[i].set(v)
    m.pending_vals = vals
    m.pending_mask = jnp.zeros((n,), bool).at[jnp.asarray([3, 10, 50])].set(True)

    # Superset compaction (extra non-event indices + padding) -> all 3
    # events binned, no drops.
    idx = jnp.asarray([0, 3, 7, 10, 50, n, n, n], jnp.int32)
    m2 = measure_ops.flush_pending_compacted(m, idx, 200, 1e-6)
    assert int(m2.path_count) == 3
    assert float(m2.hist.sum()) == 12.0  # 3 events x 4 components
    assert int(m2.hist_drop_count) == 0

    # Compaction that misses one event -> 1 drop, sums still exact.
    m = Measurements.zeros(200, jnp.float64, num_particles=n)
    m.pending_vals = vals
    m.pending_mask = jnp.zeros((n,), bool).at[jnp.asarray([3, 10, 50])].set(True)
    idx = jnp.asarray([3, 10, n, n], jnp.int32)
    m3 = measure_ops.flush_pending_compacted(m, idx, 200, 1e-6)
    assert int(m3.path_count) == 3          # exact sums see everything
    assert float(m3.hist.sum()) == 8.0      # only 2 events binned
    assert int(m3.hist_drop_count) == 1     # one event crowded out
