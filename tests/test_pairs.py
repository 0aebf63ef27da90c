"""Verlet reach-pair engine (ops/pairs.py) vs the per-step sweep engine.

The pair list is a superset of every possible collision pair between
rebuilds (reach bound + dirty re-search; module docstring), and the
per-entry resolve is algebraically the same IEEE expression as the
per-particle form, so trajectories must match the sweep engine BITWISE
-- the strongest possible equivalence test (SURVEY.md section 7
"Sequential collision semantics", VERDICT r1 items 5/7).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.ops import collide, pairs as pairs_ops


def run_both(n=3000, steps=15, k=5, seed=None, energized=True):
    # steps_per_epoch == k keeps the pairs engine on ONE scan-block
    # length (misaligned epochs compile several block lengths; each
    # extra length is a full XLA compile on the 1-core CPU host).
    eng_s = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="sweep")
    kwargs = dict(num_particles_override=n)
    if seed is not None:
        kwargs["seed"] = seed
    mk = (amc.temperature_pore_config if energized else amc.PoreConfig)
    cfg_s = mk(engine=eng_s, **kwargs)
    sim_s = amc.Simulation(amc.make_workload(cfg_s))
    st_s, m_s, _ = sim_s.run(num_steps=steps)

    eng_p = dataclasses.replace(eng_s, narrowphase="pairs",
                                rebuild_interval=k)
    cfg_p = mk(engine=eng_p, **kwargs)
    sim_p = amc.Simulation(amc.make_workload(cfg_p))
    st_p, m_p, _ = sim_p.run(num_steps=steps)
    return (st_s, m_s), (st_p, m_p)


def test_pairs_matches_sweep_bitwise_energized():
    """Temperature pore: energized walls exercise the dirty re-search."""
    (st_s, m_s), (st_p, m_p) = run_both(energized=True)
    assert int(m_s.collision_count) == int(m_p.collision_count)
    np.testing.assert_array_equal(np.asarray(st_s.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_s.vel), np.asarray(st_p.vel))
    np.testing.assert_array_equal(np.asarray(st_s.paths),
                                  np.asarray(st_p.paths))
    np.testing.assert_array_equal(np.asarray(m_s.hist), np.asarray(m_p.hist))
    np.testing.assert_array_equal(np.asarray(m_s.path_sum),
                                  np.asarray(m_p.path_sum))
    # Pair collisions must actually have happened for this to mean much.
    assert int(m_p.collision_count) > 0


def test_pairs_matches_sweep_bitwise_specular():
    """Pore v1 (specular): wall hits preserve speed -> no wall dirt."""
    (st_s, m_s), (st_p, m_p) = run_both(energized=False, steps=12, k=4)
    np.testing.assert_array_equal(np.asarray(st_s.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_s.vel), np.asarray(st_p.vel))
    assert int(m_s.collision_count) == int(m_p.collision_count)


def test_pairs_no_overflow_and_rebuild_cadence():
    (_, _), (st_p, m_p) = run_both(steps=11, k=4)
    # All capacity/coverage diagnostics must be silent at this scale.
    assert int(m_p.overflow_count) == 0
    assert bool(np.isfinite(np.asarray(st_p.pos)).all())


def test_reach_radii_bound():
    vel = jnp.asarray([[100.0, 0.0, 0.0], [0.0, 3000.0, 0.0]])
    cr, dt, k = 3.385e-10, 1.85e-13, 8
    reach, clipped = pairs_ops.reach_radii(vel, cr, dt, k, 1.0e-9)
    assert float(reach[0]) == 0.5 * cr + 100.0 * dt * k
    assert not bool(clipped[0])
    # The fast particle clips at max_reach and is flagged hot.
    assert float(reach[1]) == 1.0e-9
    assert bool(clipped[1])


def test_candidate_search_topk_superset():
    """top_k=4 column 0 equals the k=1 partner search; extra columns are
    ascending and only appear for genuinely multi-candidate particles."""
    key = jax.random.PRNGKey(3)
    n = 4000
    eng = amc.EngineConfig(dtype="float64", broadphase="cells")
    cfg = amc.temperature_pore_config(num_particles_override=n, engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids

    _, dgrid = build_grids(wl)
    state = wl.init_fn(key)
    sr = cfg.physics.collision_range * 60.0  # inflate for multi-candidates

    partner, _ = collide.cell_partner_search(state.pos, dgrid, sr)
    cands, _, _ = collide.cell_candidate_search(
        state.pos, dgrid, sr, top_k=4
    )
    np.testing.assert_array_equal(np.asarray(partner),
                                  np.asarray(cands[:, 0]))
    c = np.asarray(cands)
    multi = (c[:, 1] >= 0)
    assert multi.sum() > 10  # the inflated radius must exercise top-k
    valid = c[:, 1:][multi]
    prev = c[:, :-1][multi]
    ok = (valid < 0) | (valid > prev)
    assert ok.all()


def test_pairs_checkpoint_resume_bitwise(tmp_path):
    """Resuming mid-window forces a rebuild (fresh PairList); since the
    pair list is always a superset and the per-step test is exact, the
    resumed trajectory must still match the uninterrupted one bitwise."""
    from argon_monte_carlo_tpu.io import checkpoint as ckpt

    # spe=4 with K=8 keeps every scan block at length 4 (ONE compiled
    # block program per Simulation); the resume at step 4 is mid-window
    # for the uninterrupted run (it rebuilt at 0 and would not rebuild
    # again until 8), so the resumed run's immediate rebuild exercises
    # the shifted-cadence invariance.
    eng = amc.EngineConfig(dtype="float64", broadphase="cells",
                           steps_per_epoch=4, narrowphase="pairs",
                           rebuild_interval=8)
    cfg = amc.temperature_pore_config(num_particles_override=2500,
                                      engine=eng)
    sim = amc.Simulation(amc.make_workload(cfg))

    # Uninterrupted 8 steps.
    st_a, m_a, _ = sim.run(num_steps=8)

    # 4 steps -> checkpoint -> fresh Simulation resumes 4 more.
    sim_b = amc.Simulation(amc.make_workload(cfg))
    state, measure, key = sim_b.init()
    state, measure, _ = sim_b.run(num_steps=4, state=state,
                                  measure=measure, run_key=key)
    path = ckpt.save_checkpoint(str(tmp_path / "ck.npz"), state, measure,
                                key, 4)
    sim_c = amc.Simulation(amc.make_workload(cfg))
    st2, m2, key2, step2 = ckpt.load_checkpoint(path)
    assert step2 == 4
    st_b, m_b, _ = sim_c.run(num_steps=4, state=st2, measure=m2,
                             run_key=key2, start_step=4)

    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    assert int(m_a.collision_count) == int(m_b.collision_count)


def test_pairs_rejects_uncoverable_workload():
    """The cube's dt is 40x the pore's: per-step drift is ~19 collision
    ranges, so the in-reach expectation (~140 candidates/particle)
    cannot be covered by any top-k emission.  The engine must REFUSE --
    silently finding 0 of the collisions (as a naive run does) would be
    wrong physics (the cells grid itself is fine: cube cells+sweep
    bitwise-matches allpairs)."""
    import pytest

    eng_p = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=4, narrowphase="pairs",
                             rebuild_interval=4)
    cfg_p = amc.CubeConfig(num_particles_override=2000, engine=eng_p)
    with pytest.raises(ValueError, match="cannot cover"):
        amc.Simulation(amc.make_workload(cfg_p)).run(num_steps=4)


def test_pairs_cell_table_spill_goes_hot_and_stays_exact():
    """Starve the pairs-rebuild cell table (4 slots/cell): most
    particles spill out of the packed planes entirely.  Spills go HOT
    (fresh-position re-search every step; a single (i,j) entry drives
    the full symmetric resolution), so trajectories must STILL match
    the per-step sweep bitwise -- the mechanism that lets the pairs
    grid run tight capacities (config.pairs_cell_capacity_for)."""
    n, steps, k = 3000, 10, 4
    eng_s = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=5, narrowphase="sweep")
    cfg_s = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_s)
    st_s, m_s, _ = amc.Simulation(amc.make_workload(cfg_s)).run(
        num_steps=steps)

    eng_p = dataclasses.replace(eng_s, narrowphase="pairs",
                                rebuild_interval=k, cell_capacity=4)
    cfg_p = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_p)
    st_p, m_p, _ = amc.Simulation(amc.make_workload(cfg_p)).run(
        num_steps=steps)

    assert int(m_p.hot_spill_count) > 0  # the starvation actually bit
    assert int(m_p.overflow_count) == 0  # ...but nothing was LOST
    np.testing.assert_array_equal(np.asarray(st_s.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_s.vel), np.asarray(st_p.vel))
    assert int(m_s.collision_count) == int(m_p.collision_count)


def test_fused_epoch_matches_split_blocks_bitwise():
    """The fused whole-window program (outer scan of rebuild + K-step
    inner scan, one dispatch) and the split per-block programs must
    produce identical trajectories: rebuild cadence is the same, only
    the dispatch structure differs."""
    n, k, steps = 2000, 5, 20
    eng = amc.EngineConfig(dtype="float64", broadphase="cells",
                           steps_per_epoch=2 * k, narrowphase="pairs",
                           rebuild_interval=k)
    cfg = amc.temperature_pore_config(num_particles_override=n,
                                      engine=eng)
    sim_f = amc.Simulation(amc.make_workload(cfg))
    assert cfg.num_molecules <= eng.fused_epoch_max_particles  # fused
    st_f, m_f, met_f = sim_f.run(num_steps=steps)

    # Epochs of non-window-aligned length never satisfy the fused
    # gate's whole-window condition, so this run exercises only the
    # split rebuild/block programs.
    import dataclasses as dc

    eng2 = dc.replace(eng, steps_per_epoch=k - 1)
    cfg2 = amc.temperature_pore_config(num_particles_override=n,
                                       engine=eng2)
    sim_s = amc.Simulation(amc.make_workload(cfg2))
    st_s, m_s, met_s = sim_s.run(num_steps=steps)

    np.testing.assert_array_equal(np.asarray(st_f.pos), np.asarray(st_s.pos))
    np.testing.assert_array_equal(np.asarray(st_f.vel), np.asarray(st_s.vel))
    assert int(m_f.collision_count) == int(m_s.collision_count)
    np.testing.assert_array_equal(np.asarray(met_f.rebuilt),
                                  np.asarray(met_s.rebuilt))

    # The config knob itself (fused_epoch_max_particles=0 forces the
    # split path at window-aligned epoch lengths -- the 10M regime's
    # dispatch structure) must also be trajectory-identical.
    eng3 = dc.replace(eng, fused_epoch_max_particles=0)
    cfg3 = amc.temperature_pore_config(num_particles_override=n,
                                       engine=eng3)
    sim_k = amc.Simulation(amc.make_workload(cfg3))
    st_k, m_k, met_k = sim_k.run(num_steps=steps)
    np.testing.assert_array_equal(np.asarray(st_f.pos), np.asarray(st_k.pos))
    np.testing.assert_array_equal(np.asarray(st_f.vel), np.asarray(st_k.vel))
    assert int(m_f.collision_count) == int(m_k.collision_count)
    np.testing.assert_array_equal(np.asarray(met_f.rebuilt),
                                  np.asarray(met_k.rebuilt))


def test_compact_indices_matches_nonzero_contract():
    """compact_indices must be OUTPUT-IDENTICAL to jnp.nonzero(size=...)
    -- every hot compaction swapped to the sort-based lowering relies on
    it for the pairs==sweep bitwise guarantee."""
    from argon_monte_carlo_tpu.ops.compact import compact_indices

    rng = np.random.default_rng(7)
    cases = [
        (np.zeros(97, bool), 16),              # empty
        (np.ones(97, bool), 16),               # full + truncation
        (rng.random(1000) < 0.03, 64),         # sparse
        (rng.random(1000) < 0.5, 64),          # dense + truncation
        (rng.random(50) < 0.3, 128),           # size > n (padding)
        (np.array([True]), 4),
    ]
    for mask, size in cases:
        want = jnp.nonzero(jnp.asarray(mask), size=size,
                           fill_value=mask.shape[0])[0]
        got = compact_indices(jnp.asarray(mask), size, mask.shape[0])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_half_shell_emits_identical_pair_set():
    """The 14-cell half-shell one-sided sweep emits EXACTLY the pair set
    of the 27-cell one-sided sweep (different owning sides, same
    unordered pairs) -- the coverage invariant the single-chip rebuild
    rests on.  top_k is sized so neither variant truncates."""
    key = jax.random.PRNGKey(11)
    n = 4000
    eng = amc.EngineConfig(dtype="float64", broadphase="cells")
    for mk in (amc.temperature_pore_config, amc.CubeConfig):
        cfg = mk(num_particles_override=n, engine=eng)
        wl = amc.make_workload(cfg)
        from argon_monte_carlo_tpu.engine import build_grids

        _, dgrid = build_grids(wl)
        state = wl.init_fn(key)
        # Inflated per-particle reach: plenty of multi-candidate
        # particles, including cross-cell pairs in every direction.
        # (The cube's huge dt makes the K-step reach blow past any
        # testable top_k, so it gets a fixed quarter-cell reach -- the
        # cross-cell emission geometry is what the test is about.)
        if mk is amc.CubeConfig:
            reach = jnp.full((n,), 0.25 * dgrid.cell_size,
                             state.pos.dtype)
        else:
            reach, _ = pairs_ops.reach_radii(
                state.vel, cfg.physics.collision_range * 12.0, cfg.dt,
                8, 0.5 * dgrid.cell_size)
        top_k = 24

        def pair_set(half_shell):
            cands, overflow, _ = collide.cell_candidate_search(
                state.pos, dgrid, reach=reach, top_k=top_k,
                one_sided=True, half_shell=half_shell)
            c = np.asarray(cands)
            # No particle may have filled its list (else the sets could
            # differ by truncation, not by coverage).
            assert (c[:, -1] < 0).all(), "top_k too small for this test"
            i = np.repeat(np.arange(n), top_k)
            j = c.reshape(-1)
            m = j >= 0
            i, j = i[m], j[m]
            return set(zip(np.minimum(i, j).tolist(),
                           np.maximum(i, j).tolist()))

        full = pair_set(False)
        half = pair_set(True)
        assert half == full
        assert len(full) > 100  # the inflated reach must bite


def test_active_cell_list_covers_init_and_routes_strays():
    """The static active-cell list (Grid.active_cells) must (a) actually
    prune rows, (b) cover every cell the initial state occupies (no
    equilibrium particle is ever hot-routed for being unswept), and (c)
    route a particle forced into an inactive corner cell to the HOT set
    at rebuild -- the exactness backstop for strays beyond the margin."""
    key = jax.random.PRNGKey(5)
    n = 4000
    eng = amc.EngineConfig(dtype="float64", broadphase="cells",
                           narrowphase="pairs", rebuild_interval=8)
    cfg = amc.temperature_pore_config(num_particles_override=n,
                                      engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids, pairs_config_for

    _, dgrid = build_grids(wl)
    assert dgrid.active_cells is not None
    frac = dgrid.active_cells.shape[0] / dgrid.num_cells
    assert frac < 0.85, f"active list prunes nothing ({frac:.2f})"

    state = wl.init_fn(key)
    cid = np.asarray(collide.assign_cells(state.pos, dgrid))
    rank = np.asarray(dgrid.active_rank)
    assert (rank[cid] >= 0).all(), "init occupancy outside active list"

    # Force particle 0 into a box-corner cell of the bottom open-air
    # layer: its distance to the axis exceeds the region radius + the
    # 0.5-cell margin by construction (half_extent has the +1 slack
    # cell), so the cell is inactive.
    cs = dgrid.cell_size
    he = float(np.asarray(dgrid.half_extent)[1])
    corner = he - 0.51 * cs
    pos = np.asarray(state.pos).copy()
    pos[0] = (corner, corner, dgrid.z_lo + 1.5 * cs)
    state.pos = jnp.asarray(pos, state.pos.dtype)
    cid0 = int(np.asarray(collide.assign_cells(state.pos, dgrid))[0])
    assert rank[cid0] < 0, "corner cell unexpectedly active"

    pcfg = pairs_config_for(wl)
    plist = pairs_ops.PairList.init(n, dgrid, pcfg, jnp.dtype("float64"))
    new = pairs_ops.rebuild(state, dgrid, pcfg,
                            cfg.physics.collision_range, cfg.dt, plist)
    hot = np.asarray(new.hot)
    assert hot[0], "unswept stray was not routed hot"
    # The stray must be VISIBLE in telemetry (counted as a spill), not
    # a silent throughput sink.
    assert int(new.spill) >= 1, "unswept stray not counted as a spill"


def test_pair_config_covers_measured_10m_burst():
    """The emission-tail model behind default_pair_config must cover the
    MEASURED rebuild burst at 10M (CPU probe, round 3): at the old
    Poisson(lam/2) model, top_k stayed 3 and every steady-state rebuild
    emitted 34,352 full emissions against a 39,517 research budget
    already carrying ~13.5k collision bumps -- every 8th step dropped
    ~24k researches (counted, but a standing coverage degradation vs
    the sweep).  The corrected model (full-lam tail, ownership is not
    an iid 1/2-thinning, x3.5 Maxwell-mixture overdispersion) picks
    top_k=4, measured 4,389 full emissions and ZERO steady-state
    overflow at 10M (dirty 16,279 vs capacity 39,517).  Pin the sizing
    against those measurements."""
    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           narrowphase="pairs", rebuild_interval=8)
    from argon_monte_carlo_tpu.engine import pairs_config_for

    MEASURED_STEADY_REBUILD_DIRTY_10M = 16279   # probe 2026-08-18
    cfg10 = amc.temperature_pore_config(engine=eng).scaled_to(10_000_000)
    p10 = pairs_config_for(amc.make_workload(cfg10))
    assert p10.top_k >= 4
    assert p10.research_capacity >= 1.5 * MEASURED_STEADY_REBUILD_DIRTY_10M
    # The burst scales ~linearly with N at fixed density/K: the same
    # coverage must hold at 1M (measured round-3 bench scale).
    cfg1 = amc.temperature_pore_config(engine=eng).scaled_to(1_000_000)
    p1 = pairs_config_for(amc.make_workload(cfg1))
    assert p1.top_k >= 4
    assert p1.research_capacity >= 1.5 * (MEASURED_STEADY_REBUILD_DIRTY_10M
                                          / 10.0)


def test_latent_research_counter_fires():
    """StepMetrics.latent_research is the REALIZED one-step-latency
    indicator (a457f93 / ADVICE r2): a dirty particle whose re-search
    finds a candidate already within cr of its stored rebuild-time
    position resolves that overlap one step later than the per-step
    sweep would.  Provoke it directly: teleport a particle onto a
    neighbour's stored position and assert (a) the counter fires, (b)
    the pair is appended so it does resolve next step, and (c) the
    counter is SILENT for an in-place research (no false positives at
    equilibrium spacing)."""
    key = jax.random.PRNGKey(7)
    n = 4000
    eng = amc.EngineConfig(dtype="float64", broadphase="cells",
                           narrowphase="pairs", rebuild_interval=8)
    cfg = amc.temperature_pore_config(num_particles_override=n, engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids, pairs_config_for

    _, dgrid = build_grids(wl)
    state = wl.init_fn(key)
    cr = cfg.physics.collision_range
    pcfg = pairs_config_for(wl)
    plist = pairs_ops.PairList.init(n, dgrid, pcfg, jnp.dtype("float64"))
    plist = pairs_ops.rebuild(state, dgrid, pcfg, cr, cfg.dt, plist)

    dirty = jnp.full((pcfg.research_capacity,), n, jnp.int32).at[0].set(0)
    bump = jnp.zeros((n,), bool)

    # (c) in-place research: particle 0 sits where the rebuild stored
    # it, and equilibrium spacing at this N is >> cr, so no candidate
    # is an already-realized overlap.
    _, lost0, latent0 = pairs_ops.research_dirty(
        state, plist, dirty, bump, dgrid, pcfg, cr, cfg.dt)
    assert not bool(lost0)
    assert int(latent0.sum()) == 0

    # (a)+(b) teleport particle 0 to 0.5*cr from particle 1's stored
    # rebuild-time position (particle 1 has not moved since rebuild).
    pos = np.asarray(state.pos).copy()
    pos[0] = pos[1] + np.array([0.5 * cr, 0.0, 0.0])
    state.pos = jnp.asarray(pos, state.pos.dtype)
    new, lost1, latent1 = pairs_ops.research_dirty(
        state, plist, dirty, bump, dgrid, pcfg, cr, cfg.dt)
    assert not bool(lost1)
    assert int(latent1[0]) >= 1, "realized overlap not counted"
    a = np.asarray(new.a)
    b = np.asarray(new.b)
    live = (a < n) & (b < n)
    entries = set(zip(np.minimum(a[live], b[live]).tolist(),
                      np.maximum(a[live], b[live]).tolist()))
    assert (0, 1) in entries, "realized overlap not appended for resolve"


def test_half_shell_gid_windowed_pair_set():
    """Half-shell emission under SHARDED lane semantics (gid plane +
    cell window): with a whole-grid window and a gid permutation (gid
    != lane), the half-shell one-sided sweep must emit exactly the
    full-shell one-sided pair set, mapped through gids.  (Cross-window
    edge coverage is pinned separately by the 4-device bitwise
    sharded-pairs == sharded-sweep test.)"""
    key = jax.random.PRNGKey(13)
    n = 4000
    eng = amc.EngineConfig(dtype="float64", broadphase="cells")
    cfg = amc.temperature_pore_config(num_particles_override=n, engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids

    _, dgrid = build_grids(wl)
    state = wl.init_fn(key)
    reach, _ = pairs_ops.reach_radii(
        state.vel, cfg.physics.collision_range * 12.0, cfg.dt,
        8, 0.5 * dgrid.cell_size)
    # gid != lane: reverse permutation (still unique int32 ids).
    gids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    valid = jnp.ones((n,), bool)
    top_k = 24

    def pair_set(half_shell):
        cands, overflow, _ = collide.cell_candidate_search(
            state.pos, dgrid, reach=reach, top_k=top_k, ids=gids,
            valid=valid, cell_window=(0, dgrid.num_cells),
            one_sided=True, half_shell=half_shell)
        c = np.asarray(cands)
        assert (c[:, -1] < 0).all(), "top_k too small for this test"
        g = np.asarray(gids)
        i = np.repeat(g, top_k)          # emitter gid
        j = c.reshape(-1)                # candidate LANE
        m = j >= 0
        i, j = i[m], g[j[m]]             # candidate gid
        return set(zip(np.minimum(i, j).tolist(),
                       np.maximum(i, j).tolist()))

    full = pair_set(False)
    half = pair_set(True)
    assert half == full
    assert len(full) > 100


def test_pairs_thin_grid_shape_matches_default_sweep_bitwise():
    """Grid shape is a pure perf knob: a pairs engine on a THIN grid
    (cell_occupancy 8 -> smaller cells, cell_capacity 16 -> thin
    Poisson tail) must reproduce the DEFAULT-grid (occ 11 / derived
    cap) sweep engine bitwise.  This is the gate for the r4 on-chip
    grid-shape sweep (bench.py BENCH_CELL_CAP/BENCH_CELL_OCC): the
    sweep's dominant VPU term scales ~rows*cap^2, so the shipping
    shape may change -- trajectories may not."""
    n, steps, k = 3000, 10, 4
    eng_s = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=5, narrowphase="sweep")
    cfg_s = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_s)
    st_s, m_s, _ = amc.Simulation(amc.make_workload(cfg_s)).run(
        num_steps=steps)

    eng_p = dataclasses.replace(eng_s, narrowphase="pairs",
                                rebuild_interval=k, cell_capacity=16,
                                cell_occupancy=8.0)
    cfg_p = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_p)
    st_p, m_p, _ = amc.Simulation(amc.make_workload(cfg_p)).run(
        num_steps=steps)

    assert int(m_p.overflow_count) == 0
    np.testing.assert_array_equal(np.asarray(st_s.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_s.vel), np.asarray(st_p.vel))
    assert int(m_s.collision_count) == int(m_p.collision_count)


def test_bf16_hittest_matches_exact_engine_bitwise():
    """rebuild_bf16_hittest is a pure perf knob: the widened bf16 hit
    set is a SUPERSET of the exact f32 set (ops/collide.BF16_HIT_EPS
    error budget), extra candidates only saturate top-k -> pending1
    exact re-search, and resolution re-tests exact overlap per step --
    so trajectories must match the exact engine BITWISE."""
    k, steps, n = 5, 15, 3000
    eng_a = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, rebuild_bf16_hittest=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    st_b, m_b, _ = amc.Simulation(amc.make_workload(cfg_b)).run(
        num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(m_a.hist), np.asarray(m_b.hist))


def test_bf16_hit_candidate_set_superset_or_saturated():
    """Unit-level superset contract at engine dtype float32: every
    exact-f32 rebuild candidate (i, c) is either present in the bf16
    emission row of i, or i's bf16 row is SATURATED (cands[i, -1] >= 0
    -- exactly the condition ops/pairs.rebuild queues for the pending1
    exact re-search)."""
    key = jax.random.PRNGKey(11)
    n = 4000
    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           narrowphase="pairs", rebuild_interval=8)
    cfg = amc.temperature_pore_config(num_particles_override=n, engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids

    _, dgrid = build_grids(wl)
    state = wl.init_fn(key)
    # Inflated reach exercises multi-candidate rows and top-k
    # saturation (top_k=2) so BOTH recovery branches are covered.
    cr, dt = cfg.physics.collision_range, cfg.dt
    reach, _ = pairs_ops.reach_radii(state.vel, cr * 40.0, dt, 8,
                                     0.5 * dgrid.cell_size)

    kw = dict(reach=reach, top_k=2, one_sided=True, half_shell=True)
    exact, _, _ = collide.cell_candidate_search(state.pos, dgrid, **kw)
    wide, _, _ = collide.cell_candidate_search(state.pos, dgrid,
                                               bf16_hit=True, **kw)
    exact = np.asarray(exact)
    wide = np.asarray(wide)
    saturated = wide[:, -1] >= 0
    ok = 0
    for i in np.nonzero(exact[:, 0] >= 0)[0]:
        for c in exact[i]:
            if c < 0:
                continue
            assert c in wide[i] or saturated[i], (
                f"exact candidate {c} of particle {i} lost: bf16 row "
                f"{wide[i]} neither contains it nor saturated"
            )
            ok += 1
    assert ok > 50  # the inflated reach must actually emit pairs
    # And saturation must occur somewhere, or the second branch is
    # untested at these settings.
    assert saturated.sum() > 0


def test_packed_layer_gather_bitwise():
    """packed_layer_gather is a pure layout knob: cell ids (and
    therefore trajectories) are bitwise-identical when the three
    per-layer gathers collapse into one packed-row gather."""
    n, steps, k = 3000, 10, 5
    eng_a = amc.EngineConfig(dtype="float32", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k,
                             packed_layer_gather=False)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    wl_a = amc.make_workload(cfg_a)
    eng_b = dataclasses.replace(eng_a, packed_layer_gather=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    wl_b = amc.make_workload(cfg_b)

    from argon_monte_carlo_tpu.engine import build_grids

    _, dg_a = build_grids(wl_a)
    _, dg_b = build_grids(wl_b)
    assert dg_a.layer_packed is None and dg_b.layer_packed is not None
    key = jax.random.PRNGKey(5)
    state = wl_a.init_fn(key)
    cid_a = collide.assign_cells(state.pos, dg_a)
    cid_b = collide.assign_cells(state.pos, dg_b)
    np.testing.assert_array_equal(np.asarray(cid_a), np.asarray(cid_b))

    st_a, m_a, _ = amc.Simulation(wl_a).run(num_steps=steps)
    st_b, m_b, _ = amc.Simulation(wl_b).run(num_steps=steps)
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    assert int(m_a.collision_count) == int(m_b.collision_count)


def test_packed_layer_gather_refuses_inexact_float32():
    """The f32 packed table is only valid while layer integers are
    exact float round-trips (< 2^24); the pack-time guard must refuse
    otherwise rather than silently mis-bin."""
    import pytest

    eng = amc.EngineConfig(dtype="float32", broadphase="cells")
    cfg = amc.temperature_pore_config(num_particles_override=1000,
                                      engine=eng)
    wl = amc.make_workload(cfg)
    from argon_monte_carlo_tpu.engine import build_grids

    host_grid, _ = build_grids(wl)
    big = dataclasses.replace(host_grid, num_cells=1 << 24)
    with pytest.raises(ValueError, match="2\\^24"):
        collide.DeviceGrid.from_grid(big, jnp.float32,
                                     packed_layers=True)


def test_all_three_rebuild_levers_compose_bitwise():
    """Both surviving rebuild levers flipped AWAY from their shipping
    defaults (packed_layer_gather off, rebuild_bf16_hittest on) must
    match the default engine bitwise just like each lever alone --
    the default flip is a pure layout/scheduling change."""
    k, steps, n = 5, 15, 3000
    eng_a = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, packed_layer_gather=False,
                                rebuild_bf16_hittest=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    st_b, m_b, _ = amc.Simulation(amc.make_workload(cfg_b)).run(
        num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(m_a.hist), np.asarray(m_b.hist))


def test_occupancy_skip_on_matches_default_bitwise(monkeypatch):
    """rebuild_occupancy_skip=True permutes nonempty active rows first
    and lax.cond-skips trailing all-empty chunks; per-particle
    candidates are layout-independent (readback goes through the
    per-rebuild cell->row map), so trajectories must match the shipping
    static-layout default bitwise.  (The default flipped to False in
    r5, so ON is the non-default arm.)  The chunk is shrunk via the
    test hook so the multi-chunk lax.cond skip dispatch actually
    executes at CPU-test particle counts -- both the taken and the
    skipped branch."""
    k, steps, n = 5, 15, 3000
    eng_a = amc.EngineConfig(dtype="float32", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    monkeypatch.setenv("ARGON_SWEEP_CHUNK", "32")
    eng_b = dataclasses.replace(eng_a, rebuild_occupancy_skip=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    st_b, m_b, _ = amc.Simulation(amc.make_workload(cfg_b)).run(
        num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))


def test_eager_rebuild_matches_jitted_bitwise():
    """eager_rebuild dispatches the same rebuild ops outside jit (the
    10M remote-compile-wall escape hatch); fusion boundaries do not
    change any reduction order, so trajectories must match the jitted
    rebuild bitwise.  Also pins that eager mode disables the fused
    whole-window program (the monolith it exists to avoid)."""
    k, steps, n = 5, 15, 3000
    eng_a = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, eager_rebuild=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    sim_b = amc.Simulation(amc.make_workload(cfg_b))
    assert sim_b._rebuild_eager
    st_b, m_b, _ = sim_b.run(num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(m_a.hist), np.asarray(m_b.hist))


def test_split_rebuild_matches_fused_bitwise():
    """split_rebuild_programs runs the rebuild as three jitted programs
    (tables | sweep | epilogue); the sweep program reconstructs planes
    from the packed mega by slicing (values identical -- integer planes
    exact below 2^24), so trajectories must match the monolithic
    rebuild bitwise."""
    k, steps, n = 5, 15, 3000
    eng_a = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, split_rebuild_programs=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    sim_b = amc.Simulation(amc.make_workload(cfg_b))
    assert sim_b._rebuild_split
    st_b, m_b, _ = sim_b.run(num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(m_a.hist), np.asarray(m_b.hist))


def test_split_rebuild_float32_with_levers_bitwise():
    """Split rebuild at engine dtype float32 (the bench dtype: exercises
    the f32 plane reconstruction casts) composed with the surviving
    levers must still match the fused default engine bitwise."""
    k, steps, n = 5, 10, 3000
    eng_a = amc.EngineConfig(dtype="float32", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, split_rebuild_programs=True,
                                packed_layer_gather=False,
                                rebuild_bf16_hittest=True)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    st_b, m_b, _ = amc.Simulation(amc.make_workload(cfg_b)).run(
        num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))


def test_max_block_steps_matches_default_bitwise():
    """max_block_steps caps the host loop's per-dispatch scan-block
    length without changing the rebuild cadence: any block partition
    with <= K steps per rebuild window yields the exact same
    trajectory (engine._run_epoch contract).  Arm B runs the 10M
    ladder's upgrade configuration -- eager rebuild + 1-step blocks --
    so the jitted step program is the smallest the engine can emit
    while the rebuild still amortizes over K steps.  Also pins that
    the cap disables the fused whole-window program."""
    k, steps, n = 5, 17, 3000  # 17: non-window-aligned tail
    eng_a = amc.EngineConfig(dtype="float64", broadphase="cells",
                             steps_per_epoch=k, narrowphase="pairs",
                             rebuild_interval=k)
    cfg_a = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_a)
    st_a, m_a, _ = amc.Simulation(amc.make_workload(cfg_a)).run(
        num_steps=steps)

    eng_b = dataclasses.replace(eng_a, eager_rebuild=True,
                                max_block_steps=1)
    cfg_b = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_b)
    sim_b = amc.Simulation(amc.make_workload(cfg_b))
    st_b, m_b, _ = sim_b.run(num_steps=steps)

    assert int(m_a.collision_count) == int(m_b.collision_count) > 0
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(m_a.hist), np.asarray(m_b.hist))

    # A mid-window cap (3 < K=5) partitions windows as 3+2 and must
    # also be exact; jitted (non-eager) path this time.
    eng_c = dataclasses.replace(eng_a, max_block_steps=3)
    cfg_c = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_c)
    st_c, m_c, _ = amc.Simulation(amc.make_workload(cfg_c)).run(
        num_steps=steps)
    assert int(m_a.collision_count) == int(m_c.collision_count)
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_c.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_c.vel))
