"""Verlet reach-pair narrow phase: amortize the neighbour sweep over K steps.

The reference re-sweeps every cell's O(n^2) pairs every timestep
(Open_Air_Pore_MC.py:160-255).  The per-step sweep is also this engine's
dominant cost on TPU (measured 127 ms of a 235 ms step at 1M particles),
yet particles move only ~cr/4 per step, so almost nothing about the
neighbourhood changes between steps.  This module rebuilds a *candidate
pair list* every ``rebuild_interval`` (K) steps and, per step, tests only
the listed pairs at the exact collision range -- a Verlet list in
pair-list form (VERDICT r1 item 5), with a rigorous coverage argument:

* At rebuild, particle i gets ``reach_i = cr/2 + |v_i| K dt``: within the
  next K drifts it can displace at most ``|v_i| K dt`` (specular walls
  fold the path but never lengthen it and preserve speed), so ANY pair
  that comes within cr during the window satisfied
  ``|x_i - x_j| < reach_i + reach_j`` at rebuild time.  The sweep
  (ops/collide.cell_candidate_search with per-particle reach) therefore
  emits a superset of every possible collision pair -- while the
  velocities hold.
* Velocities change at pair collisions and energized walls, and
  recapture teleports break the displacement bound outright.  Speed-
  changed particles are detected IN-step and (a) re-searched against the
  rebuild-time packed planes at ``reach_i_new + reach0_j``, and (b) have
  their OWN stored reach bumped in place by the new full-window
  allowance, so the stored radii remain valid bounds for every later
  re-search (induction over speed-change events).  Teleported particles
  and reach-clip overflows go HOT -- re-searched with fresh positions
  every remaining step -- closing coverage exactly.
* ONE-STEP LATENCY (the precise sense in which coverage is "exact",
  ADVICE r2): dirty re-search runs at the END of a step, so (a) a
  rebuild-time full top-k emission, (b) a recapture teleport, and (c)
  an energized-wall speed BOOST only join the candidate list for the
  NEXT step -- an overlap such a particle forms in the very step of
  the event resolves one step later than the per-step sweep would
  resolve it.  For (c) the reachable slack is the post-wall replay,
  bounded by v_new*dt beyond the rebuild allowance (v_new <=
  max(v_old, ~313 m/s): the Debye surface energies sit BELOW the
  thermal mean, so energized walls mostly cool) -- an unlisted pair
  can close that slack only from the outermost shell of the reach
  threshold with near-head-on alignment.  All classes are counted per
  step: the potential-event counters StepMetrics.latent_full /
  .teleports (measured 0 and ~1e-6 N at reference density) and the
  REALIZED indicator StepMetrics.latent_research (research-appended
  candidates already within cr of their stored position), and a
  hot particle fast enough to outrun even fresh-position re-search
  (per-step drift > 0.5*cell_size - cr/2, i.e. ~40 km/s at pore
  resolution vs ~400 m/s thermal) is counted into ``overflow``.
* Listed pairs are a superset; extra pairs are harmless (the per-step
  test applies the exact d^2 < cr^2 overlap condition on fresh
  positions, identical to the sweep engine).  Duplicated pairs resolve
  idempotently (both entries compute identical updates, scattered with
  .set).  Candidate-slot overflows (a particle with more in-reach
  neighbours than the sweep's top-k emission) are counted in
  ``overflow`` -- at reference density the in-reach expectation is
  ~0.4, so the top-4/top-12 budgets put overflow at the 1e-8 level.

Per-step cost collapses to two M-row gathers + one event compaction --
the sort/pack/sweep all amortize by 1/K.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..state import Measurements, ParticleState
from . import collide
from . import measure as measure_ops
from .compact import compact_indices

INT_BIG = 2**30


@dataclasses.dataclass(frozen=True)
class PairConfig:
    """Static knobs (host ints/floats; never traced)."""

    rebuild_interval: int      # K
    pair_capacity: int         # M_cap: main emission + appended research
    event_capacity: int        # per-step colliding-entry compaction width
    research_capacity: int     # dirty particles re-searched per step
    research_top_k: int        # candidates kept per re-searched particle
    append_capacity: int       # research pair entries appended per step
    top_k: int                 # candidates kept per particle at rebuild
    # Rebuild hit test in bf16 with a widened-superset threshold
    # (ops/collide.BF16_HIT_EPS; EngineConfig.rebuild_bf16_hittest).
    bf16_hit: bool = False
    # Skip empty active rows at rebuild (EngineConfig.
    # rebuild_occupancy_skip; False pins the static row layout).
    occupancy_skip: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairList:
    """Scan-carried Verlet pair state (all shapes static)."""

    a: jax.Array        # (M_cap,) int32; sentinel n = inert entry
    b: jax.Array        # (M_cap,) int32
    cursor: jax.Array   # () int32 next append slot
    age: jax.Array      # () int32 steps since rebuild (INT_BIG = force)
    mega0: jax.Array    # rebuild-time packed planes (rows, 5*cap):
                        # x, y, z, particle-index, reach
    pslot0: jax.Array   # (N,) rebuild-time particle->slot map (for the
                        # in-place reach bumps on speed changes)
    hot: jax.Array      # (N,) bool: re-search every step
    pending1: jax.Array  # (N,) bool: one-shot re-search queue (full
                        # top-k emission at rebuild; consumed next step)
    overflow: jax.Array  # () int32 candidate/append/pair-capacity drops
    spill: jax.Array    # () int32 rebuild cell-table spills absorbed
                        # by the hot set (coverage preserved)

    @staticmethod
    def init(n: int, grid: collide.DeviceGrid, pcfg: PairConfig,
             dtype, num_planes: int = 5) -> "PairList":
        """``num_planes`` is 5 (x,y,z,index,reach) single-chip, 6 with a
        global-id plane (x,y,z,lane,gid,reach -- the sharded engine)."""
        rows = grid.num_cells + 1
        return PairList(
            a=jnp.full((pcfg.pair_capacity,), n, jnp.int32),
            b=jnp.full((pcfg.pair_capacity,), n, jnp.int32),
            cursor=jnp.zeros((), jnp.int32),
            age=jnp.asarray(INT_BIG, jnp.int32),  # rebuild immediately
            mega0=jnp.zeros((rows, num_planes * grid.capacity), dtype),
            pslot0=jnp.zeros((n,), jnp.int32),
            hot=jnp.zeros((n,), jnp.bool_),
            pending1=jnp.zeros((n,), jnp.bool_),
            overflow=jnp.zeros((), jnp.int32),
            spill=jnp.zeros((), jnp.int32),
        )


def reach_radii(vel: jnp.ndarray, cr: float, dt: float, k_steps: int,
                max_reach: float):
    """(reach (N,), clipped (N,) bool).  reach_i = cr/2 + |v_i| K dt."""
    speed = jnp.linalg.norm(vel, axis=-1)
    raw = 0.5 * cr + speed * (dt * k_steps)
    return jnp.minimum(raw, max_reach), raw > max_reach


def rebuild(state: ParticleState, grid: collide.DeviceGrid,
            pcfg: PairConfig, cr: float, dt: float,
            old: PairList, ids: jnp.ndarray | None = None,
            valid_lanes: jnp.ndarray | None = None,
            cell_window: tuple | None = None,
            active_window: tuple | None = None) -> PairList:
    """Full sweep at per-particle reach -> fresh pair list.

    ``ids``/``valid_lanes``/``cell_window`` are the sharded engine's
    lane semantics (ops/collide.cell_candidate_search): candidates are
    emitted as LANE indices, self-exclusion and the keep-one-side
    entry rule use the global ids, and only the shard's halo-padded
    cell window is swept.  Single-chip (all None) is unchanged.
    """
    n = state.pos.shape[0]
    max_reach = 0.5 * grid.cell_size
    reach, clipped = reach_radii(state.vel, cr, dt,
                                 pcfg.rebuild_interval, max_reach)
    # ONE-SIDED sweep: each unordered pair is emitted exactly once (the
    # two-sided form discarded one half below anyway); the per-particle
    # emission expectation halves, so top_k -- and the dominant VPU
    # cost of the rebuild's top-k min-passes -- shrinks
    # (default_pair_config sizes on lambda/2).  The sweep additionally
    # scans only the HALF SHELL (14 of 27 neighbour cells; emission
    # side is cell-lexicographic, id order within the self cell) --
    # coverage-identical, ~halving the hit-test lanes; every consumer
    # treats (a, b) symmetrically so which side emits is irrelevant
    # (test_and_resolve mutual match, research_dirty's full two-sided
    # 27-cell re-search).  SHARDED windows keep the same rule: cell ids
    # are global, so both shards sharing a boundary pair agree on the
    # emitting cell, and that cell is one of the two ENDPOINT cells --
    # within one cell of a lane either shard must cover, hence inside
    # both shards' halo-padded swept windows (halo_layers >= 2; ghost
    # mirrors deeper than the interaction band go stale only for lanes
    # that cannot touch a local before the next rebuild re-imports
    # them).  Per-shard top-k truncation may differ across shards (the
    # min runs on shard-relative lanes); that never loses coverage --
    # full emissions are queued for each shard's own one-shot re-search
    # (pending1), exactly as single-chip.
    cands, cell_overflow, (pslot0, mega0, unswept) = \
        collide.cell_candidate_search(
        state.pos, grid, reach=reach, top_k=pcfg.top_k, ids=ids,
        valid=valid_lanes, cell_window=cell_window, one_sided=True,
        half_shell=True, active_window=active_window,
        bf16_hit=pcfg.bf16_hit,
        occupancy_skip=pcfg.occupancy_skip,
    )
    # Cell-table overflow -> HOT, not lost: a particle dropped from the
    # slot planes is invisible to every other particle's search, but a
    # hot particle re-searches with its fresh position every step and a
    # single (i, j) entry drives the full symmetric resolution (choice
    # scatters + idempotent updates touch both sides), so its pairs
    # stay exactly covered.  This lets the pairs grid run a TIGHT cell
    # capacity (config.pairs_cell_capacity_for: ~3.75-sigma Poisson
    # tail, aligned so group*cap fills 128 lanes exactly) instead of
    # the sweep's 5-sigma padding -- the rebuild sweep's VPU work
    # scales with cap^2 after lane padding.  Residual blindspot: TWO
    # table-dropped particles in the same neighbourhood can't see each
    # other (~(drop rate)^2 ~ 1e-8 of pairs at the chosen tail, and
    # drops themselves remain counted in ``overflow``).
    return rebuild_finish(cands, cell_overflow, pslot0, mega0,
                          unswept, clipped, old, grid, pcfg, n,
                          ids=ids, valid_lanes=valid_lanes)


def rebuild_finish(cands, cell_overflow, pslot0, mega0, unswept,
                   clipped, old: PairList, grid: collide.DeviceGrid,
                   pcfg: PairConfig, n: int,
                   ids: jnp.ndarray | None = None,
                   valid_lanes: jnp.ndarray | None = None) -> PairList:
    """Rebuild epilogue: candidate rows -> compacted PairList.

    Split out of ``rebuild`` verbatim so the split-rebuild mode
    (EngineConfig.split_rebuild_programs) can jit it as its own
    program; the fused ``rebuild`` composes the same functions in
    one trace, so its HLO is unchanged (scripts/hlo_hash.py).
    """
    table_dropped = pslot0 >= grid.num_cells * grid.capacity
    if valid_lanes is not None:
        table_dropped = table_dropped & valid_lanes
    # A full top-k emission means in-reach neighbours may have been
    # dropped; such particles are queued for ONE research_top_k-wide
    # re-search next step (pending1) so coverage stays exact.  (Keeping
    # them permanently hot flooded the per-step research appends: 2,257
    # full emissions measured at top_k=4 / 1M particles.)
    full_mask = cands[:, -1] >= 0

    # Entries (i, c): the one-sided half-shell sweep already emitted
    # each pair exactly once, from its cell-lexicographically-lower
    # side (lower id/GID only within the self cell).  That emitting
    # cell is one of the pair's two ENDPOINT cells, so under sharding
    # it lies inside both shards' halo-padded windows and both keep an
    # entry for every shared boundary pair.  Two-stage compaction:
    # first the particles owning any entry, then their entries -- a
    # single nonzero over all N*top_k entry slots measured 70
    # ms/rebuild at 1M.
    valid = cands >= 0
    if ids is not None and valid_lanes is not None:
        valid = valid & valid_lanes[:, None]
        full_mask = full_mask & valid_lanes
        clipped = clipped & valid_lanes
        unswept = unswept & valid_lanes
    m_cap = pcfg.pair_capacity
    has = jnp.any(valid, axis=1)
    pidx = compact_indices(has, m_cap, n)
    p_ok = pidx < n
    p_safe = jnp.where(p_ok, pidx, 0)
    pv = valid[p_safe] & p_ok[:, None]           # (m_cap, top_k)
    pc = cands[p_safe]
    mk = m_cap * pcfg.top_k
    sel = compact_indices(pv.reshape(-1), m_cap, mk)
    ok = sel < mk
    sel_safe = jnp.where(ok, sel, 0)
    a = jnp.where(ok, pidx[sel_safe // pcfg.top_k], n).astype(jnp.int32)
    b = jnp.where(ok, pc.reshape(-1)[sel_safe], n).astype(jnp.int32)
    count = jnp.sum(valid, dtype=jnp.int32)
    dropped = jnp.maximum(count - m_cap, 0) + jnp.maximum(
        jnp.sum(has, dtype=jnp.int32) - m_cap, 0
    )
    return PairList(
        a=a, b=b,
        cursor=jnp.minimum(count, m_cap),
        age=jnp.zeros((), jnp.int32),
        mega0=mega0,
        pslot0=pslot0,
        hot=clipped | table_dropped | unswept,
        pending1=full_mask,
        overflow=old.overflow + dropped,
        # Strays binned outside the active-cell list count as spills
        # alongside capacity overflow: both route the particle hot, and
        # a too-tight active margin must be visible in telemetry
        # (measure.hot_spill_count), not a silent throughput sink.
        spill=old.spill + cell_overflow
        + jnp.sum(unswept, dtype=jnp.int32),
    )




def test_and_resolve(
    state: ParticleState,
    measure: Measurements,
    pairs: PairList,
    cr: float,
    num_bins: int,
    hist_hi: float,
    event_capacity: int,
    ids: jnp.ndarray | None = None,
    local_mask: jnp.ndarray | None = None,
):
    """Exact per-step narrow phase on the listed pairs.

    Semantics identical to collide.resolve_collisions (same quadratic /
    rewind / impulse / replay, same lowest-index mutual-match rule, same
    measurement updates) -- but evaluated only on candidate entries.
    Returns (state, measure, n_collisions, collided_mask (N,)).

    Sharded-engine semantics (``ids``/``local_mask`` given): entries
    index LANES of the shard's combined local+ghost arrays; the mutual
    match orders partners by GLOBAL id (lane order is shard-relative,
    so both shards holding a boundary pair must agree on the winner);
    state updates apply to every lane (ghost mirrors stay bitwise-exact
    through the step -- the impulse formula is symmetric, so the owner
    computes the identical values), while measurement and the collision
    count apply only to local lanes, each pair counted once on the
    shard owning the lower global id.
    """
    n = state.pos.shape[0]
    m = pairs.a.shape[0]
    dtype = state.pos.dtype

    # One fused (N+1, 6) gather source; row n is a far-away dummy so
    # sentinel entries can never collide.
    sv = jnp.concatenate([state.pos, state.vel], axis=1)
    far = jnp.concatenate(
        [jnp.full((1, 3), 1e9, dtype), jnp.zeros((1, 3), dtype)], axis=1
    )
    sv = jnp.concatenate([sv, far], axis=0)
    pa = sv[pairs.a]                               # (M, 6)
    pb = sv[pairs.b]
    dxv = pb[:, :3] - pa[:, :3]
    # Sentinel entries (a == b == n) have dx = 0 and would "collide";
    # the validity mask is load-bearing, not belt-and-braces.
    colliding = (jnp.sum(dxv * dxv, axis=-1) < cr * cr) & (pairs.a < n)

    # Compact colliding entries (collisions are ~1e-3 of candidates).
    eidx = compact_indices(colliding, event_capacity, m)
    evalid = eidx < m
    safe_e = jnp.where(evalid, eidx, 0)
    ea = jnp.where(evalid, pairs.a[safe_e], n)
    eb = jnp.where(evalid, pairs.b[safe_e], n)
    ev_dropped = jnp.maximum(
        jnp.sum(colliding, dtype=jnp.int32) - event_capacity, 0
    )

    # Lowest-index mutual matching (== sweep-engine partner rule): each
    # particle's choice is its lowest-index overlapping partner; a pair
    # resolves iff the choice is mutual.  With ids, "index" means the
    # GLOBAL id (shard-consistent); single-chip ids ARE the lanes.
    if ids is None:
        key_a, key_b = ea, eb
    else:
        gid_pad = jnp.concatenate(
            [ids.astype(jnp.int32), jnp.asarray([INT_BIG], jnp.int32)]
        )
        key_a = gid_pad[ea]
        key_b = gid_pad[eb]
    choice = jnp.full((n + 1,), INT_BIG, jnp.int32)
    choice = choice.at[ea].min(jnp.where(evalid, key_b, INT_BIG),
                               mode="drop")
    choice = choice.at[eb].min(jnp.where(evalid, key_a, INT_BIG),
                               mode="drop")
    mutual = evalid & (choice[jnp.clip(ea, 0, n)] == key_b) \
        & (choice[jnp.clip(eb, 0, n)] == key_a)

    # Reference collision kernel per entry (Open_Air_Pore_MC.py:181-240),
    # both sides at once; see collide.resolve_collisions for the maths.
    # (E-row gathers only.)
    row_a = sv[ea]
    row_b = sv[eb]
    pos_a, vel_a = row_a[:, :3], row_a[:, 3:6]
    pos_b, vel_b = row_b[:, :3], row_b[:, 3:6]
    dx = pos_b - pos_a
    dv = vel_a - vel_b
    aa = jnp.sum(dv * dv, axis=-1)
    bb = 2.0 * jnp.sum(dx * dv, axis=-1)
    cc = jnp.sum(dx * dx, axis=-1) - cr * cr
    disc = bb * bb - 4.0 * aa * cc
    ok = mutual & (aa > 0.0) & (disc >= 0.0) & (cc < 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(aa == 0.0, 1.0, aa)
    t = jnp.maximum((-bb + sq) / (2.0 * a_safe),
                    (-bb - sq) / (2.0 * a_safe))
    qa = pos_a - vel_a * t[:, None]
    qb = pos_b - vel_b * t[:, None]
    normal = (qb - qa) / cr
    p_scal = jnp.sum(dv * normal, axis=-1)
    new_vel_a = vel_a - p_scal[:, None] * normal
    new_vel_b = vel_b + p_scal[:, None] * normal
    new_pos_a = qa + new_vel_a * t[:, None]
    new_pos_b = qb + new_vel_b * t[:, None]

    ea_s = jnp.where(ok, ea, n)   # scatter target n+ drops below
    eb_s = jnp.where(ok, eb, n)

    # Per-particle event fields (duplicate entries write identical
    # values, so .set scatters are idempotent).
    mask_n = jnp.zeros((n,), jnp.bool_)
    mask_n = mask_n.at[ea_s].set(True, mode="drop")
    mask_n = mask_n.at[eb_s].set(True, mode="drop")
    t_n = jnp.zeros((n,), dtype)
    t_n = t_n.at[ea_s].set(t, mode="drop")
    t_n = t_n.at[eb_s].set(t, mode="drop")

    # Measurement BEFORE the state update (pre-collision velocity/paths);
    # local lanes only in sharded mode (ghost lanes are measured by
    # their owner).
    mask_meas = mask_n if local_mask is None else (mask_n & local_mask)
    measure = measure_ops.record_completed(
        measure, state.paths, state.has_collided, state.vel, t_n,
        mask_meas, num_bins, hist_hi,
    )

    state.pos = state.pos.at[ea_s].set(new_pos_a, mode="drop")
    state.pos = state.pos.at[eb_s].set(new_pos_b, mode="drop")
    state.vel = state.vel.at[ea_s].set(new_vel_a, mode="drop")
    state.vel = state.vel.at[eb_s].set(new_vel_b, mode="drop")
    state = measure_ops.end_paths(state, mask_n, t_n, state.vel,
                                  zero_residual=False)

    if local_mask is None:
        n_collisions = jnp.sum(mask_n, dtype=jnp.int32) // 2
    else:
        # Each pair counted once globally: by the shard owning the
        # LOWER global id (psum across shards gives the total).  The
        # partner's gid rides a .set scatter (duplicate entries write
        # identical values, so the scatter is idempotent and duplicated
        # research entries cannot double-count).
        pgid_n = jnp.full((n,), INT_BIG, jnp.int32)
        pgid_n = pgid_n.at[ea_s].set(key_b, mode="drop")
        pgid_n = pgid_n.at[eb_s].set(key_a, mode="drop")
        n_collisions = jnp.sum(
            mask_n & local_mask & (ids.astype(jnp.int32) < pgid_n),
            dtype=jnp.int32,
        )
    measure.collision_count = measure.collision_count + n_collisions
    measure.overflow_count = measure.overflow_count + ev_dropped
    return state, measure, n_collisions, mask_n


def research_dirty(
    state: ParticleState,
    pairs: PairList,
    dirty_idx: jnp.ndarray,        # (E,) int32, sentinel >= n
    bump: jnp.ndarray,             # (N,) bool: speed actually changed
    grid: collide.DeviceGrid,
    pcfg: PairConfig,
    cr: float,
    dt: float,
    ids: jnp.ndarray | None = None,
):
    """Re-search dirty particles against the rebuild-time planes.

    Radius: reach_now(i) + reach0(j), where reach0 rides in mega0's 5th
    plane.  For this to stay a valid bound after SPEED CHANGES, every
    speed-changed particle's own stored reach0 is bumped in place by its
    new full-window allowance (|v_new| K dt): by induction, whenever any
    particle re-searches, every candidate's stored reach still bounds
    its displacement from the stored position (each past speed change
    re-searched with the then-current invariant AND restored it).
    Teleported / reach-clipped particles break the position bound
    entirely and are instead kept in the HOT set (re-searched with fresh
    position every step), closing coverage exactly.

    Returns (pairs, coverage_lost, latent_per) where ``latent_per`` is
    the (E,) per-dirty-particle count of candidates already within cr
    of their stored position (the realized one-step-latency indicator;
    see the inline comment at the hit test).
    """
    n = state.pos.shape[0]
    cap = grid.capacity
    e = dirty_idx.shape[0]
    # Plane layout in mega0: [x, y, z, lane(, gid), reach]; the id plane
    # exists only in sharded mode (ids given).
    reach_plane = 4 if ids is None else 5
    id_plane = 4 if ids is not None else None
    valid = dirty_idx < n
    safe = jnp.where(valid, dirty_idx, 0)
    pos_i = state.pos[safe]
    vel_i = state.vel[safe]
    max_reach = 0.5 * grid.cell_size
    reach_i, clipped_i = reach_radii(vel_i, cr, dt, pcfg.rebuild_interval,
                                     max_reach)
    pairs.hot = pairs.hot.at[safe].set(
        pairs.hot[safe] | (valid & clipped_i), mode="drop"
    )
    # A hot particle is re-searched with its FRESH position every step,
    # which bounds what it can touch by one step of drift -- count the
    # (physically absurd: ~40 km/s at pore resolution) case where even
    # that bound fails (module docstring "one-step latency").
    speed_i = jnp.linalg.norm(vel_i, axis=-1)
    unbounded = jnp.sum(
        valid & (speed_i * dt > max_reach - 0.5 * cr), dtype=jnp.int32
    )
    pairs.overflow = pairs.overflow + unbounded

    # In-place reach bump for speed-changed particles: reach0 +=
    # |v_new| K dt (additive: old segment covered by the old value, new
    # segment by the increment).  Clip -> hot.
    bump_i = valid & bump[safe]
    rows_b = pairs.pslot0[safe] // cap
    cols_b = reach_plane * cap + pairs.pslot0[safe] % cap
    flat0 = pairs.mega0.reshape(-1)
    stride = pairs.mega0.shape[1]
    tgt = jnp.where(bump_i, rows_b * stride + cols_b, flat0.shape[0])
    old_reach = flat0[jnp.clip(tgt, 0, flat0.shape[0] - 1)]
    inc = (reach_i - 0.5 * cr)  # |v_new| K dt (possibly clipped)
    new_reach = jnp.minimum(old_reach + inc, max_reach)
    newly_clipped = bump_i & (old_reach + inc > max_reach)
    pairs.mega0 = flat0.at[tgt].set(new_reach, mode="drop").reshape(
        pairs.mega0.shape
    )
    pairs.hot = pairs.hot.at[safe].set(
        pairs.hot[safe] | newly_clipped, mode="drop"
    )

    cid = collide.assign_cells(pos_i, grid)
    nbr = grid.neighbors[cid]                      # (E, 27)
    rows = pairs.mega0[nbr]                        # (E, 27, 5*cap)
    w = 27 * cap

    def plane(k):
        return rows[:, :, k * cap:(k + 1) * cap].reshape(e, w)

    def unpack_int(p):
        # Value conversion, not bitcast (ops/collide.cell_candidate_
        # search packs planes the same way; bitcast denormals are
        # flushed by the XLA CPU backend).
        return p.astype(jnp.int32)

    cx, cy, cz = plane(0), plane(1), plane(2)
    cix = unpack_int(plane(3))
    cr0 = plane(reach_plane)

    dx = pos_i[:, 0][:, None] - cx
    dy = pos_i[:, 1][:, None] - cy
    dz = pos_i[:, 2][:, None] - cz
    d2 = dx * dx + dy * dy + dz * dz
    thresh = reach_i[:, None] + cr0
    if ids is None:
        not_self = cix != dirty_idx[:, None]
    else:
        # A particle and its ghost copy occupy different lanes; global
        # ids are the identity (ops/collide.cell_candidate_search).
        cgid = unpack_int(plane(id_plane))
        not_self = cgid != ids.astype(jnp.int32)[safe][:, None]
    hit = (d2 < thresh * thresh) & not_self \
        & valid[:, None] & (cix >= 0) & (cix < n)
    # Realized one-step-latency diagnostic: candidates ALREADY within
    # cr of their stored rebuild-time position at research time.  Such
    # an overlap resolves next step (research runs after this step's
    # narrow phase) where the per-step sweep would resolve it this
    # step -- the measured counterpart of the module docstring's
    # latency classes, including the energized-wall replay edge (a
    # just-boosted particle's post-wall replay can close an unlisted
    # gap within the same step; bounded by v_new*dt of slack, see
    # StepMetrics.latent_research).  Stored positions lag true ones by
    # consumed reach, so this is an indicator, not an exact event
    # count.
    latent_per = jnp.sum(
        hit & (d2 < cr * cr), axis=-1
    ).astype(jnp.int32)

    # Top-k lowest-index candidates per dirty particle.
    masked = jnp.where(hit, cix, INT_BIG)
    cands = []
    prev = None
    for _ in range(pcfg.research_top_k):
        if prev is not None:
            masked = jnp.where(masked > prev[:, None], masked, INT_BIG)
        prev = jnp.min(masked, axis=-1)
        cands.append(prev)
    cands = jnp.stack(cands, axis=-1)              # (E, RK)
    res_overflow = jnp.sum(
        (cands[:, -1] < INT_BIG) & valid, dtype=jnp.int32
    )

    # Append as (i, c) entries at the cursor (order irrelevant:
    # test_and_resolve treats entries symmetrically, duplicates are
    # idempotent).
    ok = cands < INT_BIG
    flat_ok = ok.reshape(-1)
    erk = e * pcfg.research_top_k
    sel = compact_indices(flat_ok, pcfg.append_capacity, erk)
    sel_ok = sel < erk
    sel_safe = jnp.where(sel_ok, sel, 0)
    new_a = jnp.where(
        sel_ok, dirty_idx[sel_safe // pcfg.research_top_k], n
    ).astype(jnp.int32)
    new_b = jnp.where(sel_ok, cands.reshape(-1)[sel_safe], n).astype(
        jnp.int32
    )
    n_new = jnp.minimum(
        jnp.sum(flat_ok, dtype=jnp.int32), pcfg.append_capacity
    )
    app_dropped = jnp.maximum(
        jnp.sum(flat_ok, dtype=jnp.int32) - pcfg.append_capacity, 0
    )

    m_cap = pairs.a.shape[0]
    # Ring-free bump append: entries past capacity are dropped+counted.
    write_pos = pairs.cursor + jnp.arange(pcfg.append_capacity,
                                          dtype=jnp.int32)
    in_cap = (write_pos < m_cap) & (jnp.arange(
        pcfg.append_capacity, dtype=jnp.int32) < n_new)
    tgt = jnp.where(in_cap, write_pos, m_cap)      # m_cap -> dropped
    pairs.a = pairs.a.at[tgt].set(jnp.where(in_cap, new_a, n),
                                  mode="drop")
    pairs.b = pairs.b.at[tgt].set(jnp.where(in_cap, new_b, n),
                                  mode="drop")
    cap_dropped = jnp.sum(
        (jnp.arange(pcfg.append_capacity, dtype=jnp.int32) < n_new)
        & ~in_cap, dtype=jnp.int32)
    pairs.cursor = jnp.minimum(pairs.cursor + n_new, m_cap)
    pairs.overflow = (pairs.overflow + res_overflow + app_dropped
                      + cap_dropped)
    # Any truncation here is a potential coverage hole; the engine
    # forces a full rebuild on the next step when this fires.
    lost = (res_overflow + app_dropped + cap_dropped) > 0
    return pairs, lost, latent_per


def default_pair_config(n: int, rebuild_interval: int,
                        pair_expectation: float | None = None,
                        spill_hot: int = 0) -> PairConfig:
    """Capacity heuristics at ambient argon density.

    ``pair_expectation`` is the expected in-reach CANDIDATE count per
    particle, lambda(K) = density * 4/3 pi (cr + 2 v_mean K dt)^3 (the
    engine computes it from the workload physics); entries stored are
    ~lambda/2 per particle and the buffer takes 2x margin.  Dirty/event/
    append traffic scales with N (collisions + energized wall hits per
    step).  top_k=5 with full emissions queued for a one-shot re-search:
    permanent hot membership for full emissions measured 2,257 particles
    at top_k=4 / 1M (fast particles have inflated reach) and their
    every-step re-search overflowed the appends into a rebuild storm.
    Every capacity breach is still counted in ``PairList.overflow`` and
    forces a rebuild, never a silent loss.
    """
    import math

    lam = 0.5 if pair_expectation is None else pair_expectation
    # Per-particle EMISSION tail.  The sweep is one-sided (each pair
    # emitted once, from its cell-lexicographically-lower side), which
    # halves the MEAN emission count -- but ownership is NOT an iid
    # 1/2-thinning per pair: within a cell the lowest ids own nearly
    # all their pairs, and a particle whose cell precedes its 14
    # half-shell neighbours owns every cross-cell pair it touches.  The
    # tail of the per-particle emission count is therefore governed by
    # the FULL candidate rate lam, not lam/2, further overdispersed by
    # the Maxwell reach mixture (reach_i ~ cr/2 + |v_i| K dt, so fast
    # particles see a larger in-reach volume).  Measured at 10M / K=8
    # (CPU probe, round 3): 34,352 full emissions per steady-state
    # rebuild at top_k=3 vs 770 predicted by the old Poisson(lam/2)
    # model and 11,000 by Poisson(lam) -- a 3.1x mixture factor on the
    # full-lam tail.  OVERDISP=3.5 calibrates that measurement with
    # margin; the old lam/2 model undersized the one-shot research
    # budget 45x at 10M (every 8th step dropped ~24k researches,
    # counted in overflow_count but a standing coverage degradation vs
    # the per-step sweep).
    lam_emit = lam
    OVERDISP = 3.5
    # lambda-aware top_k (VERDICT r2 weak #7, the K=12 cliff): the
    # rebuild-time full-emission count is ~ n * P[emissions > top_k];
    # at fixed top_k=5, K=12 (lam ~ 1.0) produced a burst that blew the
    # one-shot research budget and degenerated into a rebuild storm.
    # Grow top_k until the expected full emissions fit ~1/4 of the
    # research budget, and size the research/append buffers for the
    # burst that remains.  top_k starts low: every extra slot is a full
    # masked min-pass over the sweep's (cells, cap, 27*cap) lanes --
    # the rebuild's dominant VPU cost.
    research = max(4096, n // 256)
    top_k = 3
    def tail(k):  # OVERDISP * P[Poisson(lam_emit) >= k]
        p = math.exp(-lam_emit)
        cdf = p
        for i in range(1, k):
            p *= lam_emit / i
            cdf += p
        return OVERDISP * max(1.0 - cdf, 0.0)
    while top_k < 12 and n * tail(top_k + 1) > research / 4:
        top_k += 1
    burst = int(n * tail(top_k + 1)) + 64
    research = max(research, 4 * burst)
    # Standing hot membership from expected cell-table spills (thin
    # capacities; engine.pairs_config_for computes the Poisson-tail
    # expectation with 1.5x margin): hot particles re-search every
    # step of the window, so they occupy research lanes ON TOP of the
    # per-step dirty/burst traffic.  Small expectations (the default
    # ~3.75-sigma capacity gives ~tens) are absorbed by the existing
    # margins -- keeping the threshold also keeps program shapes (and
    # the persistent compile cache) stable across this sizing.
    if spill_hot >= 256:
        research = research + spill_hot
    # The one-shot burst re-searches at research_top_k(12) candidates
    # each; the r2 K=12 cliff was these appends overflowing and forcing
    # a rebuild storm, so the append budget covers the worst-case burst
    # on top of the steady-state allowance.
    append = 2 * research + 12 * burst
    if pair_expectation is None:
        main = n // 4
    else:
        # Entries stored ~ n*lambda/2; 1.5x margin (overflow forces a
        # rebuild and is counted, never silent, so the margin trades a
        # vanishing overflow risk against two M-row gathers per step).
        main = int(n * pair_expectation * 0.75)
    return PairConfig(
        rebuild_interval=rebuild_interval,
        pair_capacity=max(main, n // 4, 4096) + rebuild_interval * append,
        event_capacity=max(8192, n // 256),
        research_capacity=research,
        research_top_k=12,
        # 2x headroom: the one-shot post-rebuild research of full-
        # emission particles appends in a burst.
        append_capacity=append,
        top_k=top_k,
    )
