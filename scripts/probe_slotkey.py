"""On-chip probe: does slot-key candidate encoding pay? (roadmap #4)

The rebuild sweep packs FIVE planes per cell row into ``mega``
(x, y, z, index, reach; ops/collide.cell_candidate_search) and its
dominant bandwidth term is the per-group ``mega[sel]`` row gather.
The INDEX plane exists only to serve as the masked-min operand (and
the one-sided self-cell id test).  Both are computable from statically
known lane positions instead:

    slot_key(row, lane) = row * cap + lane

* masked-min operand: ``key = sel*cap + iota`` -- broadcast compute,
  zero gathered bytes;
* self-cell id test: the stable cell sort makes slot order == index
  order within a cell, so ``key > own_key`` (own_key = pslot) decides
  the self-cell side exactly like ``id > own_id``;
* the emitted top-k keys convert back to particle indices with ONE
  small flat gather through the cell table
  (``table.reshape(-1)[key]``), and research_dirty converts its
  research_top_k winners the same way (its not-self test becomes
  ``key != pslot0[i]``).

Dropping the index plane shrinks ``mega`` 5 -> 4 planes (-20% pack
and neighbour-gather bandwidth, -20% mega0 HBM at 10M).  The ordering
of candidates changes from lowest-INDEX to lowest-SLOT-KEY across
cells (identical within a cell); the pair-list coverage argument is
order-independent (truncated emitters queue for pending1 re-search),
so the engine's bitwise-vs-sweep trajectory guarantee is preserved --
but whether the bandwidth saving beats the added key conversions on
THIS chip's cost model is a measurement, hence this probe, run BEFORE
building the engine change (same discipline as probe_mxu_hit.py,
which killed the MXU bilinear form with numbers).

Usage (TPU must be free):  python scripts/probe_slotkey.py [N]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
INT_BIG = jnp.int32(2**30)


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:52s} {best*1e3:8.2f} ms")
    return best


def slotkey_search(pos, reach, grid, top_k):
    """Half-shell one-sided candidate search, slot-key form.

    Mirrors ops/collide.cell_candidate_search (single-chip, reach
    mode, one_sided + half_shell, full cell iteration) except the
    packed planes carry NO index plane: the masked-min operand and the
    self-cell ordering test are computed from (row, lane) slot keys,
    and the emitted keys are converted to particle indices afterwards
    through the cell table.
    """
    from argon_monte_carlo_tpu.ops import collide

    n = pos.shape[0]
    cap = grid.capacity
    num_rows = grid.num_cells + 1
    cell_id = collide.assign_cells(pos, grid)
    table, overflow, pslot = collide.build_cell_table(cell_id, grid)

    flat_idx = table.reshape(-1)
    in_slot = flat_idx < n
    src = jnp.where(in_slot, flat_idx, 0)
    far = jnp.asarray(1e9, pos.dtype)
    gath = jnp.concatenate([pos, reach.astype(pos.dtype)[:, None]], axis=1)
    packed = jnp.where(in_slot[:, None], gath[src], far)

    def plane(col):
        return packed[:, col].reshape(num_rows, cap)

    px, py, pz = plane(0), plane(1), plane(2)
    pr = jnp.where(in_slot.reshape(num_rows, cap), plane(3), 0.0)
    # FOUR planes -- no index plane (the saving under test).
    mega = jnp.concatenate([px, py, pz, pr], axis=1)

    group = max(1, min(27, 128 // cap))
    chunk = max(4096, (64 * 1024 * 1024) // (cap * group * cap))
    width = grid.num_cells
    n_chunks = -(-width // chunk)
    chunk = -(-width // n_chunks)  # balance the chunks
    pad_rows = max(n_chunks * chunk - width, 0)
    nbr_p = jnp.pad(grid.neighbors, ((0, pad_rows), (0, 0)),
                    constant_values=grid.num_cells)
    px_p = jnp.pad(px, ((0, pad_rows), (0, 0)), constant_values=1e9)
    py_p = jnp.pad(py, ((0, pad_rows), (0, 0)), constant_values=1e9)
    pz_p = jnp.pad(pz, ((0, pad_rows), (0, 0)), constant_values=1e9)
    pr_p = jnp.pad(pr, ((0, pad_rows), (0, 0)), constant_values=0.0)

    lane_iota = jnp.arange(cap, dtype=jnp.int32)

    def sweep_chunk(c0):
        def window(p):
            return jax.lax.dynamic_slice_in_dim(p, c0, chunk, axis=0)

        nbr = jax.lax.dynamic_slice_in_dim(nbr_p, c0, chunk, axis=0)
        ox, oy, oz = window(px_p), window(py_p), window(pz_p)
        orc = window(pr_p)
        # Emitter lane's OWN slot key: (c0 + row) * cap + lane.
        row_ids = c0 + jnp.arange(chunk, dtype=jnp.int32)
        own_key = row_ids[:, None] * cap + lane_iota[None, :]
        bests = tuple(own_key * 0 + INT_BIG for _ in range(top_k))

        for o0 in range(13, 27, group):
            sel = nbr[:, o0:o0 + group]                # (chunk, g)
            g = sel.shape[1]
            block = mega[sel]                          # (chunk, g, 4*cap)

            def part(k):
                return block[:, :, k * cap:(k + 1) * cap].reshape(
                    chunk, g * cap
                )

            nx_, ny_, nz_ = part(0), part(1), part(2)
            # Candidate slot keys: computed, not gathered.  Empty/dummy
            # rows die on the far-sentinel position, so no validity
            # plane is needed (exactly like the index form).
            nkey = (sel[:, :, None] * cap
                    + lane_iota[None, None, :]).reshape(chunk, g * cap)
            dx = ox[:, :, None] - nx_[:, None, :]
            dy = oy[:, :, None] - ny_[:, None, :]
            dz = oz[:, :, None] - nz_[:, None, :]
            d2 = dx * dx + dy * dy + dz * dz
            thresh = orc[:, :, None] + part(3)[:, None, :]
            in_range = d2 < thresh * thresh
            if o0 <= 13 < o0 + g:
                self_lanes = jnp.asarray(
                    np.repeat(np.arange(o0, o0 + g) == 13, cap)
                )
                hit = in_range & jnp.where(
                    self_lanes[None, None, :],
                    nkey[:, None, :] > own_key[:, :, None],
                    True,
                )
            else:
                hit = in_range
            masked = jnp.where(hit, nkey[:, None, :], INT_BIG)
            prev = None
            for k in range(top_k):
                if prev is not None:
                    masked = jnp.where(
                        masked > prev[:, :, None], masked, INT_BIG
                    )
                cand = jnp.min(masked, axis=-1)
                prev = cand
                new = []
                for b in bests:
                    lo = jnp.minimum(b, cand)
                    cand = jnp.maximum(b, cand)
                    new.append(lo)
                bests = tuple(new)
        return jnp.stack(bests, axis=-1)               # (chunk, cap, K)

    if n_chunks == 1:
        key_flat = sweep_chunk(jnp.int32(0)).reshape(-1, top_k)
    else:
        _, parts = jax.lax.scan(
            lambda carry, c0: (carry, sweep_chunk(c0)),
            None,
            jnp.arange(n_chunks, dtype=jnp.int32) * chunk,
        )
        key_flat = parts.reshape(-1, top_k)[: width * cap]
    # Read back to particle order through the particle->slot map (the
    # same N-sized gather as the index form), THEN convert the (N, K)
    # winning keys to particle indices with one flat gather through the
    # cell table -- the conversion the dropped index plane used to
    # amortize.
    in_window = pslot < width * cap
    rel = jnp.clip(pslot, 0, width * cap - 1)
    keys_p = jnp.where(in_window[:, None], key_flat[rel], INT_BIG)
    ktab = jnp.pad(flat_idx, (0, 1), constant_values=n)
    cands = jnp.where(
        keys_p >= INT_BIG, -1,
        ktab[jnp.minimum(keys_p, num_rows * cap)]
    )
    return cands, key_flat, overflow


def main():
    import argon_monte_carlo_tpu as amc
    from argon_monte_carlo_tpu.engine import Simulation, pairs_config_for
    from argon_monte_carlo_tpu.ops import collide, pairs as pairs_ops

    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           steps_per_epoch=8, narrowphase="pairs",
                           rebuild_interval=8)
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
    wl = amc.make_workload(cfg)
    sim = Simulation(wl)
    state, measure, key = sim.init()
    grid = sim._dgrid
    pcfg = pairs_config_for(wl)
    cap = grid.capacity
    print(f"N={cfg.num_molecules} cells={grid.num_cells} cap={cap} "
          f"top_k={pcfg.top_k} planes 5->4")
    cr = cfg.physics.collision_range
    dt = cfg.dt
    max_reach = 0.5 * grid.cell_size
    reach = pairs_ops.reach_radii(state.vel, cr, dt,
                                  pcfg.rebuild_interval, max_reach)[0]
    # Strip the active-cell list for the timed comparison: the slot-key
    # variant here sweeps every cell, so the index form must too --
    # the probe isolates the PLANE-COUNT effect, not the (orthogonal,
    # already-landed) active-row reduction.
    import dataclasses
    grid_na = dataclasses.replace(grid, active_cells=None,
                                  active_rank=None)

    # --- pair-set equality self-check at small N (CPU-fast) ----------
    small = amc.temperature_pore_config(engine=eng).scaled_to(30_000)
    swl = amc.make_workload(small)
    ssim = Simulation(swl)
    sstate, _, _ = ssim.init()
    sgrid = ssim._dgrid
    spcfg = pairs_config_for(swl)
    import dataclasses as _dc
    sgrid_na = _dc.replace(sgrid, active_cells=None, active_rank=None)
    sreach = pairs_ops.reach_radii(
        sstate.vel, small.physics.collision_range, small.dt,
        spcfg.rebuild_interval, 0.5 * sgrid.cell_size)[0]
    ref_c, _, _ = collide.cell_candidate_search(
        sstate.pos, sgrid_na, reach=sreach, top_k=spcfg.top_k,
        one_sided=True, half_shell=True)
    got_c, _, _ = slotkey_search(sstate.pos, sreach, sgrid_na,
                                 spcfg.top_k)
    sn = sstate.pos.shape[0]

    def pair_set(cands):
        a = np.repeat(np.arange(cands.shape[0]), cands.shape[1])
        b = np.asarray(cands).reshape(-1)
        m = (b >= 0) & (b < sn)
        return set(map(tuple, np.sort(
            np.stack([a[m], b[m]], -1), axis=-1)))

    s_ref, s_got = pair_set(ref_c), pair_set(got_c)
    # The slot-key ordering may TRUNCATE a different top-k subset when
    # an emitter has more than top_k in-reach neighbours; both sides
    # then queue for pending1 research.  Equality is expected on the
    # iid initial state (multi-candidate emitters are rare), so report
    # both the symmetric difference and full-emitter counts.
    print(f"pair-set check @30k: ref={len(s_ref)} slotkey={len(s_got)} "
          f"sym-diff={len(s_ref ^ s_got)} "
          f"(full emitters ref={int(np.sum(np.asarray(ref_c)[:, -1] >= 0))}"
          f" got={int(np.sum(np.asarray(got_c)[:, -1] >= 0))})")

    # --- the decisive timing: 5-plane index form vs 4-plane key form --
    cur = jax.jit(lambda p, r: collide.cell_candidate_search(
        p, grid_na, reach=r, top_k=pcfg.top_k, one_sided=True,
        half_shell=True)[0])
    sk = jax.jit(lambda p, r: slotkey_search(p, r, grid_na,
                                             pcfg.top_k)[0])
    t_cur = timeit("candidate search, 5-plane index form", cur,
                   state.pos, reach)
    t_sk = timeit("candidate search, 4-plane slot-key form", sk,
                  state.pos, reach)
    print(f"slotkey/current ratio: {t_sk/t_cur:.3f} "
          f"(<1 means the bandwidth saving wins)")
    # Context: the shipping active-cell index form on the real grid.
    cur_act = jax.jit(lambda p, r: collide.cell_candidate_search(
        p, grid, reach=r, top_k=pcfg.top_k, one_sided=True,
        half_shell=True)[0])
    timeit("candidate search, 5-plane + active rows", cur_act,
           state.pos, reach)

    # --- research_dirty-side conversion cost ---------------------------
    # Under slot keys research's winners need key->index conversion:
    # a (E, RK) flat gather through the padded table.
    e = max(16384, N // 64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fake_keys = jax.random.randint(
        k1, (e, pcfg.research_top_k), 0, (grid.num_cells + 1) * cap
    ).astype(jnp.int32)
    table, _, _ = collide.build_cell_table(
        collide.assign_cells(state.pos, grid), grid)
    ktab = jnp.pad(table.reshape(-1), (0, 1),
                   constant_values=state.pos.shape[0])

    def convert(keys):
        return ktab[keys]

    timeit(f"research key->index gather ({e}x{pcfg.research_top_k})",
           jax.jit(convert), fake_keys)

    # Context: the full current rebuild.
    plist = sim._init_aux(state)
    reb = jax.jit(lambda s, p: pairs_ops.rebuild(s, grid, pcfg, cr, dt, p))
    timeit("rebuild (current engine, end-to-end)", reb, state, plist)


if __name__ == "__main__":
    main()
