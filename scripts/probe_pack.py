"""On-chip probe: can the rebuild's slot-plane pack drop the per-slot
gather?

The rebuild packs per-slot coordinate planes with ONE gather over every
(cell, slot) lane: ``packed = gath[src]`` where ``src`` is the
(rows*cap,) slot->particle table (ops/collide.cell_candidate_search).
Gather cost on this chip is ~6-8 ns per ROW regardless of width, so at
1M particles (180k cells x 24 slots = 4.3M slot rows for 1M real
particles) ~77% of the gather rows are EMPTY-slot sentinel reads --
~25 ms of pure padding per rebuild.

Candidate replacement: the cell table already comes from one argsort,
so the particle data can be laid out CELL-CONTIGUOUS (sorted by cell),
and each cell's cap-wide slot row is then a contiguous SLICE of the
sorted array: a gather of `rows` slice-rows (one per cell, width
cap*planes) instead of rows*cap element-rows.  If slice-gathers cost
per-ROW like everything else, the pack drops from ~4.3M row-reads to
~1M (the sort's data movement) + 180k (the slice gather) + a masked
fixup pass -- worth ~2 ms/step amortized at K=8.  This probe measures
each candidate formulation in isolation BEFORE any engine change
(pattern: scripts/probe_mxu_hit.py, whose MXU answer killed that
rewrite).

Variants measured (all produce the same (rows, cap, P) planes up to
slot order within a cell):
  a. per-slot gather            gath[src]                 (the engine today)
  b. argsort+row gather+slice   gath[order] -> slice-gather via starts
  c. multi-operand lax.sort     sort data alongside keys -> slice-gather
  d. slice-gather alone         (b/c's second stage, isolated)
  e. fixup mask alone           rank-vs-count masking + transpose

Usage (TPU must be free):  python scripts/probe_pack.py [N]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
P = 5  # packed planes: x, y, z, index-as-float, reach


def timeit(label, fn, *args, reps=7):
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
    print(f"{label:52s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    import argon_monte_carlo_tpu as amc
    from argon_monte_carlo_tpu.engine import Simulation
    from argon_monte_carlo_tpu.ops import collide

    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           steps_per_epoch=8, narrowphase="pairs",
                           rebuild_interval=8)
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
    wl = amc.make_workload(cfg)
    sim = Simulation(wl)
    state, measure, key = sim.init()
    grid = sim._dgrid
    n = state.pos.shape[0]
    cap = grid.capacity
    rows = grid.num_cells + 1
    print(f"probe_pack: n={n} cells+1={rows} cap={cap} "
          f"slots={rows*cap} ({rows*cap/max(n,1):.1f}x n)", flush=True)

    cell_id = collide.assign_cells(state.pos, grid)
    reach = jnp.linalg.norm(state.vel, axis=-1) * (8 * cfg.dt) + 1e-10
    gath = jnp.concatenate(
        [state.pos,
         jnp.arange(n, dtype=jnp.float32)[:, None],
         reach.astype(jnp.float32)[:, None]], axis=1)          # (n, P)

    table, overflow, pslot = jax.jit(
        lambda c: collide.build_cell_table(c, grid))(cell_id)
    jax.block_until_ready(table)

    # --- a. engine today: per-slot gather over rows*cap lanes ---------
    def pack_slot_gather(table, gath):
        flat_idx = table.reshape(-1)
        in_slot = flat_idx < n
        src = jnp.where(in_slot, flat_idx, 0)
        far = jnp.asarray(1e9, jnp.float32)
        packed = jnp.where(in_slot[:, None], gath[src], far)
        return packed.reshape(rows, cap * P)

    # --- starts/counts from a sorted cell-id array --------------------
    def starts_counts(sorted_cid):
        idx = jnp.arange(n, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sorted_cid[1:] != sorted_cid[:-1]]
        )
        # starts[c] = first sorted position of cell c; scatter-min of
        # segment heads (empty cells keep the n sentinel).
        starts = jnp.full((rows,), n, jnp.int32)
        head_cid = jnp.where(is_start, sorted_cid, rows)
        starts = starts.at[head_cid].min(idx, mode="drop")
        # next occupied start (suffix min) -> per-cell count; empty
        # cells clip to 0.
        ext = jnp.concatenate([starts, jnp.asarray([n], jnp.int32)])
        rev = jax.lax.associative_scan(jnp.minimum, ext, reverse=True)
        counts = jnp.clip(rev[1:] - starts, 0, cap)
        return starts, counts

    def slice_rows(sorted_pad, starts):
        def row(s):
            return jax.lax.dynamic_slice(sorted_pad, (s, 0), (cap, P))
        return jax.vmap(row)(starts)                   # (rows, cap, P)

    def slice_rows_1d(sorted_flat_pad, starts):
        # 1D formulation: one (cap*P,)-wide contiguous window per cell
        # from the flattened sorted array.  The 2D (cap, P) slice could
        # plausibly lower as cap separate row-reads; a flat window is
        # the closest HLO shape to the measured fixed-cost row gather.
        def row(s):
            return jax.lax.dynamic_slice(sorted_flat_pad, (s * P,),
                                         (cap * P,))
        return jax.vmap(row)(starts).reshape(-1, cap, P)

    def fixup(sliced, counts):
        k = jnp.arange(cap, dtype=jnp.int32)
        ok = k[None, :, None] < counts[:, None, None]
        far = jnp.asarray(1e9, jnp.float32)
        out = jnp.where(ok, sliced, far)
        # plane-major layout for the sweep: (rows, cap, P) -> (rows, P*cap)
        return jnp.transpose(out, (0, 2, 1)).reshape(rows, P * cap)

    def pipeline_b(cell_id, gath):
        order = jnp.argsort(cell_id)
        sorted_cid = cell_id[order]
        starts, counts = starts_counts(sorted_cid)
        sp = jnp.pad(gath[order], ((0, cap), (0, 0)), constant_values=1e9)
        return fixup(slice_rows(sp, starts), counts)

    def pipeline_c(cell_id, gath):
        ops = (cell_id,) + tuple(gath[:, k] for k in range(P))
        out = jax.lax.sort(ops, num_keys=1)
        sorted_cid = out[0]
        sorted_data = jnp.stack(out[1:], axis=1)
        starts, counts = starts_counts(sorted_cid)
        sp = jnp.pad(sorted_data, ((0, cap), (0, 0)), constant_values=1e9)
        return fixup(slice_rows(sp, starts), counts)

    # Prebuilt intermediates for the isolated stages.
    order = jax.jit(jnp.argsort)(cell_id)
    sorted_gath = jax.jit(lambda g, o: g[o])(gath, order)
    sorted_cid = jax.jit(lambda c, o: c[o])(cell_id, order)
    starts, counts = jax.jit(starts_counts)(sorted_cid)
    sorted_pad = jnp.pad(sorted_gath, ((0, cap), (0, 0)),
                         constant_values=1e9)
    sliced = jax.jit(slice_rows)(sorted_pad, starts)
    jax.block_until_ready((starts, sliced))

    timeit("a. per-slot gather (engine today)",
           jax.jit(pack_slot_gather), table, gath)
    timeit("b. argsort + row-gather + slice + fixup",
           jax.jit(pipeline_b), cell_id, gath)
    timeit("c. multi-operand sort + slice + fixup",
           jax.jit(pipeline_c), cell_id, gath)
    timeit("d. slice-gather alone (2D)", jax.jit(slice_rows),
           sorted_pad, starts)
    sorted_flat = sorted_pad.reshape(-1)
    timeit("d2. slice-gather alone (1D flat)", jax.jit(slice_rows_1d),
           sorted_flat, starts)
    timeit("e. fixup alone", jax.jit(fixup), sliced, counts)
    timeit("   argsort alone", jax.jit(jnp.argsort), cell_id)
    timeit("   row-gather alone", jax.jit(lambda g, o: g[o]),
           gath, order)
    timeit("   starts/counts alone", jax.jit(starts_counts), sorted_cid)
    timeit("   build_cell_table (for scale)",
           jax.jit(lambda c: collide.build_cell_table(c, grid)), cell_id)

    # Correctness cross-check: b == a as per-cell multisets (slot order
    # within a cell differs: table ranks vs sorted positions).
    a_val = jax.jit(pack_slot_gather)(table, gath).reshape(rows, cap, P)
    b_val = jax.jit(pipeline_b)(cell_id, gath).reshape(rows, P, cap)
    b_as_a = jnp.transpose(b_val, (0, 2, 1))
    a_s = jnp.sort(a_val[:, :, 0], axis=1)
    b_s = jnp.sort(b_as_a[:, :, 0], axis=1)
    diff = int(jnp.sum(a_s != b_s))
    print(f"cross-check mismatched x-plane elements: {diff}", flush=True)


if __name__ == "__main__":
    main()
