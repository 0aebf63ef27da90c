"""On-chip FINE-GRAINED rebuild attribution + two prototype levers.

profile_rebuild_phases.py's partial result (tunnel flake killed it
after two rows) already landed the headline: `table (assign+build)` is
62.8 ms standalone at 1M -- the unattributed `while.97` (~50
ms/rebuild) is the CELL TABLE BUILD, not the sweep.  This probe splits
that 63 ms into its constituent ops and measures two candidate levers
as standalone prototypes BEFORE any engine change (the warming 10M
compile caches must not be invalidated until the north-star bench
lands):

  assign         assign_cells as shipped (three 1M-row layer gathers)
  assign-packed  prototype: ONE (nz, 4) packed-layer row gather
  argsort        jnp.argsort(cid) -- the (key, iota) variadic sort
  sort-keys      jnp.sort(cid) -- keys-only lower bound for the sort
  scan-rank      the associative_scan rank pass
  scatter-table  table.at[slot].set(order) (1M -> (C+1)*cap)
  scatter-pslot  pslot.at[order].set(slot) (1M -> 1M)
  pack-gather    the mega plane pack: where(in_slot, gath[src], far)
  table-full     build_cell_table end-to-end (sanity vs the sum)
  rebuild-full   pairs_ops.rebuild end-to-end (the flake's missing row)
  hit-f32        sweep hit test, engine form (f32 throughout)
  hit-bf16-cast  REALISTIC bf16 form: f32 subtract (absolute positions
                 would lose ~2e-9 m to bf16 rounding -- larger than
                 cr), then cast the small differences to bf16, square/
                 compare in bf16 against a pre-widened threshold.
                 probe_bf16_vpu.py measured the ALL-bf16 form (inputs
                 already bf16: 0.901x); this measures what the engine
                 would actually run, casts included.

Usage: [BENCH_PARTICLES=1000000] python scripts/profile_rebuild_phases2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import (Simulation, build_grids,
                                          pairs_config_for)
from argon_monte_carlo_tpu.ops import collide, pairs as pairs_ops

N = int(os.environ.get("BENCH_PARTICLES", 1_000_000))
K = int(os.environ.get("BENCH_REBUILD_INTERVAL", 8))


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:42s} {best * 1e3:8.2f} ms", flush=True)
    return best


eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                       steps_per_epoch=K, hist_flush_interval=1,
                       narrowphase="pairs", rebuild_interval=K)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
wl = amc.make_workload(cfg)
sim = Simulation(wl)
_, dgrid = build_grids(wl)
pcfg = pairs_config_for(wl)
cr = cfg.physics.collision_range
dt = cfg.dt

state, measure, key = sim.init()
_ = float(state.pos[0, 0])
plist = sim._init_aux(state)
n = cfg.num_molecules
cap = dgrid.capacity
print(f"N={n} cap={cap} top_k={pcfg.top_k} "
      f"pair_cap={pcfg.pair_capacity} nz={dgrid.nz} "
      f"num_cells={dgrid.num_cells}", flush=True)

max_reach = 0.5 * dgrid.cell_size
reach, _ = pairs_ops.reach_radii(state.vel, cr, dt, K, max_reach)

# ---- assign_cells: shipped vs packed-layer prototype -----------------
timeit("assign (shipped, 3 layer gathers)", jax.jit(
    lambda pos: collide.assign_cells(pos, dgrid)), state.pos)

packed_layers = jnp.stack(
    [dgrid.nx.astype(jnp.float32),
     dgrid.half_extent.astype(jnp.float32),
     dgrid.layer_base.astype(jnp.float32),
     jnp.zeros((dgrid.nz,), jnp.float32)],
    axis=1,
)  # (nz, 4); nx/layer_base < 2^24 so the f32 round-trip is exact


def assign_packed(pos):
    x = pos[:, 0] - dgrid.center_x
    y = pos[:, 1] - dgrid.center_y
    z = pos[:, 2]
    iz = jnp.clip(
        jnp.floor((z - dgrid.z_lo) / dgrid.cell_size).astype(jnp.int32),
        0, dgrid.nz - 1,
    )
    row = packed_layers[iz]                       # ONE (N,)-row gather
    nx = row[:, 0].astype(jnp.int32)
    half = row[:, 1]
    base = row[:, 2].astype(jnp.int32)
    ix = jnp.clip(
        jnp.floor((x + half) / dgrid.cell_size).astype(jnp.int32),
        0, nx - 1,
    )
    iy = jnp.clip(
        jnp.floor((y + half) / dgrid.cell_size).astype(jnp.int32),
        0, nx - 1,
    )
    return base + iy * nx + ix


timeit("assign (packed-layer prototype)", jax.jit(assign_packed),
       state.pos)
cid_ref = jax.jit(lambda p: collide.assign_cells(p, dgrid))(state.pos)
cid_new = jax.jit(assign_packed)(state.pos)
print(f"packed-layer cid bitwise-equal: "
      f"{bool(jnp.all(cid_ref == cid_new))}", flush=True)

# ---- table build constituents ---------------------------------------
cid = cid_ref
timeit("argsort(cid)", jax.jit(jnp.argsort), cid)
timeit("sort(cid) keys-only", jax.jit(jnp.sort), cid)

order = jax.jit(jnp.argsort)(cid)
sorted_cid = cid[order]
idx = jnp.arange(n, dtype=jnp.int32)


def scan_rank(scid):
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), scid[1:] != scid[:-1]]
    )
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0)
    )
    return idx - first


timeit("scan-rank (associative_scan)", jax.jit(scan_rank), sorted_cid)
rank = jax.jit(scan_rank)(sorted_cid)
slot = jnp.where(rank < cap, sorted_cid * cap + rank,
                 dgrid.num_cells * cap).astype(jnp.int32)

timeit("scatter-table (1M -> (C+1)*cap)", jax.jit(
    lambda s, o: jnp.full(((dgrid.num_cells + 1) * cap,), n,
                          jnp.int32).at[s].set(o.astype(jnp.int32),
                                               mode="drop")),
       slot, order)
timeit("scatter-pslot (1M -> 1M)", jax.jit(
    lambda o, s: jnp.zeros((n,), jnp.int32).at[o].set(s)), order, slot)

table, _, pslot = jax.jit(
    lambda c: collide.build_cell_table(c, dgrid))(cid)


def pack_gather(tbl, pos, r):
    flat_idx = tbl.reshape(-1)
    in_slot = flat_idx < n
    src = jnp.where(in_slot, flat_idx, 0)
    gath = jnp.concatenate([pos, r.astype(pos.dtype)[:, None]], axis=1)
    return jnp.where(in_slot[:, None], gath[src], 1e9)


timeit("pack-gather (mega planes)", jax.jit(pack_gather),
       table, state.pos, reach)

timeit("table-full (build_cell_table)", jax.jit(
    lambda c: collide.build_cell_table(c, dgrid)[0]), cid)
timeit("rebuild-full (pairs_ops.rebuild)", jax.jit(
    lambda st, pl: pairs_ops.rebuild(st, dgrid, pcfg, cr, dt, pl).a),
    state, plist)

# ---- hit test: engine f32 form vs realistic bf16 cast form ----------
CHUNK = 21846
W = 14 * cap
ks = jax.random.split(jax.random.PRNGKey(0), 10)
ex = [jax.random.uniform(ks[i], (CHUNK, cap), jnp.float32)
      for i in range(3)]
cx = [jax.random.uniform(ks[3 + i], (CHUNK, W), jnp.float32)
      for i in range(3)]
er = jax.random.uniform(ks[6], (CHUNK, cap), jnp.float32) * 0.01
crr = jax.random.uniform(ks[7], (CHUNK, W), jnp.float32) * 0.01

BF16_EPS = 1.0 / 64.0  # > (1+5u)/(1-3u)-1 at u=2^-9; superset-safe


@jax.jit
def hit_f32(ex0, ex1, ex2, cx0, cx1, cx2, er_, crr_):
    dx = ex0[:, :, None] - cx0[:, None, :]
    dy = ex1[:, :, None] - cx1[:, None, :]
    dz = ex2[:, :, None] - cx2[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz
    thresh = er_[:, :, None] + crr_[:, None, :]
    return jnp.sum(d2 < thresh * thresh, dtype=jnp.int32)


@jax.jit
def hit_bf16_cast(ex0, ex1, ex2, cx0, cx1, cx2, er_, crr_):
    bf = jnp.bfloat16
    dx = (ex0[:, :, None] - cx0[:, None, :]).astype(bf)
    dy = (ex1[:, :, None] - cx1[:, None, :]).astype(bf)
    dz = (ex2[:, :, None] - cx2[:, None, :]).astype(bf)
    d2 = dx * dx + dy * dy + dz * dz
    # Pre-widened threshold: 2D planes scaled+cast BEFORE the 3D
    # broadcast add, so the full-shape work is one bf16 add + mul + cmp.
    er_w = (er_ * (1.0 + BF16_EPS)).astype(bf)
    crr_w = (crr_ * (1.0 + BF16_EPS)).astype(bf)
    tw = er_w[:, :, None] + crr_w[:, None, :]
    return jnp.sum(d2 < tw * tw, dtype=jnp.int32)


timeit("hit-f32 (engine form)", hit_f32, *ex, *cx, er, crr)
timeit("hit-bf16-cast (realistic)", hit_bf16_cast, *ex, *cx, er, crr)
print("done", flush=True)
