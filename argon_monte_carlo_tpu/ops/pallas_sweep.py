"""Pallas TPU narrow-phase sweep kernel (the reference hot loop).

Replaces the chunked XLA neighbourhood sweep in ``cell_partner_search``
(which re-gathers every cell's 27 neighbour rows from HBM through XLA
gathers -- measured ~310 ms/step at 1M particles on the attached chip)
with a VMEM-resident sliding-window kernel:

* Particle data lives in a dense slot-plane array ``planes`` of shape
  ``(LEAD + num_cells + TAIL, 4*cap)`` -- per cell row, the x/y/z
  coordinates and the particle index of its <= cap occupants, packed
  side by side (empty slots hold a far sentinel).
* The flat cell ids of the compact grid (ops/collide.py) are raster
  order within each z-layer, so a run of R consecutive cells shares its
  27-neighbourhood structure: for each of the 9 (dy, dz) combinations
  the neighbours of the whole run form ONE contiguous row range, and
  each cell's 3-cell x-window is a sliding window within it.  One block
  therefore needs just 10 contiguous DMAs (its own R rows + 9 runs of
  R+2 rows) instead of 27 gathers per cell.
* Layers whose xy extent differs from a z-neighbour's (the region-aware
  grid shrinks nx inside the pore) break the constant-offset property;
  those layers are emitted as per-y-row blocks with exact host-computed
  run bases (BlockPlan below).  Blocks are ordered ascending so a
  block's spill rows (rows past its real span, unavoidable with a fixed
  block size) are always overwritten by the later block that owns them
  -- the TPU grid executes sequentially.
* Junk reads are harmless by construction: any particle within
  ``search_radius`` (< cell size) of another is in its true
  27-neighbourhood, which ``BlockPlan.verify`` proves is covered for
  every cell; extra window cells beyond the true neighbourhood are
  >= one cell away and fail the d^2 test.  Duplicated candidates are
  idempotent under the lowest-index-min partner rule, which matches
  ops/collide.cell_partner_search exactly (tested).

Reference being replaced: the per-cell O(n^2) pair sweep
Open_Air_Pore_MC.py:160-255 farmed to a process pool (SURVEY.md C17/C23).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 32            # particle slots per cell (planes layout is fixed to this)
NFIELD = 4          # x, y, z, particle-index(bitcast f32)
ROW = NFIELD * CAP  # 128 lanes per cell row -- exactly one TPU lane tile.
                    # Mosaic requires HBM DMA slices to be 128-aligned in
                    # the minor dim, so the row width is not negotiable;
                    # CAP=32 makes every lane carry a real field value.
INT_BIG = jnp.int32(2**30)
SENTINEL = 1e9      # far-away fill for empty slots; bitcast > 2**30 as int32

# Mean cell occupancy sized so the Poisson tail fits in CAP slots
# (occ + 5*sqrt(occ) + 4 <= 32); the engine builds the Pallas grid with
# this occupancy so all 32 slots are load-bearing rather than padding.
TARGET_OCCUPANCY = 11.0


# --------------------------------------------------------------------------
# Host-side block plan
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Host-built sweep schedule for a compact grid (ops/collide.Grid).

    tbl[b] = [out_base, nbr_base_0 .. nbr_base_8, 0, ...] -- planes row
    offsets (already including the LEAD pad).  nbr run k covers rows
    [nbr_base_k, nbr_base_k + R + 2); the x-window of the block's i-th
    cell is rows i, i+1, i+2 of each run.
    """

    tbl: np.ndarray          # (num_blocks, 16) int32
    block_size: int          # R
    lead: int                # dummy rows before cell 0
    tail: int                # dummy rows after the last cell
    num_rows: int            # LEAD + num_cells + TAIL
    num_cells: int


def build_block_plan(grid, block_size: int = 64) -> BlockPlan:
    """Emit the block table for ``grid`` (ops/collide.Grid, host numpy)."""
    R = block_size
    nz, nx = grid.nz, grid.nx.astype(np.int64)
    layer_base = grid.layer_base.astype(np.int64)
    num_cells = grid.num_cells
    LEAD = R
    TAIL = R + 4
    dummy = LEAD + num_cells  # first tail row: permanently sentinel

    def nx_at(iz):
        return int(nx[iz]) if 0 <= iz < nz else -1

    # A layer is "fast" when its own and both z-neighbours' rasters have
    # the same width: every (dy, dz) neighbour run is then a constant
    # offset from the out run and blocks may span rows/layers freely.
    fast = np.array([
        nx_at(iz - 1) == nx_at(iz) == nx_at(iz + 1) for iz in range(nz)
    ])

    rows_total = LEAD + num_cells + TAIL
    max_base = rows_total - (R + 2)

    def clamp_base(b):
        # Any run that would read outside the planes array is pointed at
        # the dummy tail rows (sentinel -> no candidates).
        return b if 0 <= b <= max_base else dummy

    blocks = []

    def emit(out_base, bases):
        row = np.zeros(16, np.int64)
        row[0] = LEAD + out_base
        for k, b in enumerate(bases):
            row[1 + k] = clamp_base(LEAD + b)
        blocks.append(row)

    iz = 0
    while iz < nz:
        n = int(nx[iz])
        if fast[iz]:
            # Maximal fast span: same nx throughout (guaranteed by the
            # fast predicate), blocks stride the whole span's raster.
            jz = iz
            while jz + 1 < nz and fast[jz + 1]:
                jz += 1
            span_lo = int(layer_base[iz])
            span_hi = int(layer_base[jz] + nx[jz] ** 2)
            offs = [dz * n * n + dy * n - 1
                    for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
            b0 = span_lo
            while b0 < span_hi:
                emit(b0, [b0 + o for o in offs])
                b0 += R
            iz = jz + 1
        else:
            # Rowwise blocks: exact per-row bases (handles nx changes
            # across z, including the centering shift).
            for iy in range(n):
                for x0 in range(0, n, R):
                    out_base = int(layer_base[iz]) + iy * n + x0
                    bases = []
                    for dz in (-1, 0, 1):
                        jzl = iz + dz
                        m = nx_at(jzl)
                        for dy in (-1, 0, 1):
                            if m < 0:
                                bases.append(dummy - LEAD)
                                continue
                            shift = (m - n) // 2
                            jy = iy + dy + shift
                            if jy < 0 or jy >= m:
                                bases.append(dummy - LEAD)
                                continue
                            bases.append(
                                int(layer_base[jzl]) + jy * m
                                + x0 + shift - 1
                            )
                    emit(out_base, bases)
            iz += 1

    tbl = np.stack(blocks).astype(np.int32)
    order = np.argsort(tbl[:, 0], kind="stable")
    tbl = tbl[order]  # ascending: spill rows overwritten by their owner
    return BlockPlan(tbl=tbl, block_size=R, lead=LEAD, tail=TAIL,
                     num_rows=rows_total, num_cells=num_cells)


def verify_block_plan(grid, plan: BlockPlan) -> None:
    """Prove every cell's true 27-neighbourhood is window-covered.

    For each cell, find the LAST block writing its row (that write wins)
    and check that the union of its 9 run windows at the cell's position
    contains every real neighbour from grid.neighbors.  Raises on any
    gap -- the engine falls back to the XLA sweep.
    """
    R = plan.block_size
    owner_block = np.full(plan.num_cells, -1, np.int64)
    owner_pos = np.zeros(plan.num_cells, np.int64)
    for b in range(plan.tbl.shape[0]):
        base = int(plan.tbl[b, 0]) - plan.lead
        lo = max(base, 0)
        hi = min(base + R, plan.num_cells)
        if lo < hi:
            idx = np.arange(lo, hi)
            owner_block[idx] = b
            owner_pos[idx] = idx - base
    if (owner_block < 0).any():
        missing = int((owner_block < 0).sum())
        raise ValueError(f"block plan leaves {missing} cells uncovered")

    # covered[c] = set of cell ids in c's windows (vectorized as a
    # (num_cells, 27) array of window cells).
    bases = plan.tbl[owner_block, 1:10].astype(np.int64) - plan.lead
    pos = owner_pos[:, None, None]
    win = bases[:, :, None] + pos + np.arange(3)[None, None, :]
    win = win.reshape(plan.num_cells, 27)

    nbrs = grid.neighbors  # (num_cells, 27), dummy = num_cells
    real = nbrs < grid.num_cells
    # Membership test: for each real neighbour, is it in the window set?
    win_sorted = np.sort(win, axis=1)
    idx = np.clip(
        np.array([np.searchsorted(w, nb) for w, nb in
                  zip(win_sorted, np.where(real, nbrs, -1))]),
        0, 26,
    )
    found = np.take_along_axis(win_sorted, idx, axis=1) == np.where(
        real, nbrs, -1
    )
    ok = np.where(real, found, True).all()
    if not ok:
        bad = int((~np.where(real, found, True)).sum())
        raise ValueError(
            f"block plan misses {bad} true neighbour windows"
        )


@functools.lru_cache(maxsize=8)
def _cached_plan(grid_key, block_size):
    grid = _GRID_REGISTRY[grid_key]
    plan = build_block_plan(grid, block_size)
    verify_block_plan(grid, plan)
    return plan


_GRID_REGISTRY: dict = {}


def plan_for_grid(grid, block_size: int = 64) -> BlockPlan:
    """Cached verified plan for a host Grid."""
    key = (id(grid), grid.num_cells, block_size)
    _GRID_REGISTRY[key] = grid
    return _cached_plan(key, block_size)


def grid_supports_pallas(grid) -> bool:
    """The sliding-window junk-harmlessness argument needs rasters wide
    enough that wrapped reads land >= one cell away (nx >= 3) and the
    search radius within one cell."""
    return int(grid.nx.min()) >= 3 and grid.nz >= 1


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _sweep_kernel(R, r2, tbl_ref, planes_hbm, out_hbm,
                  scr_out, scr_nbr, scr_res, sems):
    b = pl.program_id(0)
    out_base = tbl_ref[b, 0]
    cp_out = pltpu.make_async_copy(
        planes_hbm.at[pl.ds(out_base, R)], scr_out, sems.at[0]
    )
    cp_out.start()
    cps = []
    for k in range(9):
        cp = pltpu.make_async_copy(
            planes_hbm.at[pl.ds(tbl_ref[b, 1 + k], R + 2)],
            scr_nbr.at[k], sems.at[1 + k],
        )
        cp.start()
        cps.append(cp)
    cp_out.wait()
    out = scr_out[:, :]
    ox = out[:, 0 * CAP:1 * CAP]
    oy = out[:, 1 * CAP:2 * CAP]
    oz = out[:, 2 * CAP:3 * CAP]
    oix = pltpu.bitcast(out[:, 3 * CAP:4 * CAP], jnp.int32)

    best = jnp.full((R, CAP), 2**30, jnp.int32)
    for k in range(9):
        cps[k].wait()
        nb = scr_nbr[k, :, :]  # (R+2, ROW)
        for s in range(3):
            w = nb[s:s + R, :]
            cx = w[:, 0 * CAP:1 * CAP]
            cy = w[:, 1 * CAP:2 * CAP]
            cz = w[:, 2 * CAP:3 * CAP]
            cix = pltpu.bitcast(w[:, 3 * CAP:4 * CAP], jnp.int32)
            dx = ox[:, :, None] - cx[:, None, :]
            d2 = dx * dx
            dy = oy[:, :, None] - cy[:, None, :]
            d2 = d2 + dy * dy
            dz = oz[:, :, None] - cz[:, None, :]
            d2 = d2 + dz * dz
            hit = (d2 < r2) & (cix[:, None, :] != oix[:, :, None])
            cand = jnp.min(
                jnp.where(hit, cix[:, None, :], 2**30), axis=-1
            )
            best = jnp.minimum(best, cand)
    res = jnp.where(best < 2**30, best, -1)
    # The output row is 128 lanes (Mosaic DMA alignment); replicate the
    # (R, CAP) result across the row -- readback uses lanes [0, CAP).
    scr_res[:, :] = jnp.concatenate([res] * (ROW // CAP), axis=1)
    cp_res = pltpu.make_async_copy(
        scr_res, out_hbm.at[pl.ds(out_base, R)], sems.at[9]
    )
    cp_res.start()
    # Synchronous write: the ascending spill-overwrite ordering relies
    # on block b's rows landing before block b+1 finishes.
    cp_res.wait()


def _sweep_call(plan: BlockPlan, r2: float, interpret: bool = False):
    R = plan.block_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.tbl.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((R, ROW), jnp.float32),
            pltpu.VMEM((9, R + 2, ROW), jnp.float32),
            pltpu.VMEM((R, ROW), jnp.int32),
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )
    kernel = functools.partial(_sweep_kernel, R, np.float32(r2))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_rows, ROW), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# XLA-side integration
# --------------------------------------------------------------------------


def pack_planes(pos: jnp.ndarray, pslot: jnp.ndarray, plan: BlockPlan):
    """Scatter particle data into the slot-plane array.

    ``pslot`` is cell_id*CAP + rank from ops/collide.build_cell_table
    (over-capacity particles carry pslot == num_cells*CAP and are
    dropped).  Scatter (N writes) beats the former slot gather
    (num_cells*CAP reads) at low occupancy on this chip.
    """
    n = pos.shape[0]
    row = plan.lead + pslot // CAP
    col = pslot % CAP
    drop = pslot >= plan.num_cells * CAP
    row = jnp.where(drop, plan.num_rows, row)  # OOB -> dropped
    planes = jnp.full((plan.num_rows, ROW), SENTINEL, jnp.float32)
    x = pos[:, 0].astype(jnp.float32)
    y = pos[:, 1].astype(jnp.float32)
    z = pos[:, 2].astype(jnp.float32)
    ixf = jax.lax.bitcast_convert_type(
        jnp.arange(n, dtype=jnp.int32), jnp.float32
    )
    planes = planes.at[row, 0 * CAP + col].set(x, mode="drop")
    planes = planes.at[row, 1 * CAP + col].set(y, mode="drop")
    planes = planes.at[row, 2 * CAP + col].set(z, mode="drop")
    planes = planes.at[row, 3 * CAP + col].set(ixf, mode="drop")
    return planes


def pallas_partner_search(pos, grid, plan: BlockPlan, search_radius,
                          table_fn, interpret: bool = False):
    """Lowest-index overlapping partner per particle, Pallas narrow phase.

    ``table_fn(pos) -> (pslot, overflow)`` supplies the (possibly stale,
    Verlet-amortized) cell binning; the planes always carry FRESH
    positions so the sweep physics is exact.

    Returns (partner (N,) int32 with -1 for none, overflow).
    """
    pslot, overflow = table_fn(pos)
    planes = pack_planes(pos, pslot, plan)
    partner_rows = _sweep_call(plan, search_radius * search_radius,
                               interpret=interpret)(
        jnp.asarray(plan.tbl), planes
    )
    flat = partner_rows.reshape(-1)
    # Output rows are ROW lanes wide with the (R, CAP) result replicated;
    # slot s of cell row r lives at flat index r*ROW + s%CAP.
    idx = (plan.lead + pslot // CAP) * ROW + pslot % CAP
    in_table = pslot < plan.num_cells * CAP
    partner = jnp.where(
        in_table, flat[jnp.clip(idx, 0, flat.shape[0] - 1)], -1
    )
    return partner, overflow
