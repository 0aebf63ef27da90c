"""On-chip probe: can the rebuild's pairwise hit test ride the MXU?

The rebuild sweep's dominant cost is VPU elementwise work on the
(cells, cap, 27*cap) candidate block: the d^2 computation plus top-k
masked min-passes.  The signed quantity d^2 - (r_i + r_j)^2 is BILINEAR
in augmented coordinates

    u_i = [x, y, z, |x|^2 - r_i^2, 1, -2 r_i]
    w_j = [-2x, -2y, -2z, 1, |x|^2 - r_j^2, r_j]

(u_i . w_j = |x_i - x_j|^2 - (r_i + r_j)^2), so ONE batched matmul
(cap, 6) x (6, 27*cap) per cell computes every hit value on the MXU.
Whether that wins here depends on this chip's batched-small-matmul
efficiency (MXU measures ~7.8 TFLOP/s bf16 nominal-peak on large
square shapes; tiny batched shapes can land 100x off peak) -- hence
this probe, run BEFORE building the engine change.

Usage (TPU must be free):  python scripts/probe_mxu_hit.py [N]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        # tunnel sync quirk: pull a scalar (first array leaf of any
        # pytree result)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:44s} {best*1e3:8.2f} ms")
    return best


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
    cells = grid.num_cells
    print(f"N={cfg.num_molecules} cells={cells} cap={cap} "
          f"top_k={pcfg.top_k}")
    cr = cfg.physics.collision_range
    dt = cfg.dt

    plist = sim._init_aux(state)
    reb = jax.jit(lambda s, p: pairs_ops.rebuild(s, grid, pcfg, cr, dt, p))
    timeit("rebuild (full, one-sided)", reb, state, plist)

    search = jax.jit(lambda pos, vel: collide.cell_candidate_search(
        pos, grid,
        reach=pairs_ops.reach_radii(vel, cr, dt, 8, 0.5 * grid.cell_size)[0],
        top_k=pcfg.top_k, one_sided=True))
    timeit("cell_candidate_search (one-sided)", search, state.pos,
           state.vel)

    # Synthetic shapes matching the sweep chunk structure.
    B = 16384  # cells per chunk (probe scale)
    W = 27 * cap
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    lhs6 = jax.random.normal(k1, (B, cap, 6), jnp.float32)
    rhs6 = jax.random.normal(k2, (B, 6, W), jnp.float32)
    ox = jax.random.normal(k3, (B, cap, 3), jnp.float32)
    nx = jax.random.normal(k2, (B, W, 3), jnp.float32)
    orc = jnp.abs(jax.random.normal(k1, (B, cap), jnp.float32))
    nrc = jnp.abs(jax.random.normal(k3, (B, W), jnp.float32))

    def vpu_form(ox, nx, orc, nrc):
        dx = ox[:, :, 0][:, :, None] - nx[:, :, 0][:, None, :]
        dy = ox[:, :, 1][:, :, None] - nx[:, :, 1][:, None, :]
        dz = ox[:, :, 2][:, :, None] - nx[:, :, 2][:, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        thresh = orc[:, :, None] + nrc[:, None, :]
        return jnp.sum(d2 < thresh * thresh, dtype=jnp.int32)

    def mxu_form(lhs, rhs):
        val = jnp.einsum("bik,bkj->bij", lhs, rhs,
                         preferred_element_type=jnp.float32)
        return jnp.sum(val < 0.0, dtype=jnp.int32)

    def mxu_form_bf16(lhs, rhs):
        val = jnp.einsum("bik,bkj->bij", lhs.astype(jnp.bfloat16),
                         rhs.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return jnp.sum(val < 0.0, dtype=jnp.int32)

    t_vpu = timeit(f"VPU d2+cmp  ({B}x{cap}x{W})",
                   jax.jit(vpu_form), ox, nx, orc, nrc)
    t_mxu = timeit(f"MXU einsum f32 ({B}x{cap}x6x{W})",
                   jax.jit(mxu_form), lhs6, rhs6)
    t_bf = timeit(f"MXU einsum bf16 ({B}x{cap}x6x{W})",
                  jax.jit(mxu_form_bf16), lhs6, rhs6)
    print(f"MXU/VPU ratio: f32 {t_mxu/t_vpu:.2f}  bf16 {t_bf/t_vpu:.2f}")

    # top-k min-pass cost at sweep shapes (the other dominant term).
    hitval = jax.random.normal(k1, (B, cap, W), jnp.float32)
    nix = jax.random.randint(k2, (B, 1, W), 0, N).astype(jnp.int32)

    def topk_passes(hv, nix, k):
        masked = jnp.where(hv < 0.0, jnp.broadcast_to(nix, hv.shape),
                           2**30)
        outs = []
        prev = None
        for _ in range(k):
            if prev is not None:
                masked = jnp.where(masked > prev[:, :, None], masked,
                                   2**30)
            prev = jnp.min(masked, axis=-1)
            outs.append(prev)
        return jnp.stack(outs, -1)

    timeit("top-3 min-passes", jax.jit(lambda h, x: topk_passes(h, x, 3)),
           hitval, nix)
    timeit("top-5 min-passes", jax.jit(lambda h, x: topk_passes(h, x, 5)),
           hitval, nix)

    # End-to-end mini-sweep comparison: the decisive question is not
    # isolated op times but what XLA fuses -- the MXU form must
    # materialize its (B, cap, W) hit values to HBM unless the compare/
    # select fuse into the dot output, and the moment extraction then
    # re-reads them.  VPU form: fused d2+threshold+top-3.  MXU form:
    # einsum hit values -> int8 hit mask -> segmented per-group count
    # and index-sum (exact for 0/1-hit groups).
    def vpu_sweep(ox, nx, orc, nrc, nix):
        dx = ox[:, :, 0][:, :, None] - nx[:, :, 0][:, None, :]
        dy = ox[:, :, 1][:, :, None] - nx[:, :, 1][:, None, :]
        dz = ox[:, :, 2][:, :, None] - nx[:, :, 2][:, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        thresh = orc[:, :, None] + nrc[:, None, :]
        hit = d2 < thresh * thresh
        masked = jnp.where(hit, jnp.broadcast_to(nix, hit.shape), 2**30)
        outs, prev = [], None
        for _ in range(3):
            if prev is not None:
                masked = jnp.where(masked > prev[:, :, None], masked,
                                   2**30)
            prev = jnp.min(masked, axis=-1)
            outs.append(prev)
        return jnp.stack(outs, -1)

    G = 6  # candidate groups for the segmented moments

    def mxu_sweep(lhs, rhs, nix):
        val = jnp.einsum("bik,bkj->bij", lhs, rhs,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        hit = (val < 0.0).astype(jnp.float32)     # (B, cap, W)
        hw = hit.reshape(B, cap, G, W // G)
        cnt = jnp.sum(hw, axis=-1)                # (B, cap, G)
        s1 = jnp.sum(
            hw * nix.astype(jnp.float32).reshape(B, 1, G, W // G),
            axis=-1)
        cand = jnp.where(cnt == 1.0, s1, jnp.float32(2**30))
        return jnp.sort(cand, axis=-1)[:, :, :3], jnp.sum(cnt >= 2.0)

    t_v = timeit("VPU mini-sweep (d2+top3)", jax.jit(vpu_sweep),
                 ox, nx, orc, nrc, nix)
    t_m = timeit("MXU mini-sweep (einsum+moments)", jax.jit(mxu_sweep),
                 lhs6, rhs6, nix)
    print(f"mini-sweep MXU/VPU ratio: {t_m/t_v:.2f}")

    # Exact integer recovery through the HIGHEST-precision einsum: a
    # 0/1 mask times int-valued f32 weights < 2^24 must come back
    # bit-exact for the moment extraction to be sound.
    km = jax.random.split(k1)[0]
    mask01 = (jax.random.uniform(km, (512, 640)) < 0.002).astype(
        jnp.float32)
    wts = jax.random.randint(km, (640, 1), 0, 1 << 24).astype(
        jnp.float32)
    ref = jnp.sum(mask01 * wts.reshape(1, -1), axis=-1, dtype=jnp.float64)
    got = jnp.einsum("bw,wo->bo", mask01, wts,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)[:, 0]
    single = jnp.sum(mask01, axis=-1) == 1.0
    exact = jnp.all(jnp.where(single, got.astype(jnp.float64) == ref,
                              True))
    print(f"single-hit integer recovery exact: {bool(exact)} "
          f"({int(jnp.sum(single))} single-hit rows)")

    # argsort vs nonzero at N (the compaction swap's premise).
    mask = jax.random.uniform(k3, (N,)) < 0.01

    def via_nonzero(m):
        return jnp.nonzero(m, size=max(16384, N // 64), fill_value=N)[0]

    from argon_monte_carlo_tpu.ops.compact import compact_indices

    timeit("nonzero(size) over N", jax.jit(via_nonzero), mask)
    timeit("compact_indices over N",
           jax.jit(lambda m: compact_indices(m, max(16384, N // 64), N)),
           mask)


if __name__ == "__main__":
    main()
