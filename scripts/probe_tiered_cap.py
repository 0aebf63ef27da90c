"""On-chip probe: occupancy-tiered emitter capacity for the rebuild sweep.

The rebuild candidate sweep's VPU volume is (rows, CAP, 14*CAP) with
CAP=24 own-cell emitter slots, but cell occupancy is Poisson(~11):
94% of cells hold <= 16 particles, so ~46% of the emitter axis is
masked padding doing full-price vector work.  If active rows are
processed occupancy-sorted, the <=16-occupancy majority can run in a
16-slot program (emitter axis 3 sublane tiles -> 2) while the dense
tail keeps 24 -- bitwise-safe because empty emitter slots emit
nothing in either shape.

This probe times the sweep-shaped hot block (hit test + 4 min-pass
emission, exactly probe_bf16_vpu.py's shapes) in three forms:

  A. status quo: all rows at CAP=24
  B. static two-tier split: 6% rows at 24 + 94% rows at 16
     (the upper bound: what a perfectly-sorted, zero-overhead split
     would save)
  C. per-chunk lax.cond dispatch between the 24- and 16-slot bodies
     over occupancy-sorted chunks (the implementable form: measures
     the cond/dispatch overhead on top of B)

PRE-REGISTERED GATE (decided before measuring; VERDICT r4 item 4):
implement the engine change only if C/A <= 0.80 (>=20% cut of the
sweep block).  Then the in-engine merge gate is a same-session
interleaved A/B (scripts/ab_bench.py) showing >= +8% end-to-end at 1M
with the 95% CI excluding zero.

Usage (TPU free): python scripts/probe_tiered_cap.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_argon")),
)

ROWS = int(os.environ.get("PROBE_ROWS", 21846))  # 1M sweep's active rows
CAP = 24
CAP_LO = 16
W = 14 * CAP           # candidate lanes (half-shell; stays 24-based --
                       # neighbour cells keep full capacity)
TOPK = 4
DENSE_FRAC = 0.06      # P[Poisson(11) > 16]
CHUNK = 512


def timeit(label, fn, *args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:58s} {best * 1e3:8.2f} ms", flush=True)
    return best


def sweep_body(ex, ey, ez, er, nix, cx, cy, cz, crr):
    """Hit test + TOPK min-pass emission on (rows, cap, W)."""
    dx = ex[:, :, None] - cx[:, None, :]
    dy = ey[:, :, None] - cy[:, None, :]
    dz = ez[:, :, None] - cz[:, None, :]
    rr = er[:, :, None] + crr[:, None, :]
    hit = dx * dx + dy * dy + dz * dz < rr * rr
    big = jnp.asarray(2 ** 24, jnp.float32)
    masked = jnp.where(hit, nix[:, None, :], big)
    prev = None
    outs = []
    m = masked
    for _ in range(TOPK):
        if prev is not None:
            m = jnp.where(m > prev[:, :, None], m, big)
        prev = jnp.min(m, axis=-1)
        outs.append(prev)
    return jnp.stack(outs, axis=-1)


def make_inputs(rows, cap):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 9)
    e = [jax.random.uniform(ks[i], (rows, cap), jnp.float32)
         for i in range(4)]
    nix = jax.random.uniform(ks[4], (rows, W), jnp.float32) * (2 ** 20)
    c = [jax.random.uniform(ks[5 + i], (rows, W), jnp.float32)
         for i in range(4)]
    return (*e[:4], nix, *c)


def main():
    dev = jax.devices()[0].device_kind
    print(f"device: {dev}  rows={ROWS} cap={CAP}/{CAP_LO} W={W} "
          f"topk={TOPK}", flush=True)

    # A: status quo
    full = jax.jit(sweep_body)
    args_a = make_inputs(ROWS, CAP)
    t_a = timeit("A: all rows cap=24", full, *args_a)

    # B: static split (upper bound)
    n_dense = int(ROWS * DENSE_FRAC)
    n_lo = ROWS - n_dense
    args_dense = make_inputs(n_dense, CAP)
    args_lo = make_inputs(n_lo, CAP_LO)

    @jax.jit
    def split(ad, al):
        return sweep_body(*ad), sweep_body(*al)

    t_b = timeit("B: static 6% cap=24 + 94% cap=16", split,
                 args_dense, args_lo)

    # C: per-chunk cond dispatch over occupancy-sorted chunks.  The
    # implementable form processes every chunk at the 24-slot layout in
    # memory but runs the 16-slot body (a slice) when the chunk's max
    # occupancy allows; output is padded back to cap=24 rows.
    n_chunks = ROWS // CHUNK
    rows_c = n_chunks * CHUNK
    args_c = make_inputs(rows_c, CAP)
    # chunk occupancy flags: sorted-dense-first, 6% of chunks dense
    dense_chunks = max(1, int(n_chunks * DENSE_FRAC))
    flags = jnp.arange(n_chunks) < dense_chunks

    @jax.jit
    def cond_chunks(flags, *arrs):
        def body(carry, xs):
            flag, *chunk_arrs = xs

            def dense_fn(a):
                return sweep_body(*a)

            def lo_fn(a):
                ex, ey, ez, er, nix, cx, cy, cz, crr = a
                out_lo = sweep_body(ex[:, :CAP_LO], ey[:, :CAP_LO],
                                    ez[:, :CAP_LO], er[:, :CAP_LO],
                                    nix, cx, cy, cz, crr)
                pad = jnp.full((CHUNK, CAP - CAP_LO, TOPK),
                               jnp.asarray(2 ** 24, jnp.float32))
                return jnp.concatenate([out_lo, pad], axis=1)

            out = jax.lax.cond(flag, dense_fn, lo_fn, tuple(chunk_arrs))
            return carry, out

        chunked = [a.reshape(n_chunks, CHUNK, *a.shape[1:]) for a in arrs]
        _, outs = jax.lax.scan(body, None, (flags, *chunked))
        return outs

    t_c = timeit("C: per-chunk cond dispatch (sorted chunks)",
                 cond_chunks, flags, *args_c)

    ratio_b = t_b / t_a
    ratio_c = t_c / t_a
    gate = ratio_c <= 0.80
    result = {
        "device": dev,
        "rows": ROWS, "cap": CAP, "cap_lo": CAP_LO, "topk": TOPK,
        "dense_frac": DENSE_FRAC, "chunk": CHUNK,
        "t_full_ms": t_a * 1e3,
        "t_static_split_ms": t_b * 1e3,
        "t_cond_chunks_ms": t_c * 1e3,
        "ratio_static": ratio_b,
        "ratio_cond": ratio_c,
        "gate_implement_if": "ratio_cond <= 0.80",
        "gate_passed": bool(gate),
    }
    os.makedirs("runs/probe", exist_ok=True)
    with open("runs/probe/tiered_cap_r5.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
