"""On-chip probe: would a bf16 rebuild hit test pay?

The r4 profile shows the rebuild's candidate sweep (masked d^2 hit test
+ top-k min passes over (chunk, cap, 14*cap) lanes) is ~47% of the 1M
step.  The hit test itself is conservative (reach bounds, superset
semantics), so it could run in bf16 with a threshold inflated by the
rounding margin -- IF this chip's VPU runs bf16 elementwise math
meaningfully faster than f32.  The top-k min passes must stay on the
f32 index plane (ints exact below 2^24 in f32 but only 2^8 in bf16),
so only the d^2 compute would convert.  This measures that ratio on
sweep-shaped arrays before any engine change.

Usage (TPU free): python scripts/probe_bf16_vpu.py
"""
import sys
import time

import jax
import jax.numpy as jnp

CHUNK = 21846          # the 1M sweep's chunk rows
CAP = 24
W = 14 * CAP           # candidate lanes (half-shell)
GROUP = 5              # offsets batched per gather group


def timeit(label, fn, *args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best * 1e3:8.2f} ms", flush=True)
    return best


def make_hit(dtype):
    @jax.jit
    def hit(ex, ey, ez, er, cx, cy, cz, crr):
        # d^2 < (r_i + r_j)^2 over (CHUNK, CAP, W) -- the sweep's
        # elementwise hot block (broadcast emitter vs candidate lanes).
        dx = ex[:, :, None] - cx[:, None, :]
        dy = ey[:, :, None] - cy[:, None, :]
        dz = ez[:, :, None] - cz[:, None, :]
        rr = er[:, :, None] + crr[:, None, :]
        hits = dx * dx + dy * dy + dz * dz < rr * rr
        return jnp.sum(hits, dtype=jnp.int32)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    e = [jax.random.uniform(ks[i], (CHUNK, CAP), dtype) for i in range(4)]
    c = [jax.random.uniform(ks[4 + i], (CHUNK, W), dtype) for i in range(4)]
    return hit, (*e, *c)


def make_topk(dtype):
    @jax.jit
    def topk(masked):
        # 4 min-passes + re-mask, the emission side's VPU cost (always
        # runs on the f32 index plane in the engine; timed here in both
        # dtypes only to see the pure VPU dtype ratio).
        prev = None
        outs = []
        m = masked
        for _ in range(4):
            if prev is not None:
                big = jnp.asarray(2 ** 24, m.dtype)
                m = jnp.where(m > prev[:, :, None], m, big)
            prev = jnp.min(m, axis=-1)
            outs.append(prev)
        return jnp.stack(outs, axis=-1)

    k = jax.random.PRNGKey(1)
    masked = jax.random.uniform(k, (CHUNK, CAP, W), dtype) * (2 ** 20)
    return topk, (masked,)


def main():
    print(f"device: {jax.devices()[0].device_kind}  shapes: "
          f"({CHUNK},{CAP},{W})", flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        fn, args = make_hit(dtype)
        t_hit = timeit(f"hit test d2<rr2, {jnp.dtype(dtype).name}", fn, *args)
        fn, args = make_topk(dtype)
        t_top = timeit(f"4x min-pass emission, {jnp.dtype(dtype).name}",
                       fn, *args)
        if dtype == jnp.float32:
            f32_hit, f32_top = t_hit, t_top
    print(f"bf16/f32 hit ratio: {t_hit / f32_hit:.3f}  "
          f"topk ratio: {t_top / f32_top:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
