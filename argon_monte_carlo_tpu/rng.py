"""Random sampling: Maxwell velocities, uniform disks, spherical-cap cones.

The reference mixes two host RNG streams (numpy + stdlib random) with
per-particle Python loops and a rejection sampler
(Open_Air_Cube_MC.py:85-92, Temperature_Pore_MC.py:131-141).  Bitwise parity
is impossible and not required (BASELINE.json: statistical tolerance under
fixed seeds); every sampler here is a loop-free, counter-based
``jax.random`` equivalent that matches the reference *in distribution*:

* Maxwell speed x isotropic direction  ==  3 iid N(0, a^2) components.
* The reference's hemisphere+mirror direction scheme (phi ~ U(0,pi), Fy
  sign flipped with p=1/2) is exactly uniform on the sphere.
* The rejection cone sampler keeps directions within 85 deg of the normal
  axis and flips outward draws inward -> uniform on the spherical cap of
  half-angle 85 deg: closed form cos(theta) ~ U(cos 85deg, 1), phi ~ U(0, 2pi).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def maxwell_velocities(key: jax.Array, n: int, a_shape: float,
                       dtype=jnp.float32) -> jax.Array:
    """(n, 3) velocities; speeds ~ Maxwell(scale=a_shape), isotropic.

    Replaces scipy.stats.maxwell.rvs + the per-particle random_components
    loop (Open_Air_Cube_MC.py:158-172): |N(0, a^2 I_3)| is Maxwell(a) and
    the direction is exactly isotropic.
    """
    return a_shape * jax.random.normal(key, (n, 3), dtype)


def maxwell_speeds(key: jax.Array, n: int, a_shape: float,
                   dtype=jnp.float32) -> jax.Array:
    """(n,) Maxwell-distributed speeds (for tests/validation)."""
    v = maxwell_velocities(key, n, a_shape, dtype)
    return jnp.linalg.norm(v, axis=-1)


def uniform_disk(key: jax.Array, n: int, radius, dtype=jnp.float32):
    """(n,) x and y uniform over a disk of ``radius``.

    Same scheme as the reference (r*sqrt(u) cos/sin theta,
    Open_Air_Pore_MC.py:106-121).
    """
    ku, kt = jax.random.split(key)
    u = jax.random.uniform(kt, (n,), dtype)
    theta = jax.random.uniform(ku, (n,), dtype, 0.0, 2.0 * math.pi)
    r = radius * jnp.sqrt(u)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def orthonormal_frame(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Branchless tangent frame (e1, e2) for unit normals ``n`` of shape (..., 3).

    Duff et al., "Building an Orthonormal Basis, Revisited" (2017) --
    standard public-domain construction.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.where(nz >= 0.0, 1.0, -1.0).astype(n.dtype)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    e1 = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    e2 = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    return e1, e2


def cone_trig(uniforms: jax.Array, cos_half_angle: float):
    """Shared per-draw trigonometry for the spherical-cap sampler.

    Returns (cos_t, sin_t*cos(phi), sin_t*sin(phi)) so several wall cases
    in the same step can reuse one uniform block and one trig evaluation
    (each particle is handled by at most one case per step, so lanes are
    independent draws).
    """
    u1 = uniforms[..., 0]
    u2 = uniforms[..., 1]
    cos_t = cos_half_angle + u1 * (1.0 - cos_half_angle)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = (2.0 * math.pi) * u2
    return cos_t, sin_t * jnp.cos(phi), sin_t * jnp.sin(phi)


def cone_from_trig(trig, axis: jax.Array) -> jax.Array:
    """Spherical-cap direction about arbitrary unit ``axis`` (..., 3)."""
    cos_t, a, b = trig
    e1, e2 = orthonormal_frame(axis)
    return cos_t[..., None] * axis + a[..., None] * e1 + b[..., None] * e2


def cone_from_trig_z(trig, sign: float) -> jax.Array:
    """Spherical-cap direction about (0, 0, sign): frame-free fast path
    for the z-plane thermal walls."""
    cos_t, a, b = trig
    return jnp.stack([a, b, sign * cos_t], axis=-1)


def cone_directions(uniforms: jax.Array, axis: jax.Array,
                    cos_half_angle: float) -> jax.Array:
    """Unit vectors uniform on the spherical cap around ``axis``.

    uniforms: (..., 2) iid U(0,1) draws.
    axis:     (..., 3) unit inward normals.
    Matches the distribution of the reference rejection sampler
    ``random_inbounds_direction`` (Temperature_Pore_MC.py:131-141) without
    the data-dependent loop.
    """
    return cone_from_trig(cone_trig(uniforms, cos_half_angle), axis)
