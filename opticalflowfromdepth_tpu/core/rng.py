"""Keyed random helpers mirroring the reference's signed-uniform sampler.

The reference draws every synthesis random through ``utils.get_random``
(`/root/reference/utils.py:96-100`):

    sign  = +-1 with p=0.5          (only if random_sign)
    value = U[0,1) * range + begin
    return sign * value

We reproduce the same *distribution* with explicit JAX keys (bit-exact parity
with torch RNG streams is impossible and not a goal; see SURVEY.md §7 hard
part 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_random(key: jax.Array, random_range, random_begin,
               random_sign: bool = True) -> jnp.ndarray:
    """Scalar sample: ``sign * (U[0,1) * random_range + random_begin)``."""
    k_sign, k_val = jax.random.split(key)
    value = jax.random.uniform(k_val, (), jnp.float32) * random_range + random_begin
    if random_sign:
        sign = jax.random.randint(k_sign, (), 0, 2).astype(jnp.float32) * 2.0 - 1.0
        return sign * value
    return value


def get_random_vec(key: jax.Array, n: int, random_range, random_begin,
                   random_sign: bool = True) -> jnp.ndarray:
    """Vector of n independent get_random draws (shape [n])."""
    keys = jax.random.split(key, n)
    vals = [get_random(k, random_range, random_begin, random_sign) for k in keys]
    return jnp.stack(vals)
