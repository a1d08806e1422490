"""Rounding primitives shared by all quantizers.

Pure jittable functions; PRNG keys are threaded explicitly (the reference got
randomness implicitly from the torch global RNG, see
/root/reference/smart_compress/compress/smart.py:93-98).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round(x: jax.Array, key: jax.Array) -> jax.Array:
    """Stochastically round ``x`` to an integer grid.

    Semantics match the reference's ``_round_stochastic``
    (/root/reference/smart_compress/compress/smart.py:93-98):
    ``floor(x) + relu((frac - U) + 0.5).round()`` which, with torch's
    round-half-to-even, increments exactly when ``frac > U`` for
    ``U ~ Uniform[0, 1)``.  E[result] == x.
    """
    floored = jnp.floor(x)
    frac = x - floored
    probs = jax.random.uniform(key, x.shape, dtype=x.dtype)
    return floored + (frac > probs).astype(x.dtype)


def round_trunc(x: jax.Array) -> jax.Array:
    """Round toward zero (the reference's non-stochastic mode,
    /root/reference/smart_compress/compress/smart.py:169)."""
    return jnp.trunc(x)


def round_to_grid(
    x: jax.Array, key: jax.Array | None, stochastic: bool
) -> jax.Array:
    if stochastic:
        if key is None:
            raise ValueError("stochastic rounding requires a PRNG key")
        return stochastic_round(x, key)
    return round_trunc(x)
