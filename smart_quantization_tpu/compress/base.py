"""Compressor protocol + compression-size telemetry types.

The reference models a compressor as a stateful ``__call__(tensor, tag)``
object that eagerly logs ratios through Lightning
(/root/reference/smart_compress/compress/base.py:25-106).  TPU-native design:
a compressor is a *frozen dataclass* (hashable, jit-static) whose ``__call__``
is a pure traced function ``(x, key, **kw) -> (x_hat, SizeStats)``.  Size
stats are traced scalars the caller accumulates into the step's metrics
pytree — no host sync in the hot path.

Tag taxonomy (preserved from the reference, see compress/base.py:60-102 and
call sites autograd.py:31,42 / hooks.py:25-29 / models/base.py:115):
``forward_autograd``, ``backward_autograd``, ``optimizer_weight``,
``optimizer_grad``, ``optimizer_momentum``, ``loss``, ``forward_hook``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

TAGS = (
    "forward_autograd",
    "backward_autograd",
    "optimizer_weight",
    "optimizer_grad",
    "optimizer_momentum",
    "loss",
    "forward_hook",
)


class SizeStats(NamedTuple):
    """Per-call compressed-size accounting, in bits (traced f32 scalars).

    Caveat: when the SmaQ compressor is built with ``measure_sizes=False``
    (the CLI default without --measure_compression_ratio,
    utils/config.py::build_components), the fused kernel skips the in-kernel
    outlier count and ``new_bits`` is a static all-main-bucket floor, not a
    measurement — only the ratio-gated paths should consume it then."""

    orig_bits: jax.Array
    new_bits: jax.Array  # includes overhead

    @property
    def ratio(self) -> jax.Array:
        return self.orig_bits / self.new_bits

    @staticmethod
    def of(n: int, orig_bitwidth: float, new_bitwidth: float, overhead: float = 0.0):
        return SizeStats(
            orig_bits=jnp.float32(n * orig_bitwidth),
            new_bits=jnp.float32(n * new_bitwidth + overhead),
        )


@dataclasses.dataclass(frozen=True)
class CompressorBase:
    """Base for all encoders.  ``precision=16`` reproduces the reference's
    fp16-training mode adjustments (std clamp range, half round-trip)."""

    precision: int = 32

    name: str = dataclasses.field(default="base", init=False, repr=False)

    def __call__(
        self,
        x: jax.Array,
        key: jax.Array | None,
        *,
        all_positive: bool = False,
        gamma: jax.Array | None = None,
        beta: jax.Array | None = None,
    ) -> tuple[jax.Array, SizeStats]:
        raise NotImplementedError
