"""The compression tap: a custom_vjp identity that fake-quantizes the primal
(feature map) on the way forward and the cotangent (gradient map) on the way
backward.

TPU-native replacement for the reference's ``CompressorAutoGradFn`` dummy
autograd nodes (/root/reference/smart_compress/util/pytorch/autograd.py:18-47):
same dataflow — activations tagged ``forward_autograd``, gradient maps tagged
``backward_autograd`` — but as a pure jittable op with explicit PRNG, so XLA
can fuse it into the surrounding computation.  Gradient flow is
straight-through: d(tap)/dx == quantized cotangent, exactly like the
reference (backward honors ``ctx.needs_input_grad`` implicitly — JAX only
materializes cotangents that are needed).

Forward-side size stats are returned as traced scalars (and models `sow` them
into a metrics collection).  Backward-side stats are data-dependent values
produced inside the vjp; they escape it WITHOUT host callbacks via the
telemetry-token trick: each tapped module owns a zero-valued (2,) token in
the ``telemetry`` variable collection that is fed into the tap as a second
input, and the tap's custom-vjp returns ``[orig_bits, new_bits]`` as that
token's cotangent — so ``jax.grad`` of the loss w.r.t. the telemetry
collection IS the per-module backward size telemetry, as ordinary traced
values that jit/shard_map handle like any other gradient (JAX sums cotangents
across a module's tap sites automatically).  The legacy io_callback sink is
kept as a fallback for callers that do not thread the collection; it is
skipped on PJRT backends without host-callback support.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from smart_quantization_tpu.compress.base import CompressorBase, SizeStats
from smart_quantization_tpu.inject.policy import DEFAULT_POLICY, LayerKind, TapPolicy

# Opt-in host sink for backward-pass telemetry: fn(tag, orig_bits, new_bits).
_BACKWARD_STATS_SINK: Callable | None = None
_CALLBACKS_SUPPORTED: bool | None = None


def host_callbacks_supported() -> bool:
    """Some PJRT backends (e.g. relayed TPU plugins) reject host callbacks;
    probe once so telemetry can degrade gracefully instead of crashing."""
    global _CALLBACKS_SUPPORTED
    if _CALLBACKS_SUPPORTED is None:
        try:
            r = jax.jit(
                lambda x: jax.pure_callback(
                    lambda v: v, jax.ShapeDtypeStruct((), jnp.float32), x
                )
            )(jnp.float32(1.0))
            float(r)
            _CALLBACKS_SUPPORTED = True
        except Exception:
            _CALLBACKS_SUPPORTED = False
    return _CALLBACKS_SUPPORTED


def set_backward_stats_sink(sink: Callable | None) -> None:
    """Install the backward-telemetry sink; no-op (with a note) when the
    backend cannot do host callbacks."""
    global _BACKWARD_STATS_SINK
    if sink is not None and not host_callbacks_supported():
        print(
            "NOTE: backend lacks host callbacks; backward_autograd size "
            "telemetry disabled (forward/optimizer tags unaffected)."
        )
        _BACKWARD_STATS_SINK = None
        return
    _BACKWARD_STATS_SINK = sink


def _emit_backward_stats(stats: SizeStats) -> None:
    if _BACKWARD_STATS_SINK is None:
        return
    jax.experimental.io_callback(
        lambda o, n: _BACKWARD_STATS_SINK("backward_autograd", float(o), float(n)),
        None,
        stats.orig_bits,
        stats.new_bits,
        ordered=False,
    )


def compression_tap(
    x: jax.Array,
    key: jax.Array | None,
    compressor: CompressorBase,
    *,
    compress_forward: bool = True,
    compress_backward: bool = True,
    gamma: jax.Array | None = None,
    beta: jax.Array | None = None,
    bwd_token: jax.Array | None = None,
) -> tuple[jax.Array, SizeStats]:
    """Apply the tap; returns ``(y, forward SizeStats)``.

    When ``bwd_token`` (a zero-valued (2,) array) is given, the vjp emits the
    backward size stats as the token's cotangent instead of (in addition to)
    the host sink — differentiate the loss w.r.t. the token to collect them.
    """
    if key is not None:
        key_fwd, key_bwd = jax.random.split(key)
    else:
        key_fwd = key_bwd = None

    identity_stats = SizeStats.of(x.size, 32, 32)

    # named_scope regions attribute quantizer time inside profiler traces —
    # the reference's Globals.profiler.profile("smaq") role (smart.py:119)
    def fwd_value(x):
        if compress_forward:
            with jax.named_scope("compress/forward"):
                y, s = compressor(x, key_fwd, gamma=gamma, beta=beta)
        else:
            y, s = x, identity_stats
        return y, (s.orig_bits, s.new_bits)

    def bwd_cotangent(g):
        if compress_backward:
            with jax.named_scope("compress/backward"):
                g, s = compressor(g, key_bwd)
        else:
            s = None
        return g, s

    if bwd_token is None:

        @jax.custom_vjp
        def tap(x):
            return fwd_value(x)

        def tap_fwd(x):
            return tap(x), None

        def tap_bwd(_, cotangents):
            g, _stat_ct = cotangents
            g, s = bwd_cotangent(g)
            if s is not None:
                _emit_backward_stats(s)
            return (g,)

        tap.defvjp(tap_fwd, tap_bwd)
        y, (orig_bits, new_bits) = tap(x)
    else:

        @jax.custom_vjp
        def tap_tok(x, tok):
            return fwd_value(x)

        def tap_tok_fwd(x, tok):
            return tap_tok(x, tok), None

        def tap_tok_bwd(_, cotangents):
            g, _stat_ct = cotangents
            g, s = bwd_cotangent(g)
            if s is not None:
                tok_ct = jnp.stack(
                    [s.orig_bits, s.new_bits]
                ).astype(jnp.float32)
            else:
                tok_ct = jnp.zeros((2,), jnp.float32)
            return (g, tok_ct)

        tap_tok.defvjp(tap_tok_fwd, tap_tok_bwd)
        y, (orig_bits, new_bits) = tap_tok(x, bwd_token)
    return y, SizeStats(orig_bits, new_bits)


@dataclasses.dataclass(frozen=True)
class TapConfig:
    """Everything a model needs to place compression taps.

    Mirrors the reference wiring flags (util/train.py:134-163):
    ``compress_forward`` / ``compress_backward`` and the layer policy;
    ``use_batch_norm`` enables the BN-folded SmaQ variant at NORM taps
    (autograd.py:63-72).
    """

    compressor: CompressorBase | None = None
    compress_forward: bool = True
    compress_backward: bool = True
    policy: TapPolicy = DEFAULT_POLICY
    use_batch_norm: bool = False
    # telemetry tag for forward-side sizes; the legacy global-hook mode
    # (util/train.py:129-133 + hooks.py:37-53) is this config with
    # compress_backward=False and tag="forward_hook"
    tag: str = "forward_autograd"

    def as_global_hook(self) -> "TapConfig":
        """The reference's (signature-broken) --compression_hook_fn
        global_hook capability, built correctly: forward-output-only
        compression (SURVEY.md section 7 'quirks')."""
        return dataclasses.replace(
            self, compress_backward=False, tag="forward_hook"
        )

    @property
    def active(self) -> bool:
        return self.compressor is not None and (
            self.compress_forward or self.compress_backward
        )


def module_tap(
    module,
    x: jax.Array,
    kind: LayerKind,
    cfg: TapConfig | None,
    *,
    gamma: jax.Array | None = None,
    beta: jax.Array | None = None,
) -> jax.Array:
    """Tap helper for flax modules: draws a 'compress' RNG, applies the tap
    if the policy covers ``kind``, and sows size stats into the
    ``compression_stats`` collection (retrievable with
    ``apply(..., mutable=['compression_stats'])``)."""
    if cfg is None or not cfg.active or not cfg.policy.should_tap(kind):
        return x
    needs_key = True  # compressors are cheap to hand a key even if unused
    key = module.make_rng("compress") if needs_key else None
    if not cfg.use_batch_norm:
        gamma = beta = None
    # backward-telemetry token (see module docstring): one zero (2,) vector
    # per tapped module in the 'telemetry' collection; cotangents from the
    # module's tap sites sum into it.  Created at init; used at apply only
    # when the caller passes the collection in (grads w.r.t. it are the
    # backward sizes).  Callers that don't thread it keep the sink fallback.
    token = None
    if cfg.compress_backward:
        if module.has_variable("telemetry", "bwd_token"):
            token = module.get_variable("telemetry", "bwd_token")
        elif module.is_initializing():
            token = module.variable(
                "telemetry",
                "bwd_token",
                lambda: jnp.zeros((2,), jnp.float32),
            ).value
    y, stats = compression_tap(
        x,
        key,
        cfg.compressor,
        compress_forward=cfg.compress_forward,
        compress_backward=cfg.compress_backward,
        gamma=gamma,
        beta=beta,
        bwd_token=token,
    )
    module.sow(
        "compression_stats",
        cfg.tag,
        jnp.stack([stats.orig_bits, stats.new_bits]),
        reduce_fn=lambda prev, new: prev + new,
        init_fn=lambda: jnp.zeros((2,), jnp.float32),
    )
    return y
