"""Layer-type taxonomy: which layer outputs get compression taps.

TPU-native re-design of the reference's nn.Module-class registry
(/root/reference/smart_compress/util/pytorch/quantization.py:12-184): our
models are pure flax modules, so instead of monkey-patching ``forward`` by
module class, every model calls ``tap(x, kind)`` at layer boundaries and the
policy decides per *kind*.

The reference's effective default set (``is_valid_layer_type``,
quantization.py:163-184) is: conv, linear, pool, normalization — plus
anything under ``smart_compress.models.pytorch.*`` (residual blocks and the
model itself), containers, and activations, which all pass the string-match
fallback.  Our default policy reproduces exactly that coverage.
"""

from __future__ import annotations

import dataclasses
import enum


class LayerKind(enum.Enum):
    CONV = "conv"
    LINEAR = "linear"
    POOL = "pool"
    PAD = "pad"
    ACTIVATION = "activation"
    NORM = "normalization"
    DROPOUT = "dropout"
    LOSS = "loss"
    CONTAINER = "container"  # torch Sequential equivalents (block bodies)
    BLOCK = "block"  # vendored-model submodule outputs (ResNet blocks etc.)
    EMBED = "embed"
    ATTENTION = "attention"


# reference DEFAULT_LAYER_TYPES (quantization.py:163) ...
_DEFAULT = {LayerKind.CONV, LayerKind.LINEAR, LayerKind.POOL, LayerKind.NORM}
# ... plus the string-match fallback coverage (quantization.py:176-184)
_FALLBACK = {LayerKind.ACTIVATION, LayerKind.CONTAINER, LayerKind.BLOCK}


@dataclasses.dataclass(frozen=True)
class TapPolicy:
    kinds: frozenset = frozenset(k.value for k in (_DEFAULT | _FALLBACK))

    @staticmethod
    def of(*kinds: LayerKind | str) -> "TapPolicy":
        return TapPolicy(
            frozenset(k.value if isinstance(k, LayerKind) else k for k in kinds)
        )

    def should_tap(self, kind: LayerKind | str) -> bool:
        kind = kind.value if isinstance(kind, LayerKind) else kind
        return kind in self.kinds


DEFAULT_POLICY = TapPolicy()
