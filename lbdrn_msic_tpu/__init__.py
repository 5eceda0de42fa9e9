"""LBDRN-MSIC-TPU: a TPU-native learned bit-depth-recovery codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo lidq92/LBDRN-MSIC (per-image overfitting codec for Gaofen multispectral
imagery):

- the encoder splits each 16-bit-container band into an MSB base layer
  (losslessly coded) and an LSB residual predicted by a tiny per-image SIREN
  MLP whose compressed weights ARE the enhancement bitstream
  (reference: encode.py:67-157),
- the decoder replays the network from the decoded base layer
  (reference: decode.py:56-141).

Unlike the reference (single-GPU PyTorch, per-batch host round trips), the
entire overfit loop here runs as one jitted on-device program, features are
gathered on the fly from the base plane (no HxWx100 host tensor), and
scale-out across tiles / rate points / pixel batches is expressed with
jax.sharding over a device mesh.
"""

__version__ = "0.1.0"

from lbdrn_msic_tpu.core.config import (  # noqa: F401
    CodecConfig,
    FeatureSpec,
    ModelSpec,
    TrainSpec,
)

_LAZY = {"encode_image", "decode_stream"}


def __getattr__(name):
    """Lazy top-level codec API: `from lbdrn_msic_tpu import encode_image`."""
    if name in _LAZY:
        from lbdrn_msic_tpu import codec

        return getattr(codec, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
