"""Golden-bitstream regression: the wire format must stay stable.

tests/data/golden_k5.bin was produced by encode_image on the CPU backend
(K=5, D=2, bc=64, nl=2, e=2, bs=2048, seed 19920517) from the committed
source scene.  Decoding it must keep producing the identical reconstruction;
any change to the header layout, LFPZ coder, JP2 container, or decode math
breaks this test and therefore flags a format break.
"""

import hashlib
import os

import numpy as np

from lbdrn_msic_tpu.codec import decode_stream
from lbdrn_msic_tpu.io.header import decode_header

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN_SHA = "c6333939318b57c0b6c11c7817358c902c34185d5c01c878ea44c66bbe77b81e"


def test_golden_stream_decodes_bit_exactly():
    with open(os.path.join(DATA, "golden_k5.bin"), "rb") as f:
        stream = f.read()
    h = decode_header(stream)
    assert (h.K, h.D, h.base_channel, h.num_layers) == (5, 2, 64, 2)
    rec, _ = decode_stream(stream)
    assert rec.shape == (4, 64, 64) and rec.dtype == np.uint16
    assert hashlib.sha256(rec.tobytes()).hexdigest() == GOLDEN_SHA

    src = np.load(os.path.join(DATA, "golden_k5_src.npy"))
    np.testing.assert_array_equal(rec >> 5, src >> 5)  # MSB path lossless
