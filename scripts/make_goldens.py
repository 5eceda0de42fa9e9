"""Generate the committed wire-format golden fixtures (tests/test_golden.py).

Run ONLY on a deliberate format bump:

    JAX_PLATFORMS=cpu python scripts/make_goldens.py

One fixture per wire format docs/FORMAT.md specifies — LLPC v1, LLPC v2
(row-chunked, with remainder rows), LJ2C (lossless JP2 container), LJ2L
(lossy JP2 container), LFPZ (weight stream from a fixed float vector), a
v0-header codec stream and an sr=2 tiled stream — so a silent encoder
format drift fails CI without a re-encode (VERDICT r4 weak #6; re-encode
round-trips cannot catch encoder+decoder drifting together).  Prints the
content hashes to paste into tests/test_golden.py.
"""

from __future__ import annotations

import hashlib
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data",
)


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def write(name: str, data: bytes) -> None:
    with open(os.path.join(DATA, name), "wb") as f:
        f.write(data)
    print(f"{name}: {len(data)} bytes  sha256 {sha(data)}")


def main() -> None:
    from lbdrn_msic_tpu.codec import encode_image
    from lbdrn_msic_tpu.codecs import lpc
    from lbdrn_msic_tpu.codecs.base_layer import encode_base
    from lbdrn_msic_tpu.codecs.weights import compress_weights
    from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
    from lbdrn_msic_tpu.eval.anchors import _jp2_lossy_groups
    from lbdrn_msic_tpu.utils.synth import synth_scene

    # one shared source plane for the base-layer codecs; H=70 is NOT a
    # multiple of the v2 chunk_rows=32 so the remainder-chunk layout is
    # locked too
    img = synth_scene(70, 48, channels=3, effective_bits=12, seed=417)
    msb = (img >> 5).astype(np.uint8)
    np.save(os.path.join(DATA, "golden_formats_msb.npy"), msb)
    print("golden_formats_msb.npy sha256(content)", sha(msb.tobytes()))

    write("golden_llpc_v1.bin", lpc.encode(msb))
    write("golden_llpc_v2.bin", lpc.encode(msb, chunk_rows=32))
    write("golden_lj2c.bin", encode_base(msb.astype(np.uint16), "jp2"))
    write("golden_lj2l.bin", _jp2_lossy_groups(img, quality_percent=80.0))

    # LFPZ: a fixed, reproducible float vector exercising signs, exponent
    # spread, zeros and exact-duplicate neighbors
    rng = np.random.default_rng(417)
    vec = np.concatenate([
        rng.normal(0, 1, 300),
        rng.normal(0, 1e-3, 200),
        np.zeros(8),
        np.repeat(rng.normal(0, 10, 4), 3),
    ]).astype(np.float32)
    np.save(os.path.join(DATA, "golden_lfpz_src.npy"), vec)
    write("golden_lfpz.bin", compress_weights(vec, precision=16))

    # codec container streams (CPU backend, deterministic per seed):
    # v0 reference-layout header + default jp2 body, and an sr=2 tiled v1
    # stream whose last tiles absorb the odd-dimension remainders (91x77;
    # every tile stays >= the 32px OpenJPEG minimum)
    src = synth_scene(91, 77, channels=2, effective_bits=12, seed=418)
    np.save(os.path.join(DATA, "golden_container_src.npy"), src)
    tr = TrainSpec(epochs=2, batch_size=1024)
    v0, _ = encode_image(src, CodecConfig(K=5, train=tr), header_version=0)
    write("golden_v0_k5.bin", v0)
    sr2, _ = encode_image(
        src, CodecConfig(K=5, split_ratio=2, train=tr)
    )
    write("golden_sr2_k5.bin", sr2)

    from lbdrn_msic_tpu.codec import decode_stream
    from lbdrn_msic_tpu.codecs.base_layer import decode_base
    from lbdrn_msic_tpu.eval.anchors import _jp2_lossy_decode

    print("-- decode content hashes --")
    print("llpc_v1 ->", sha(decode_base(lpc.encode(msb), "lpc").tobytes()))
    print("lj2l ->", sha(
        _jp2_lossy_decode(_jp2_lossy_groups(img, 80.0)).tobytes()
    ))
    print("v0 ->", sha(decode_stream(v0)[0].tobytes()))
    print("sr2 ->", sha(decode_stream(sr2)[0].tobytes()))


if __name__ == "__main__":
    main()
