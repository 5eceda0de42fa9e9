"""Delta-coded host->device image transfer.

The dev-tunnel h2d path moves ~40 MB/s, so a raw 2048^2 x 4-band uint16
scene costs ~0.8 s before training can start — the single largest slice of
a single-image encode (the reference pays nothing here: its GPU sits on
PCIe, reference encode.py:118 just calls .cuda()).  Gaofen-like imagery is
strongly row-correlated, so instead of raw samples the host sends:

  - the first column (C, H, 1) in the native dtype,
  - the low byte of each wrapped horizontal delta, read as int8 (a mod-256
    wrap, not a clip: it equals the true delta iff |delta| <= 127, and
    d == -128 also survives because 0x80 reads back as -128),
  - a sparse exception list (flat position + exact int32 residual
    ``true_delta - low_byte``) for every delta outside [-128, 127],

halving the bytes over the link.  The device rebuilds exact prefix sums on
the MXU with blocked triangular matmuls in float32: after the exception
scatter every per-position delta is the exact int32 delta, so each partial
sum telescopes to a difference of two uint16 samples (|sum| <= 65535) and
f32 arithmetic at HIGHEST precision is exact — the reconstruction is
bit-identical (tested against adversarial full-range images in
tests/test_transfer.py).

`put_image` is a drop-in for `jnp.asarray` on (C, H, W) uint16 arrays and
falls back to a raw transfer whenever delta coding cannot win (tiny images,
uint8 planes — deltas are already byte-wide — or exception-heavy content).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# images below this raw size take the plain path: the savings cannot
# amortize the host delta pass + one-time program compile
MIN_DELTA_BYTES = 4 << 20
# exception arrays are padded to the next power-of-two bucket (>= this) so
# distinct scatter-program signatures stay O(log content) per shape
_EXC_BUCKET = 4096
_BLOCK = 1024  # prefix-sum matmul block (W is padded to a multiple)


def _tri(n: int, strict: bool) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((i < j) if strict else (i <= j)).astype(jnp.float32)


@jax.jit
def _exc_scatter(clipped, pos, val):
    """int8 deltas + sparse exceptions -> exact f32 per-position deltas.

    Split from `_undelta` so the expensive prefix-sum program's signature
    depends ONLY on the image shape: the exception cap varies with content
    (pos/val are padded to a bucket), and folding it into one program made
    the big compile re-run per (shape, cap) pair — 11.3 s of BENCH_r04's
    warm-up was `_undelta` x2 for the SAME shape (VERDICT r4 #2).  This
    scatter is a trivial program the compile service turns around fast;
    padded entries point past the buffer and are dropped.
    """
    d = clipped.astype(jnp.float32).reshape(-1)
    return d.at[pos].add(val.astype(jnp.float32), mode="drop")


@functools.partial(jax.jit, static_argnames=("shape", "out_dtype"))
def _undelta(col0, d, shape, out_dtype):
    """Rebuild (C, H, W) from first columns + exact f32 deltas (_exc_scatter).

    Prefix sums via blocked triangular matmuls: in-block inclusive prefix
    (rows, nb, B) @ tri(B), then block offsets from an exclusive prefix of
    the block sums.  All values are integers < 2^17 in magnitude, exact in
    f32 at HIGHEST precision.
    """
    C, H, W = shape
    rows = C * H
    Wm1 = W - 1
    nb = -(-Wm1 // _BLOCK)
    B = _BLOCK if nb > 1 else Wm1
    nb = -(-Wm1 // B)
    pad = nb * B - Wm1
    d = d.reshape(rows, Wm1)
    if pad:
        d = jnp.concatenate([d, jnp.zeros((rows, pad), jnp.float32)], axis=1)
    d = d.reshape(rows, nb, B)
    hi = jax.lax.Precision.HIGHEST
    in_block = jnp.einsum("rnb,bc->rnc", d, _tri(B, strict=False), precision=hi)
    sums = in_block[:, :, -1]  # (rows, nb)
    offsets = jnp.einsum("rn,nm->rm", sums, _tri(nb, strict=True), precision=hi)
    prefix = (in_block + offsets[:, :, None]).reshape(rows, nb * B)[:, :Wm1]
    x0 = col0.astype(jnp.float32).reshape(rows, 1)
    out = jnp.concatenate([x0, x0 + prefix], axis=1)
    return out.astype(out_dtype).reshape(C, H, W)


def put_image(img: np.ndarray) -> jax.Array:
    """h2d an image array; (C, H, W) uint16 goes delta-coded when that wins.

    Bit-identical to ``jnp.asarray(img)`` — only the bytes on the wire and
    the device-side reconstruction differ.
    """
    if (
        not isinstance(img, np.ndarray)
        or img.ndim != 3
        or img.dtype != np.uint16
        or img.shape[2] < 2
        or img.nbytes < MIN_DELTA_BYTES
    ):
        return jnp.asarray(img)
    C, H, W = img.shape
    # all-uint16 wraparound arithmetic (an int32 widening pass over the
    # whole image costs ~0.3 s for a Gaofen-sized scene — as much as the
    # bytes it saves): dw = delta mod 2^16; its low byte read as int8 IS
    # the delta whenever delta is in [-128, 127], and
    # (dw + 128) mod 2^16 >= 256 flags deltas with 128 <= |d| <= 65407
    dw = img[:, :, 1:] - img[:, :, :-1]  # uint16 wraps
    clipped = dw.astype(np.uint8).view(np.int8)
    pos = np.flatnonzero((dw + np.uint16(128)) >= 256)
    if int(img.max()) >= 65408:
        # |d| >= 65408 wraps dw back into the unflagged [0,127]+[65408,
        # 65535] band; it needs one endpoint >= 65408 and the other < 128,
        # so this pass only runs (and only pays two compares) on genuinely
        # full-range content
        left, right = img[:, :, :-1], img[:, :, 1:]
        wrap = ((left < 128) & (right >= 65408)) | (
            (left >= 65408) & (right < 128)
        )
        extra = np.flatnonzero(wrap & ((dw + np.uint16(128)) < 256))
        if extra.size:
            pos = np.concatenate([pos, extra])
    # int8 deltas save ~half the raw bytes; bail out when exceptions eat it
    if pos.size * 8 > img.nbytes // 4:
        return jnp.asarray(img)
    # exact true deltas at the (sparse) exception positions, computed from
    # the original samples in int32 — dw alone is ambiguous between d and
    # d +- 65536 once samples reach 32768
    w1 = W - 1
    c, r = np.divmod(pos, H * w1)
    h, w = np.divmod(r, w1)
    li = (c * H + h) * W + w
    flat = img.reshape(-1)
    d_true = flat[li + 1].astype(np.int32) - flat[li].astype(np.int32)
    val = d_true - clipped.reshape(-1)[pos]
    pos = pos.astype(np.int32)
    cap = _EXC_BUCKET
    while cap < pos.size:
        cap <<= 1  # power-of-two buckets: O(log) scatter signatures
    pos_p = np.full(cap, C * H * (W - 1), np.int32)  # out of range -> dropped
    val_p = np.zeros(cap, np.int32)
    pos_p[: pos.size] = pos
    val_p[: pos.size] = val
    d = _exc_scatter(clipped.astype(np.int8), pos_p, val_p)
    return _undelta(
        np.ascontiguousarray(img[:, :, :1]),
        d,
        (C, H, W),
        jnp.uint16,
    )
