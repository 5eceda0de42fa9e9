"""Device-side reconstruction: replay the network over the decoded base layer.

Mirrors the reference decoder's math (reference decode.py:77-139): rebuild
the exact feature tensor from the decoded base plane, run the MLP, then
``residual = round(pred * (2^K - 1))`` and ``image = (base << K) + residual``
in uint16.  Instead of the reference's flat 2^22-row chunking (a CUDA OOM
guard, decode.py:127), the image is processed as contiguous row blocks via
the slice-path feature builder — no gathers, fully fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbdrn_msic_tpu.core.config import FeatureSpec, ModelSpec
from lbdrn_msic_tpu.features.engine import pad_plane, row_block_features
from lbdrn_msic_tpu.utils.transfer import put_image
from lbdrn_msic_tpu.models.siren import (
    SirenParams,
    forward,
    pad_dim,
    pad_features,
)


@functools.partial(
    jax.jit, static_argnames=("fspec", "mspec", "H", "W", "block_rows")
)
def reconstruct(
    base: jnp.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: jnp.ndarray,
    H: int,
    W: int,
    block_rows: int = 256,
) -> jnp.ndarray:
    """base: (C, H, W) uint16 decoded base layer -> (C, H, W) uint16 image.

    K is a traced scalar so one compiled program serves every rate point of
    an RD sweep (shapes don't depend on it).
    """
    C = base.shape[0]
    K = jnp.asarray(K, jnp.int32)
    plane, scale = pad_plane(base, fspec.D)
    dim_in = fspec.feature_dim(C)
    padded_in = pad_dim(dim_in)
    R = min(block_rows, H)
    n_blocks = -(-H // R)
    lsb_peak = (jnp.int32(1) << K).astype(jnp.float32) - 1.0

    def body(_, b):
        r0 = jnp.minimum(b * R, H - R)
        x = row_block_features(plane, scale, r0, fspec, H, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = jnp.round(pred * lsb_peak)  # (R*W, C)
        residual = residual.reshape(R, W, C).transpose(2, 0, 1)
        base_blk = jax.lax.dynamic_slice(base, (0, r0, 0), (C, R, W))
        shifted = (base_blk.astype(jnp.int32) << K).astype(jnp.float32)
        block = jnp.round(shifted + residual).astype(jnp.uint16)
        return None, (block, r0)

    _, (blocks, r0s) = jax.lax.scan(body, None, jnp.arange(n_blocks))

    out = jnp.zeros((C, H, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, r0s[i], 0))

    return jax.lax.fori_loop(0, n_blocks, place, out)


def reconstruct_np(base: np.ndarray, params, fspec, mspec, K: int) -> np.ndarray:
    _, H, W = base.shape
    return np.asarray(
        reconstruct(jnp.asarray(base), params, fspec, mspec, K, H, W)
    )


N_PLANES = 16  # residual bitplane slots (covers any K; planes >= K are zero)


@functools.partial(
    jax.jit, static_argnames=("fspec", "mspec", "H", "W", "band_rows")
)
def _residual_band_planes(
    base: jnp.ndarray,
    params: SirenParams,
    r0: jnp.ndarray,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: jnp.ndarray,
    H: int,
    W: int,
    band_rows: int,
) -> jnp.ndarray:
    """Predicted residual for row band [r0, r0+band_rows), as bitplanes.

    Only the residual crosses the (slow, ~20-40 MB/s tunnel) d2h link — the
    host already holds the decoded base layer, and
    ``image = (base << K) + residual`` is an exact integer add it can do
    itself (reference decode.py:131-135 math).  The residual is K bits per
    subpixel, so it is returned as a (N_PLANES, ceil(n/8)) uint8 bitplane
    matrix (np.unpackbits bit order) and the caller fetches only the first
    K planes: exactly K bits/subpixel on the wire, one compiled program for
    every rate point (K stays traced; plane count is static).

    base may be uint8 (the encoder's storage dtype when the MSB fits —
    reference LBDRNdataset.py:100) or uint16; uint8 halves the h2d upload.
    """
    C = base.shape[0]
    K = jnp.asarray(K, jnp.int32)
    plane, scale = pad_plane(base, fspec.D)
    padded_in = pad_dim(fspec.feature_dim(C))
    R = min(256, band_rows)
    n_blocks = -(-band_rows // R)
    lsb_peak = (jnp.int32(1) << K).astype(jnp.float32) - 1.0

    def body(_, b):
        rb = jnp.minimum(r0 + b * R, H - R)
        x = row_block_features(plane, scale, rb, fspec, H, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = (
            jnp.round(pred * lsb_peak)
            .astype(jnp.uint16)
            .reshape(R, W, C)
            .transpose(2, 0, 1)
        )
        return None, (residual, rb - r0)

    _, (blocks, offs) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    out = jnp.zeros((C, band_rows, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, offs[i], 0))

    out = jax.lax.fori_loop(0, n_blocks, place, out)
    return _pack_bitplanes(out)


@functools.partial(
    jax.jit, static_argnames=("fspec", "mspec", "W", "band_rows")
)
def _residual_band_planes_local(
    band: jnp.ndarray,
    params: SirenParams,
    scale: jnp.ndarray,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: jnp.ndarray,
    W: int,
    band_rows: int,
) -> jnp.ndarray:
    """Residual bitplanes for ONE uploaded row band (h2d-streaming path).

    `band`: (C, band_rows + 2D, W) RAW rows — the band plus its D-row halo,
    true neighbor rows for interior bands and host-reflected rows at the
    image edges, so features are bit-identical to the full-plane program.
    `scale` is the GLOBAL 1/max of the base plane (computed on host).
    Colors-only feature sets (coords need global row indices).
    """
    C = band.shape[0]
    D = fspec.D
    K = jnp.asarray(K, jnp.int32)
    plane = band.astype(jnp.uint16)
    if D > 0:
        plane = jnp.pad(plane, ((0, 0), (0, 0), (D, D)), mode="reflect")
    padded_in = pad_dim(fspec.feature_dim(C))
    R = min(256, band_rows)
    n_blocks = -(-band_rows // R)
    lsb_peak = (jnp.int32(1) << K).astype(jnp.float32) - 1.0

    def body(_, b):
        rb = jnp.minimum(b * R, band_rows - R)
        x = row_block_features(plane, scale, rb, fspec, band_rows, W, R)
        pred = forward(params, pad_features(x, padded_in), mspec)
        residual = (
            jnp.round(pred * lsb_peak)
            .astype(jnp.uint16)
            .reshape(R, W, C)
            .transpose(2, 0, 1)
        )
        return None, (residual, rb)

    _, (blocks, offs) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    out = jnp.zeros((C, band_rows, W), jnp.uint16)

    def place(i, out):
        return jax.lax.dynamic_update_slice(out, blocks[i], (0, offs[i], 0))

    out = jax.lax.fori_loop(0, n_blocks, place, out)
    return _pack_bitplanes(out)


def _pack_bitplanes(out: jnp.ndarray) -> jnp.ndarray:
    """(…,) uint16 residuals -> (N_PLANES, ceil(n/8)) uint8 bitplane matrix
    (np.unpackbits 'big' bit order)."""
    flat = out.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    nb = -(-n // 8)
    if nb * 8 != n:
        flat = jnp.concatenate([flat, jnp.zeros((nb * 8 - n,), jnp.int32)])
    octets = flat.reshape(nb, 8)
    weights = (jnp.int32(1) << jnp.arange(7, -1, -1)).astype(jnp.int32)
    shifts = jnp.arange(N_PLANES, dtype=jnp.int32)[:, None, None]
    bits = (octets[None, :, :] >> shifts) & 1  # (N_PLANES, nb, 8); XLA fuses
    return (bits * weights[None, None, :]).sum(-1).astype(jnp.uint8)



@jax.jit
def _plane(planes, j):
    """planes[j] as ONE jitted program: eager indexing dispatches a
    dynamic_slice + squeeze pair of remote-compiled one-op programs
    (VERDICT r4 #2); j stays traced so one program serves every plane."""
    return jax.lax.dynamic_index_in_dim(planes, j, keepdims=False)


def _band_halo(base: np.ndarray, r0: int, band_rows: int, D: int) -> np.ndarray:
    """Host-side band slice with a D-row halo; edge halos reflect the image
    rows exactly like jnp.pad(mode='reflect') in pad_plane."""
    H = base.shape[1]
    idx = np.arange(r0 - D, r0 + band_rows + D)
    idx = np.where(idx < 0, -idx, idx)
    idx = np.where(idx >= H, 2 * (H - 1) - idx, idx)
    return np.ascontiguousarray(base[:, idx, :])


def _band_layout(H: int, n_bands: int) -> tuple[int, int]:
    """(n_bands, band_rows): uniform bands, multiple of the 256-row block so
    in-band blocks never spill past a band boundary."""
    if H < 512:
        return 1, H
    band_rows = -(-(-(-H // n_bands)) // 256) * 256
    return -(-H // band_rows), band_rows


def dispatch_streamed(
    base: np.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
    n_bands: int = 8,
):
    """Dispatch the device residual computation for every row band of one
    tile (asynchronous) and return a zero-arg closure that fetches the
    bands and assembles the final uint16 image on host.

    Splitting dispatch from fetch lets callers start *all* tiles' device
    work before blocking on any d2h transfer.

    For colors-only feature sets (coords need global row indices) the base
    layer is ALSO uploaded band-by-band with a host-built halo
    (_band_halo): band b+1's h2d rides the link while band b computes and
    band b-1's planes come back — upload, compute and download all overlap
    instead of paying the full-plane h2d up front."""
    C, H, W = base.shape
    n_bands, band_rows = _band_layout(H, n_bands)
    pend = []
    if not fspec.use_coords and n_bands > 1:
        scale = np.float32(1.0) / np.float32(max(int(base.max()), 1))
        for b in range(n_bands):
            r0 = min(b * band_rows, H - band_rows)
            band = _band_halo(base, r0, band_rows, fspec.D)
            planes = _residual_band_planes_local(
                put_image(band), params, scale,
                fspec, mspec, np.int32(K), W, band_rows,
            )
            # slice out the K live planes now (async) so their d2h can
            # start while later bands still upload/compute
            pend.append((r0, [_plane(planes, j) for j in range(K)]))
    else:
        dev = jnp.asarray(base)  # stored dtype (uint8 when it fits)
        for b in range(n_bands):
            r0 = min(b * band_rows, H - band_rows)
            planes = _residual_band_planes(
                dev, params, np.int32(r0), fspec, mspec, np.int32(K),
                H, W, band_rows,
            )
            pend.append((r0, [_plane(planes, j) for j in range(K)]))

    return _make_finish(base, pend, band_rows, K)


def _assemble_band(got, base_blk: np.ndarray, K: int) -> np.ndarray:
    """K residual bitplanes + contiguous base block -> uint16 image block.

    Native single-pass routine when available (codecs/native/assemble.cc —
    no K x n intermediates); numpy unpackbits fallback is the oracle
    (tests/test_native.py asserts byte equality)."""
    import ctypes

    from lbdrn_msic_tpu.codecs import _native

    n = base_blk.size
    lib = _native.load()
    fn = getattr(lib, "lbdrn_assemble_residual", None) if lib else None
    if fn is not None and K <= 16:
        out = np.empty(base_blk.shape, np.uint16)
        arrs = [np.ascontiguousarray(p) for p in got]
        ptrs = (ctypes.c_void_p * len(arrs))(
            *[a.ctypes.data for a in arrs]
        )
        rc = fn(
            ptrs, K,
            ctypes.c_void_p(base_blk.ctypes.data),
            1 if base_blk.dtype == np.uint8 else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            n,
        )
        if rc == 0:
            return out
    res = np.zeros(n, np.uint16)
    for j, plane_bytes in enumerate(got):
        res |= np.unpackbits(plane_bytes)[:n].astype(np.uint16) << j
    return (base_blk.astype(np.uint16) << K) + res.reshape(base_blk.shape)


def _make_finish(base: np.ndarray, pend, band_rows: int, K: int):
    """Zero-arg closure fetching dispatched residual bands and assembling
    the final uint16 image on host (shared by the decode entry points)."""
    C, H, W = base.shape

    def finish() -> np.ndarray:
        import concurrent.futures

        out = np.empty((C, H, W), np.uint16)

        def assemble(item):
            # when H % band_rows != 0 the final band (r0 = H - band_rows)
            # overlaps its predecessor's rows; skip them so two pool
            # threads never write the same out[] rows concurrently
            b, (r0, dev_planes) = item
            skip = max(0, b * band_rows - r0)
            got = jax.device_get(dev_planes)  # one batched fetch per band
            blk = np.ascontiguousarray(base[:, r0 : r0 + band_rows])
            out[:, r0 + skip : r0 + band_rows] = _assemble_band(got, blk, K)[
                :, skip:
            ]

        # the assembly math releases the GIL (native routine / numpy): a
        # small pool overlaps one band's host assembly with another's d2h
        # fetch (the serial loop was the decode bottleneck — 0.9 s host
        # time for a 2048^2x4 scene)
        with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(assemble, enumerate(pend)))
        return out

    return finish


def dispatch_streamed_lpc(
    stream: bytes,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
):
    """Streaming decode straight from a row-chunked LLPC v2 base stream:
    host chunk decoding, band h2d upload, device residual compute and
    bitplane d2h ALL overlap (docs/PERF.md "Decode budget" — the serial
    host base decode was 7.6-9.3 s of the flagship's ~24 s).

    The v2 header carries the plane max, so the feature scale
    (1/max — reference LBDRNdataset.py:119 semantics) is known before
    any chunk is decoded; device band b dispatches as soon as chunks
    b and b+1 (its D-row bottom halo) are decoded, while later chunks
    still decode on the other core.  Colors-only feature sets; returns
    (base, finish()) like `dispatch_streamed`, or None when the stream
    is not v2-chunked (caller falls back)."""
    import concurrent.futures
    import os

    from lbdrn_msic_tpu.codecs import lpc

    info = lpc.chunk_info(stream)
    if info is None:
        return None
    C, H, W, itemsize, cr, nk, mx = info
    # cr < D would put part of a band's bottom halo in chunk k+2 while we
    # only wait on chunks k and k+1 — undersized chunks take the plain path
    if nk < 2 or H < cr or cr < fspec.D or fspec.use_coords:
        return None
    dtype = np.uint8 if itemsize == 1 else np.uint16
    base = np.empty((C, H, W), dtype)
    scale = np.float32(1.0) / np.float32(max(mx, 1))

    def dec_one(ci, k):
        r0 = k * cr
        rows = min(cr, H - r0)
        base[ci, r0 : r0 + rows] = lpc.decode_chunk(
            stream, ci, k, rows, W
        ).astype(dtype)

    # ctypes releases the GIL: chunk decodes saturate the host cores while
    # the main thread builds halos and dispatches bands
    dec_pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=max(2, os.cpu_count() or 2)
    )
    futs = [
        [dec_pool.submit(dec_one, ci, k) for ci in range(C)]
        for k in range(nk)
    ]
    # assembly starts as soon as a band is dispatched (its device_get
    # blocks until the device finishes that band): early bands' d2h and
    # host assembly ride UNDER the remaining chunk decodes instead of
    # starting after the last dispatch
    out = np.empty((C, H, W), np.uint16)
    asm_pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)

    def assemble(r0, skip, dev_planes):
        # `skip` drops rows already covered by the previous band (final
        # band only, when H % cr != 0): no concurrent same-row writes
        got = jax.device_get(dev_planes)  # one batched fetch per band
        blk = np.ascontiguousarray(base[:, r0 : r0 + cr])
        out[:, r0 + skip : r0 + cr] = _assemble_band(got, blk, K)[:, skip:]

    asm_futs = []
    for k in range(nk):
        for f in futs[k]:
            f.result()
        if k + 1 < nk:  # band k's bottom halo rows live in chunk k + 1
            for f in futs[k + 1]:
                f.result()
        r0 = min(k * cr, H - cr)  # uniform bands: ONE compiled shape
        band = _band_halo(base, r0, cr, fspec.D)
        planes = _residual_band_planes_local(
            put_image(band), params, scale,
            fspec, mspec, np.int32(K), W, cr,
        )
        asm_futs.append(
            asm_pool.submit(
                assemble, r0, max(0, k * cr - r0),
                [_plane(planes, j) for j in range(K)],
            )
        )
    dec_pool.shutdown()

    def finish() -> np.ndarray:
        for f in asm_futs:
            f.result()
        asm_pool.shutdown()
        return out

    return base, finish


def reconstruct_streamed(
    base: np.ndarray,
    params: SirenParams,
    fspec: FeatureSpec,
    mspec: ModelSpec,
    K: int,
    n_bands: int = 8,
) -> np.ndarray:
    """Reconstruction with device->host streaming: residuals are computed in
    row bands, all dispatched asynchronously, so fetching band i overlaps
    the device computing bands i+1..; only K bits/subpixel cross d2h."""
    return dispatch_streamed(base, params, fspec, mspec, K, n_bands)()
