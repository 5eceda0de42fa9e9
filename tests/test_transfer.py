"""Delta-coded h2d transfer: bit-exactness against jnp.asarray."""

import numpy as np
import pytest

from lbdrn_msic_tpu.utils import transfer
from lbdrn_msic_tpu.utils.synth import synth_scene


def _roundtrip(img):
    got = np.asarray(transfer.put_image(img))
    np.testing.assert_array_equal(got, img)


def test_small_images_take_raw_path():
    img = synth_scene(16, 16, channels=2, seed=0)
    out = transfer.put_image(img)
    np.testing.assert_array_equal(np.asarray(out), img)


@pytest.mark.parametrize("shape", [(4, 64, 96), (1, 40, 33), (8, 17, 129)])
def test_delta_path_bitexact_smooth(monkeypatch, shape, rng):
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = synth_scene(shape[1], shape[2], channels=shape[0],
                      effective_bits=12, seed=5)
    _roundtrip(img)


def test_delta_path_bitexact_adversarial(monkeypatch, rng):
    """Full-range uint16 noise: nearly every delta is an exception, partial
    sums hit the +-65535 extremes — reconstruction must stay exact (the
    exception-heavy bailout is disabled by forcing the delta path)."""
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = rng.integers(0, 65536, (2, 37, 41)).astype(np.uint16)
    C, H, W = img.shape
    a = img.astype(np.int32)
    d = a[:, :, 1:] - a[:, :, :-1]
    clipped = np.clip(d, -127, 127)
    flat_resid = (d - clipped).reshape(-1)
    pos = np.flatnonzero(flat_resid).astype(np.int32)
    val = flat_resid[pos]
    cap = -(-max(pos.size, 1) // transfer._EXC_BUCKET) * transfer._EXC_BUCKET
    pos_p = np.full(cap, C * H * (W - 1), np.int32)
    val_p = np.zeros(cap, np.int32)
    pos_p[: pos.size] = pos
    val_p[: pos.size] = val
    import jax.numpy as jnp

    d_dev = transfer._exc_scatter(clipped.astype(np.int8), pos_p, val_p)
    got = np.asarray(
        transfer._undelta(
            np.ascontiguousarray(img[:, :, :1]), d_dev, (C, H, W),
            jnp.uint16,
        )
    )
    np.testing.assert_array_equal(got, img)


def test_delta_path_full_range_jumps(monkeypatch, rng):
    """put_image's own delta/exception extraction (not a hand-built list)
    on content with samples >= 32768: isolated +-40000 jumps and 0<->65535
    transitions, sparse enough to stay below the exception-heavy bailout.
    Catches the historical int16-ambiguity bug (true delta d vs d+-65536)
    and the unflagged |d| >= 65408 wrap band."""
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = synth_scene(48, 97, channels=2, effective_bits=12, seed=11)
    # +-40000 jumps: plateau pairs at (2000, 42000) — deltas of exactly
    # +-40000, whose dw >= 32768 used to decode as d-65536
    img[0, 3, 10:14] = 42000
    img[0, 3, 14:18] = 2000
    img[1, 7, 20] = 42000
    # full-period transitions: 0 <-> 65535 (|d| = 65535, missed by the
    # old flag entirely) and 100 <-> 65500 (|d| = 65400, flagged band edge)
    img[0, 20, 30] = 0
    img[0, 20, 31] = 65535
    img[0, 20, 32] = 0
    img[1, 40, 5] = 65500
    img[1, 40, 6] = 100
    img[1, 40, 7] = 65500
    # keep the delta path: exception count must stay under nbytes//32
    assert img.max() >= 65408
    _roundtrip(img)


def test_delta_path_high_samples_moderate_deltas(monkeypatch):
    """Samples >= 32768 but every |delta| < 32768: the extra wrap pass
    must find nothing and the flagged exceptions must carry exact
    residuals (the old where(flat_w >= 32768, ...) was wrong here too
    whenever a true delta reached +-32768)."""
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = synth_scene(32, 64, channels=2, effective_bits=12, seed=13)
    img += np.uint16(40000)  # shift well into the high half
    img[0, 5, 8:10] = 65000
    img[0, 5, 10:12] = 65000 - 32767  # deltas exactly -32767 / +32767
    img[1, 9, 3] = 40000 - 500
    assert 32768 <= int(img.max()) < 65408
    _roundtrip(img)


def test_exception_heavy_bails_to_raw(monkeypatch, rng):
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    img = rng.integers(0, 65536, (2, 64, 64)).astype(np.uint16)
    _roundtrip(img)  # correct either way; this path must not crash


def test_wide_block_boundaries(monkeypatch):
    """W spanning multiple prefix-sum blocks, including ragged last block."""
    monkeypatch.setattr(transfer, "MIN_DELTA_BYTES", 0)
    monkeypatch.setattr(transfer, "_BLOCK", 16)
    img = synth_scene(8, 100, channels=2, effective_bits=12, seed=9)
    _roundtrip(img)
