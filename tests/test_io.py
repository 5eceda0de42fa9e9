"""TIFF I/O and tiling tests."""

import numpy as np
import pytest

from lbdrn_msic_tpu.io.tiff import read_tiff, write_tiff
from lbdrn_msic_tpu.io.tiles import merge_tiles, split_image, tile_bounds
from lbdrn_msic_tpu.utils.synth import synth_scene


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("channels", [1, 4, 8])
def test_tiff_roundtrip(tmp_path, rng, dtype, channels):
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(0, np.iinfo(dtype).max, (channels, 37, 53)).astype(dtype)
    else:
        arr = rng.standard_normal((channels, 37, 53)).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr)
    back = read_tiff(p)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, arr)


def test_tiff_2d_input(tmp_path, rng):
    arr = rng.integers(0, 65535, (40, 30)).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr)
    back = read_tiff(p)
    assert back.shape == (1, 40, 30)
    np.testing.assert_array_equal(back[0], arr)


def test_tiff_cv2_interop(tmp_path, rng):
    """cv2-written TIFFs must parse with our reader; single-band both ways.

    (cv2's TIFF decoder collapses >1-band grayscale files to the first band,
    so multiband interop is one-directional; cv2 is only used for JP2.)
    """
    cv2 = pytest.importorskip("cv2")
    arr = rng.integers(0, 4095, (4, 64, 48)).astype(np.uint16)
    p2 = str(tmp_path / "cv.tif")
    assert cv2.imwrite(p2, arr.transpose(1, 2, 0))  # cv2 treats input as BGRA
    back = read_tiff(p2)  # exercises LZW + horizontal predictor
    np.testing.assert_array_equal(back, arr[[2, 1, 0, 3]])  # file stores RGBA

    one = arr[:1]
    p1 = str(tmp_path / "ours1.tif")
    write_tiff(p1, one)
    via_cv = cv2.imread(p1, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(via_cv, one[0])


@pytest.mark.parametrize("channels", [1, 4])
@pytest.mark.parametrize("bigtiff", [False, True])
def test_tiff_tiled_roundtrip(tmp_path, rng, channels, bigtiff):
    """Tile-organized files (incl. edge-padded partial tiles) round-trip.

    Real Gaofen GeoTIFFs are commonly tiled BigTIFFs; the reference reads
    them via GDAL (reference LBDRNdataset.py:93)."""
    arr = rng.integers(0, 4095, (channels, 70, 45)).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr, tile=(32, 16), bigtiff=bigtiff)
    with open(p, "rb") as f:
        magic = f.read(4)
    assert magic == (b"II+\x00" if bigtiff else b"II*\x00")
    back = read_tiff(p)
    assert back.dtype == arr.dtype
    np.testing.assert_array_equal(back, arr)


def test_tiff_bigtiff_strips_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((3, 41, 29)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr, rows_per_strip=16, bigtiff=True)
    np.testing.assert_array_equal(read_tiff(p), arr)


def test_tiff_tiled_cv2_interop(tmp_path, rng):
    """A tiled file we write must parse through libtiff (via cv2)."""
    cv2 = pytest.importorskip("cv2")
    arr = rng.integers(0, 65535, (1, 50, 40)).astype(np.uint16)
    p = str(tmp_path / "tiled.tif")
    write_tiff(p, arr, tile=(16, 32))
    via_cv = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(via_cv, arr[0])


def test_tiff_tile_dims_validated(tmp_path):
    with pytest.raises(ValueError, match="multiples of 16"):
        write_tiff(str(tmp_path / "x.tif"), np.zeros((1, 8, 8), np.uint8), tile=(8, 8))


@pytest.mark.parametrize("sr", [1, 2, 3])
def test_split_merge_roundtrip(sr):
    img = synth_scene(97, 65, channels=2, seed=3)  # deliberately non-divisible
    tiles = list(split_image(img, sr))
    assert len(tiles) == sr * sr
    merged = merge_tiles(tiles, 97, 65, sr)
    np.testing.assert_array_equal(merged, img)


def test_tile_bounds_remainder_semantics():
    """Last row/col tiles absorb remainders (reference LBDRNdataset.py:62-63)."""
    b = tile_bounds(100, 90, 3)
    assert b[0] == (0, 0, 33, 30)
    assert b[-1] == (66, 60, 34, 30)
    assert sum(h * w for _, _, h, w in b[::3]) / 3  # smoke
    total = sum(h * w for _, _, h, w in b)
    assert total == 100 * 90


def test_synth_scene_properties():
    img = synth_scene(64, 64, channels=4, effective_bits=12, seed=0)
    assert img.shape == (4, 64, 64) and img.dtype == np.uint16
    assert img.max() < 4096
    # spatially correlated: neighbor correlation far above iid noise
    band = img[0].astype(np.float64)
    c = np.corrcoef(band[:, :-1].ravel(), band[:, 1:].ravel())[0, 1]
    assert c > 0.9


def test_tiff_malformed_inputs_fail_cleanly(tmp_path, rng):
    """Garbage and truncated files raise clean errors (no hangs, no OOM
    allocations from attacker-controlled geometry fields)."""
    import struct

    from lbdrn_msic_tpu.io.tiff import write_tiff

    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 256).astype(np.uint8)))
    with pytest.raises((ValueError, struct.error)):
        read_tiff(p)

    # valid header, truncated body
    arr = rng.integers(0, 4095, (2, 48, 32)).astype(np.uint16)
    good = str(tmp_path / "good.tif")
    write_tiff(good, arr)
    blob = open(good, "rb").read()
    cut = str(tmp_path / "cut.tif")
    with open(cut, "wb") as f:
        f.write(blob[: len(blob) // 4])
    with pytest.raises((ValueError, struct.error, IndexError)):
        read_tiff(cut)
