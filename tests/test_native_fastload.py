"""Native fastload (C++ threaded chunk decode) + prefetcher tests.

The batched native path must be byte-identical to the sequential Python
reader on every codec, including missing-chunk fill and partial edge
chunks (reference behavior contract: credit/datasets/gen_2/era5.py reads
through zarr+numcodecs, which these paths replace)."""

import gzip
import os
import zlib

import numpy as np
import pytest

from credit_tpu.data import zarrlite
from credit_tpu.native import fastload


pytestmark = pytest.mark.skipif(
    not fastload.available(), reason="native toolchain unavailable")


def test_decode_batch_all_codecs():
    rng = np.random.default_rng(0)
    arrs = [rng.normal(size=(7, 5)).astype("<f4") for _ in range(4)]
    raws = [arrs[0].tobytes(),
            zlib.compress(arrs[1].tobytes(), 5),
            gzip.compress(arrs[2].tobytes()),
            None]
    import zstandard

    raws[3] = zstandard.ZstdCompressor().compress(arrs[3].tobytes())
    codecs = [fastload.CODEC_RAW, fastload.CODEC_ZLIB,
              fastload.CODEC_GZIP, fastload.CODEC_ZSTD]
    outs = [np.empty((7, 5), "<f4") for _ in range(4)]
    fastload.decode_batch(raws, codecs, outs)
    for a, o in zip(arrs, outs):
        np.testing.assert_array_equal(a, o)


def test_decode_batch_corrupt_raises():
    out = np.empty(4, "<f4")
    with pytest.raises(RuntimeError, match="decode error"):
        fastload.decode_batch([b"not-zlib"], [fastload.CODEC_ZLIB], [out])


def test_decode_batch_size_mismatch_raises():
    data = zlib.compress(np.zeros(3, "<f4").tobytes())
    out = np.empty(5, "<f4")
    with pytest.raises(RuntimeError, match="size mismatch"):
        fastload.decode_batch([data], [fastload.CODEC_ZLIB], [out])


def test_read_decode_batch_missing_mask(tmp_path):
    a = np.arange(12, dtype="<i8")
    p = tmp_path / "chunk0"
    p.write_bytes(zlib.compress(a.tobytes()))
    outs = [np.empty(12, "<i8"), np.full(12, -1, "<i8")]
    found = fastload.read_decode_batch(
        [str(p), str(tmp_path / "nope")],
        [fastload.CODEC_ZLIB, fastload.CODEC_ZLIB], outs)
    assert found.tolist() == [True, False]
    np.testing.assert_array_equal(outs[0], a)
    np.testing.assert_array_equal(outs[1], -1)  # untouched


def test_many_chunks_threaded(tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.normal(size=64).astype("<f8") for _ in range(64)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"c{i}"
        p.write_bytes(zlib.compress(a.tobytes(), 1))
        paths.append(str(p))
    outs = [np.empty(64, "<f8") for _ in range(64)]
    found = fastload.read_decode_batch(
        paths, [fastload.CODEC_ZLIB] * 64, outs, n_threads=4)
    assert found.all()
    for a, o in zip(arrs, outs):
        np.testing.assert_array_equal(a, o)


@pytest.mark.parametrize("compressor", ["zlib", None])
def test_zarrlite_native_path_matches_python(tmp_path, compressor, monkeypatch):
    """ZarrArray.read through the native batch path == pure-Python path,
    including partial edge chunks and missing-chunk fill."""
    rng = np.random.default_rng(2)
    data = rng.normal(size=(10, 7, 9)).astype("<f4")
    root = str(tmp_path / "store")
    zarrlite.write_array(root, "v", data, chunks=(4, 3, 5),
                         compressor=compressor or "none")
    # delete one chunk -> fill_value (None -> 0) territory
    os.remove(os.path.join(root, "v", "1.1.0"))
    expect = data.copy()
    expect[4:8, 3:6, 0:5] = 0.0

    g = zarrlite.open_group(root)
    native = g["v"].read()
    # force the sequential path for comparison
    monkeypatch.setattr(fastload, "available", lambda: False)
    seq = zarrlite.open_group(root)["v"].read()
    np.testing.assert_array_equal(native, seq)
    np.testing.assert_array_equal(native, expect)


def test_zarrlite_selection_native(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(12, 8)).astype("<f8")
    root = str(tmp_path / "s")
    zarrlite.write_array(root, "x", data, chunks=(5, 3))
    arr = zarrlite.open_group(root)["x"]
    np.testing.assert_array_equal(arr[2:11, [0, 3, 7]],
                                  data[2:11][:, [0, 3, 7]])
    np.testing.assert_array_equal(arr[7], data[7])


def test_prefetcher_order_and_exception():
    from credit_tpu.data.prefetch import Prefetcher

    got = list(Prefetcher(range(20), lambda i: i * i, depth=3))
    assert got == [i * i for i in range(20)]

    def boom(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(Prefetcher(range(10), boom, depth=2))


def test_prefetcher_early_close():
    from credit_tpu.data.prefetch import Prefetcher

    seen = []

    def fn(i):
        seen.append(i)
        return i

    with Prefetcher(range(1000), fn, depth=2) as pf:
        assert next(pf) == 0
    # producer stopped well short of the full range
    assert len(seen) < 50
