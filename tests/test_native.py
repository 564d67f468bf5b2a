"""Native C++ components vs their Python/numpy golden equivalents."""
import numpy as np
import pytest

from exllamav3_tpu.native import native_available
from exllamav3_tpu.native.wrappers import (
    native_viterbi_quantize_tiles,
    NativeSAM,
    native_read_ranges,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no native lib")


def test_native_viterbi_matches_numpy():
    from exllamav3_tpu.quant.quantize import viterbi_quantize_tiles_np

    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((3, 256)).astype(np.float32)
    for K in (2, 4):
        vn, cn = viterbi_quantize_tiles_np(tiles, K, 0)
        vc, cc = native_viterbi_quantize_tiles(tiles, K, 0)
        mse_n = np.mean((vn - tiles) ** 2, axis=1)
        mse_c = np.mean((vc - tiles) ** 2, axis=1)
        np.testing.assert_allclose(mse_c, mse_n, rtol=1e-5)
        assert np.array_equal(cn, cc), K


def test_native_sam_matches_python():
    from exllamav3_tpu.generator.ngram import SuffixAutomaton

    rng = np.random.default_rng(1)
    seq = rng.integers(0, 5, size=200).tolist()
    py, nt = SuffixAutomaton(), NativeSAM()
    for t in seq:
        py.extend(t)
        nt.extend(t)
    assert py.draft(6) == nt.draft(6)


def test_native_read_ranges(tmp_path):
    p = str(tmp_path / "blob.bin")
    data = np.arange(100000, dtype=np.uint8)
    data.tofile(p)
    dsts = [np.empty(1000, np.uint8), np.empty(50000, np.uint8)]
    ok = native_read_ranges(p, [500, 30000], [1000, 50000], dsts)
    assert ok
    assert np.array_equal(dsts[0], data[500:1500])
    assert np.array_equal(dsts[1], data[30000:80000])
