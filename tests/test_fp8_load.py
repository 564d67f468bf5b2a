"""fp8-block dense checkpoint loading (DeepSeek-style weight_scale_inv)."""
import numpy as np

from exllamav3_tpu.loader.safetensors import (
    fp8_e4m3_to_f32,
    fp8_e5m2_to_f32,
    save_file,
    SafetensorsCollection,
)


def _f32_to_e4m3(x):
    """Encode f32 -> e4m3fn bytes via torch (independent reference)."""
    import torch

    return torch.from_numpy(x).to(torch.float8_e4m3fn).view(torch.uint8).numpy()


def test_fp8_decode_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) * 3).astype(np.float32)
    enc = _f32_to_e4m3(x)
    dec = fp8_e4m3_to_f32(enc)
    ref = torch.from_numpy(enc).view(torch.float8_e4m3fn).float().numpy()
    np.testing.assert_array_equal(dec, ref)

    enc5 = torch.from_numpy(x).to(torch.float8_e5m2).view(torch.uint8).numpy()
    ref5 = torch.from_numpy(enc5).view(torch.float8_e5m2).float().numpy()
    np.testing.assert_array_equal(fp8_e5m2_to_f32(enc5), ref5)


def test_fp8_block_weight_load(tmp_path):
    rng = np.random.default_rng(1)
    out_f, in_f = 256, 128
    w = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)
    # block-quantize with a 2x1 scale grid (blocks of 128 rows)
    si = np.abs(rng.standard_normal((2, 1))).astype(np.float32) + 0.5
    w_scaled = (w.reshape(2, 128, 1, in_f) / si.reshape(2, 1, 1, 1)).reshape(
        out_f, in_f)
    enc = _f32_to_e4m3(w_scaled).reshape(out_f, in_f)

    d = str(tmp_path)
    import struct, json, os

    # write a raw safetensors file with F8_E4M3 dtype by hand
    header = {
        "w.weight": {"dtype": "F8_E4M3", "shape": [out_f, in_f],
                     "data_offsets": [0, out_f * in_f]},
        "w.weight_scale_inv": {
            "dtype": "F32", "shape": [2, 1],
            "data_offsets": [out_f * in_f, out_f * in_f + 8]},
    }
    hb = json.dumps(header).encode()
    pad = (8 - len(hb) % 8) % 8
    hb += b" " * pad
    with open(os.path.join(d, "model.safetensors"), "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        f.write(enc.tobytes())
        f.write(si.astype(np.float32).tobytes())

    stc = SafetensorsCollection(d)
    from exllamav3_tpu.modules.linear import read_dense_weight

    got = read_dense_weight(stc, "w")
    ref = fp8_e4m3_to_f32(enc) * np.repeat(si, 128, axis=0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    # round-trip error vs the original weights stays at fp8 scale
    assert np.abs(got - w).max() < 0.01
