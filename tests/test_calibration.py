"""Calibration mixes (reference conversion/calibration_data.py): weighted
file sources, synthetic generator variety, bos stamping."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.calibration import get_calibration
from exllamav3_tpu.conversion.synth import (
    write_tiny_llama_exl3, tiny_llama_cfg, write_synth_tokenizer)
from exllamav3_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("calm"))
    write_tiny_llama_exl3(d, tiny_llama_cfg(vocab_size=512), seed=5)
    write_synth_tokenizer(d)
    t = Tokenizer(d)
    t.bos_token_id = 7
    return t


def test_synthetic_mix_shapes_and_variety():
    cal = get_calibration(rows=20, length=64, vocab_size=500, seed=1)
    assert cal.shape == (20, 64)
    assert cal.min() >= 0 and cal.max() < 500
    # distinct generators -> rows with very different entropy profiles
    uniq = [len(np.unique(r)) for r in cal]
    assert max(uniq) > 3 * min(uniq)


def test_weighted_file_mix(tmp_path, tok):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("alpha beta gamma delta " * 400)
    b.write_text("zebra quokka " * 400)
    rows = 12
    cal = get_calibration(tok, rows=rows, length=32,
                          text_files=[(str(a), 3.0), (str(b), 1.0)],
                          seed=2)
    assert cal.shape == (rows, 32)
    ids_a = set(np.asarray(tok.encode("alpha beta gamma delta")).reshape(-1)
                .tolist())
    ids_b = set(np.asarray(tok.encode("zebra quokka")).reshape(-1).tolist())
    only_b = ids_b - ids_a
    from_b = sum(1 for r in cal if set(r.tolist()) & only_b)
    # roughly 1/4 of rows drawn from source b
    assert 1 <= from_b <= rows // 2


def test_string_weight_spec_and_bos(tmp_path, tok):
    a = tmp_path / "a.txt"
    a.write_text("hello world " * 500)
    cal = get_calibration(tok, rows=4, length=16,
                          text_files=[f"{a}:2"], seed=3)
    assert cal.shape == (4, 16)
    assert (cal[:, 0] == 7).all()  # bos stamped


def test_bundled_real_text_default(tok, monkeypatch):
    """With a tokenizer and no explicit text_files, the vendored real-text
    mix (conversion/cal_data/) is used; EXL3TPU_NO_CAL_DATA reverts to the
    synthetic generators."""
    from exllamav3_tpu.conversion.calibration import bundled_text_files

    files = bundled_text_files()
    assert files, "vendored cal_data missing"
    assert any("english" in p for p, _ in files)
    real = get_calibration(tok, rows=10, length=48, seed=4)
    monkeypatch.setenv("EXL3TPU_NO_CAL_DATA", "1")
    synth = get_calibration(tok, rows=10, length=48, seed=4)
    assert real.shape == synth.shape == (10, 48)
    assert not np.array_equal(real, synth)
