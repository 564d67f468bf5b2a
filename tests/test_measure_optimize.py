"""Sensitivity measurement + bit-allocation optimizer."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_tiny_llama_dense, tiny_llama_cfg
from exllamav3_tpu.conversion.measure import measure_model
from exllamav3_tpu.conversion.optimize import optimize_strategy


@pytest.mark.slow
def test_measure_and_optimize(tmp_path):
    d = str(tmp_path / "m")
    write_tiny_llama_dense(
        d, tiny_llama_cfg(vocab_size=256, hidden_size=128, intermediate_size=128,
                          num_layers=1, num_q_heads=4, num_kv_heads=4),
        seed=3)
    meas = measure_model(d, bits=(2, 4), rows=2, length=64, verbose=False)
    assert meas["modules"]
    for key, entry in meas["modules"].items():
        # more bits -> lower proxy error, everywhere
        assert entry["err"]["4"] < entry["err"]["2"], key

    res = optimize_strategy(meas, target_bpw=3.0)
    alloc = res["strategy"]
    assert set(alloc) == set(meas["modules"])
    assert 2.0 <= res["achieved_bpw"] <= 3.0
    assert any(v == 4 for v in alloc.values())  # some layers upgraded
    assert any(v == 2 for v in alloc.values())  # within budget, not all

    # tighter budget -> fewer upgrades
    res2 = optimize_strategy(meas, target_bpw=2.25)
    up2 = sum(1 for v in res2["strategy"].values() if v == 4)
    up3 = sum(1 for v in alloc.values() if v == 4)
    assert up2 <= up3
