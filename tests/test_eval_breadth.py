"""Eval harness breadth (reference eval/humaneval.py, mmlu.py, ifbench.py,
bbeh_mini.py): scoring logic units + synthetic end-to-end pipelines."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

EVAL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval")
sys.path.insert(0, EVAL_DIR)

from exllamav3_tpu.conversion.synth import (
    write_tiny_llama_exl3, tiny_llama_cfg, write_synth_tokenizer)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evalm"))
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                         num_layers=2, num_q_heads=4, num_kv_heads=4)
    write_tiny_llama_exl3(d, cfg, K=4, seed=31)
    write_synth_tokenizer(d)
    return d


def test_humaneval_exec_scoring():
    import humaneval

    probs = humaneval.synthetic_problems(2)
    good = probs[0]["canonical_solution"]
    assert humaneval.run_test(probs[0], good)
    assert not humaneval.run_test(probs[0], "    return 0\n")
    assert not humaneval.run_test(probs[0], "    while True: pass\n",
                                  timeout=1.0)


def test_ifbench_checks():
    import ifbench

    assert ifbench.check_response("one two three", {"type": "max_words", "n": 3})
    assert not ifbench.check_response("a b c d", {"type": "max_words", "n": 3})
    assert ifbench.check_response("hello world", {"type": "contains",
                                                  "text": "world"})
    assert ifbench.check_response('{"a": 1}', {"type": "json_object"})
    assert not ifbench.check_response("[1]", {"type": "json_object"})
    assert ifbench.check_response("p1\n\np2", {"type": "n_paragraphs", "n": 2})
    assert ifbench.check_response("abc", {"type": "all_lowercase"})


def test_bbeh_extract():
    import bbeh_mini

    assert bbeh_mini.extract_answer("blah. The answer is 42.") == "42"
    assert bbeh_mini.extract_answer("reasoning\nfinal line") == "final line"
    assert bbeh_mini.extract_answer(
        "The answer is X\nmore\nThe answer is: Y.") == "y"


def _run_eval(script, model_dir, *extra):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.path.insert(0, {EVAL_DIR!r});"
        f"sys.argv = ['x', '-m', {model_dir!r}] + {list(extra)!r};"
        f"import {script}; {script}.main()"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900,
                         cwd=os.path.dirname(EVAL_DIR))
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_mmlu_synthetic_pipeline(model_dir):
    res = _run_eval("mmlu", model_dir, "--synthetic", "4")
    assert res["metric"] == "mmlu_acc"
    assert res["n"] == 4
    assert 0.0 <= res["value"] <= 1.0


def test_ifbench_synthetic_pipeline(model_dir):
    res = _run_eval("ifbench", model_dir, "--synthetic", "2",
                    "--max_tokens", "8", "-cs", "2048")
    assert res["metric"] == "ifbench_strict_acc"
    assert res["n"] == 2
    # 8 random tokens always satisfy "under 40 words"
    assert res["value"] == 1.0


def test_bbeh_synthetic_pipeline(model_dir):
    res = _run_eval("bbeh_mini", model_dir, "--synthetic", "2",
                    "--max_tokens", "8", "-cs", "2048")
    assert res["metric"] == "bbeh_mini_acc"
    assert res["n"] == 2


def test_humaneval_synthetic_pipeline(model_dir, tmp_path):
    out_file = str(tmp_path / "samples.jsonl")
    res = _run_eval("humaneval", model_dir, "--synthetic", "2",
                    "--max_tokens", "8", "-cs", "2048",
                    "--samples_out", out_file)
    assert res["n"] == 2
    with open(out_file) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 2 and all("completion" in l for l in lines)


def test_mmlu_fewshot_in_subject(model_dir):
    """Few-shot shots are selected in-subject (dev-split style); without a
    --dev_dataset the shots come out of the test rows with a warning."""
    res = _run_eval("mmlu", model_dir, "--synthetic", "8", "--fewshot", "2")
    assert res["metric"] == "mmlu_acc"
    assert res["n"] == 6  # 2 per-subject shots removed from scoring


def test_diversity_token_mode(tmp_path):
    """Token-sequence diversity harness: greedy is deterministic (score 0),
    temperature sampling on a chaotic synth model is near-unique (score ~1)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "eval"))
    import diversity as dv
    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
    from exllamav3_tpu.model import Config, Model, InferParams

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(
        d, tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_q_heads=4, num_kv_heads=4),
        K=4, seed=5)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    res = dv.token_mode(m, num_samples=5, temperature=1.0, max_tokens=12)
    assert res["greedy"]["full_seq"] == 0.0
    assert res["sampled"]["full_seq"] > 0.5
    assert dv.diversity_score(["a"] * 9) == 0.0
    assert dv.diversity_score(list(range(9))) == 1.0
