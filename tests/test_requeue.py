"""Job requeue/resume: interrupted jobs must produce identical output to
uninterrupted ones — for attention-only models (pages released, prefix cache
or re-prefill rebuilds KV) and recurrent models (state stashed to host RAM
via RecurrentStateCache and restored on re-admission)."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import (
    write_tiny_llama_exl3,
    tiny_llama_cfg,
    write_synth_dense_for_arch,
)
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec, InferParams


def _drive(gen, job, interrupt_after: int | None = None):
    gen.enqueue(job)
    interrupted = False
    while gen.num_remaining_jobs():
        gen.iterate()
        if (interrupt_after is not None and not interrupted
                and len(job.new_tokens) >= interrupt_after
                and job.status == "running"):
            gen.requeue(job)
            interrupted = True
    return list(job.new_tokens)


def test_requeue_attention_model(tmp_path):
    from exllamav3_tpu.generator import Generator, Job

    d = str(tmp_path / "m")
    write_tiny_llama_exl3(
        d, tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_q_heads=4, num_kv_heads=4),
        K=4, seed=3)
    model = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    model.load()

    prompt = np.arange(40, dtype=np.int64) % 200

    gen1 = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=8)))
    ref = _drive(gen1, __import__("exllamav3_tpu.generator", fromlist=["Job"]).Job(
        prompt.copy(), max_new_tokens=10))

    gen2 = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=8)))
    job = __import__("exllamav3_tpu.generator", fromlist=["Job"]).Job(
        prompt.copy(), max_new_tokens=10)
    out = _drive(gen2, job, interrupt_after=4)
    assert out == ref


def test_requeue_recurrent_model(tmp_path):
    from exllamav3_tpu.generator import Generator, Job

    cfg = dict(architectures=["Qwen3NextForCausalLM"], bos_token_id=1,
               eos_token_id=2, vocab_size=512, hidden_size=128,
               intermediate_size=256, max_position_embeddings=4096,
               num_attention_heads=4, num_key_value_heads=2,
               num_hidden_layers=2, rms_norm_eps=1e-5, rope_theta=10000.0,
               torch_dtype="bfloat16", head_dim=32, hidden_act="silu",
               full_attention_interval=2, linear_conv_kernel_dim=4,
               linear_num_key_heads=2, linear_num_value_heads=4,
               linear_key_head_dim=16, linear_value_head_dim=16,
               num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
               shared_expert_intermediate_size=64, decoder_sparse_step=1,
               norm_topk_prob=True, partial_rotary_factor=0.25)
    d = str(tmp_path / "q3n")
    write_synth_dense_for_arch(d, cfg, seed=13)
    model = Model.from_config(Config.from_directory(d))
    model.load()

    prompt = np.array([5, 9, 13, 2, 7, 44, 91], np.int64)

    gen1 = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=8,
                                                   recurrent_slots=5)),
                     max_batch_size=4)
    ref = _drive(gen1, Job(prompt.copy(), max_new_tokens=10))

    gen2 = Generator(model, Cache(model, CacheSpec(layout="paged", num_pages=8,
                                                   recurrent_slots=5)),
                     max_batch_size=4)
    job = Job(prompt.copy(), max_new_tokens=10)
    out = _drive(gen2, job, interrupt_after=4)
    assert out == ref
    assert gen2._rstash is not None
