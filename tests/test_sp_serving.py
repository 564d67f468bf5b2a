"""Sequence-parallel serving (parallel/sp.py): page-sharded cache + stat
merge must be exact vs single-device generation (8 virtual CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg
from exllamav3_tpu.model import Config, Model, InferParams, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job, GreedySampler
from exllamav3_tpu.constants import PAGE_SIZE


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spm"))
    cfg = tiny_llama_cfg(vocab_size=512, hidden_size=128, intermediate_size=256,
                         num_layers=2, num_q_heads=4, num_kv_heads=2,
                         head_dim=64)
    write_tiny_llama_exl3(d, cfg, K=4, seed=17)
    m = Model.from_config(Config.from_directory(
        d, infer_params=InferParams(linear_mode="bf16")))
    m.load()
    return m


def _sp_mesh(n=8):
    devs = jax.devices()[:n]
    return Mesh(np.asarray(devs), axis_names=("sp",))


def test_sp_paged_attend_matches_dense(model):
    """Kernel-level exactness: sp stat-merge vs single-device attend_paged."""
    from exllamav3_tpu.parallel.sp import sp_paged_attend, shard_cache_state
    from exllamav3_tpu.ops.attention import attend_paged

    rng = np.random.default_rng(3)
    B, S, Hq, Hk, D, P = 2, 1, 8, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(
        (P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal(
        (P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3)
    # pages deliberately scattered across shards
    bt = np.array([[3, 9], [14, 1]], dtype=np.int32)
    qpos = np.array([[300], [120]], dtype=np.int32)
    total = qpos[:, -1] + 1
    mesh = _sp_mesh()

    ref = np.asarray(attend_paged(
        q, k, v, jnp.asarray(bt), jnp.asarray(qpos), jnp.asarray(total),
        scale=D ** -0.5))
    state = {"k": k, "v": v}
    state = {"layer": state}
    state = shard_cache_state(state, mesh, "sp")["layer"]
    got = np.asarray(sp_paged_attend(
        q, state, jnp.asarray(bt), jnp.asarray(qpos), jnp.asarray(total),
        mesh, "sp", scale=D ** -0.5))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def _generate(model, sp_mesh, prompt):
    cache = Cache(model, CacheSpec(layout="paged", num_pages=16))
    gen = Generator(model, cache, sp_mesh=sp_mesh, max_batch_size=4)
    return gen.generate(np.asarray(prompt), max_new_tokens=16,
                        sampler=GreedySampler(), decode_text=False)


def test_sp_generate_matches_single(model):
    prompt = (np.arange(40) % 300 + 5).tolist()
    plain = _generate(model, None, prompt)
    sp = _generate(model, _sp_mesh(), prompt)
    assert sp == plain


def test_sp_quantized_cache_generate(model):
    """SP serving with a 4-bit packed cache: the shard bodies dequantize
    only their resident pages; tokens must match the single-device
    quantized run."""
    def run(sp):
        cache = Cache(model, CacheSpec(layout="paged", num_pages=16,
                                       k_bits=4, v_bits=4))
        gen = Generator(model, cache, sp_mesh=sp, max_batch_size=4)
        prompt = (np.arange(40) % 300 + 5).tolist()
        return gen.generate(np.asarray(prompt), max_new_tokens=12,
                            sampler=GreedySampler(), decode_text=False)

    assert run(_sp_mesh()) == run(None)


def test_sp_paged_attend_kernel_matches_dense(model):
    """The Pallas flash body (compacted local tables + page_indices) must
    match attend_paged exactly, including sliding windows and shards that
    own zero pages of a sequence."""
    from exllamav3_tpu.parallel.sp import sp_paged_attend
    from exllamav3_tpu.parallel.sp import shard_cache_state
    from exllamav3_tpu.ops.attention import attend_paged

    rng = np.random.default_rng(11)
    B, S, Hq, Hk, D, P = 2, 1, 8, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(
        (P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal(
        (P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3)
    # seq 0's pages live on shards {1, 4, 7}; seq 1's on {7, 0}
    bt = np.array([[3, 9, 15], [14, 1, 0]], dtype=np.int32)
    qpos = np.array([[700], [300]], dtype=np.int32)
    total = qpos[:, -1] + 1
    mesh = _sp_mesh()
    state = shard_cache_state({"l": {"k": k, "v": v}}, mesh, "sp")["l"]

    for win in (0, 300):
        ref = np.asarray(attend_paged(
            q, k, v, jnp.asarray(bt), jnp.asarray(qpos), jnp.asarray(total),
            scale=D ** -0.5, sliding_window=win))
        got = np.asarray(sp_paged_attend(
            q, state, jnp.asarray(bt), jnp.asarray(qpos), jnp.asarray(total),
            mesh, "sp", scale=D ** -0.5, sliding_window=win,
            backend="interpret"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sp_generate_kernel_matches_single(model, monkeypatch):
    """End-to-end serving through the sp flash-kernel path (interpret mode)
    decodes the same tokens as single-device generation."""
    monkeypatch.setenv("EXL3_TPU_ATTN", "interpret")
    prompt = (np.arange(40) % 300 + 5).tolist()
    plain = _generate(model, None, prompt)
    sp = _generate(model, _sp_mesh(), prompt)
    assert sp == plain


def test_sp_rejects_unsupported_layouts():
    """DSV4-pool-style cache layouts must be rejected up front, not silently
    all-gathered every step (MLA latents are supported as of round 3)."""
    from exllamav3_tpu.parallel.sp import shard_cache_state

    mesh = _sp_mesh()
    state = {"l0": {"pg_pool": jnp.zeros((16, PAGE_SIZE, 64)),
                    "cb_kv": jnp.zeros((4, 8, 64))}}
    with pytest.raises(ValueError, match="sp_mesh"):
        shard_cache_state(state, mesh, "sp")


# -- MLA latent sequence parallelism ------------------------------------------


@pytest.fixture(scope="module")
def mla_model(tmp_path_factory):
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch

    d = str(tmp_path_factory.mktemp("spmla"))
    cfg = dict(
        architectures=["DeepseekV3ForCausalLM"], bos_token_id=1,
        eos_token_id=2, vocab_size=512, hidden_size=256,
        intermediate_size=512, max_position_embeddings=2048,
        num_attention_heads=4, num_hidden_layers=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, torch_dtype="bfloat16", hidden_act="silu",
        kv_lora_rank=128, qk_nope_head_dim=64, qk_rope_head_dim=32,
        v_head_dim=64,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=64, first_k_dense_replace=2, n_group=2,
        topk_group=1, norm_topk_prob=True, routed_scaling_factor=1.0,
        scoring_func="sigmoid",
    )
    write_synth_dense_for_arch(d, cfg, seed=23)
    m = Model.from_config(Config.from_directory(d))
    m.load()
    return m


def _generate_mla(model, sp_mesh, prompt, k_bits=0):
    spec = CacheSpec(layout="paged", num_pages=16, k_bits=k_bits,
                     v_bits=k_bits)
    cache = Cache(model, spec)
    gen = Generator(model, cache, sp_mesh=sp_mesh, max_batch_size=4)
    return gen.generate(np.asarray(prompt), max_new_tokens=12,
                        sampler=GreedySampler(), decode_text=False)


def test_sp_mla_generate_matches_single(mla_model, monkeypatch):
    """MLA latent pages sharded over sp decode the same tokens as the
    single-device absorbed path (kernel in interpret mode per shard)."""
    monkeypatch.setenv("EXL3_TPU_ATTN", "interpret")
    prompt = (np.arange(40) % 300 + 5).tolist()
    plain = _generate_mla(mla_model, None, prompt)
    sp = _generate_mla(mla_model, _sp_mesh(), prompt)
    assert sp == plain


def test_sp_mla_quantized_latent(mla_model, monkeypatch):
    monkeypatch.setenv("EXL3_TPU_ATTN", "interpret")
    prompt = (np.arange(32) % 300 + 5).tolist()
    plain = _generate_mla(mla_model, None, prompt, k_bits=8)
    sp = _generate_mla(mla_model, _sp_mesh(), prompt, k_bits=8)
    assert sp == plain
