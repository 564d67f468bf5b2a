"""DeepSeek-V4: hybrid DSA attention (sliding/CSA/HCA pools), mHC streams and
hash/sqrtsp MoE — cached decode parity, chunk-boundary invariance, and the
paged continuous-batching generator with per-slot compressor state."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator

CFG = dict(
    architectures=["DeepseekV4ForCausalLM"], bos_token_id=1, eos_token_id=2,
    vocab_size=256, hidden_size=64, max_position_embeddings=4096,
    num_attention_heads=4, num_key_value_heads=1, num_hidden_layers=3,
    rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="bfloat16",
    head_dim=32, qk_rope_head_dim=8, q_lora_rank=32, o_groups=2,
    o_lora_rank=16, sliding_window=8, index_n_heads=4, index_head_dim=16,
    index_topk=4, compress_ratios=[0, 4, 128], compress_rate_csa=4,
    compress_rate_hca=8, hc_mult=4, hc_sinkhorn_iters=5,
    moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
    n_shared_experts=1, num_hash_layers=1, routed_scaling_factor=1.5,
    swiglu_limit=10.0,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsv4"))
    write_synth_dense_for_arch(d, CFG, seed=5)
    m = Model.from_config(Config.from_directory(d))
    m.load()
    return m


def _decode(model, ids, splits, max_len=64):
    """Run ids through chunks split at the given boundaries; return logits."""
    import jax.numpy as jnp

    B, S = ids.shape
    cache = Cache(model, CacheSpec(layout="linear", batch_size=B,
                                   max_len=max_len, recurrent_slots=B))
    step = model.jitted_step("dense", donate_cache=False)
    outs = []
    start = 0
    for stop in list(splits) + [S]:
        if stop <= start:
            continue
        chunk = ids[:, start:stop]
        pos = np.broadcast_to(np.arange(start, stop, dtype=np.int32),
                              (B, stop - start))
        lt, cache.state = step(model.params, jnp.asarray(chunk), cache.state,
                               jnp.asarray(pos.copy()),
                               jnp.full(B, start, np.int32), None)
        outs.append(np.asarray(lt))
        start = stop
    return np.concatenate(outs, axis=1)


def test_dsv4_cached_matches_cacheless(model):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 250, size=(1, 14)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))
    assert np.isfinite(full).all()
    inc = _decode(model, ids, splits=range(1, 14))  # token by token
    assert (inc.argmax(-1) == full.argmax(-1)).mean() == 1.0


def test_dsv4_chunk_boundary_invariance(model):
    """Compressor row-buffer + Ca overlap carry: any chunking must give the
    same logits (windows straddle chunk boundaries)."""
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 250, size=(1, 17)).astype(np.int32)
    a = _decode(model, ids, splits=[9])       # window-straddling split
    b = _decode(model, ids, splits=[4, 7, 13])
    c = _decode(model, ids, splits=[])
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(a, c, rtol=3e-2, atol=3e-2)
    assert (a.argmax(-1) == c.argmax(-1)).mean() >= 0.9


def test_dsv4_generator(model):
    """Paged continuous batching with per-slot rings/pools: batched output
    must match single-row linear-cache greedy decode."""
    import jax.numpy as jnp

    def greedy_ref(prompt, n):
        cache = Cache(model, CacheSpec(layout="linear", batch_size=1,
                                       max_len=256, recurrent_slots=1))
        step = model.jitted_step("dense", donate_cache=False)
        ids = np.asarray(prompt, np.int32)[None]
        pos = np.arange(ids.shape[1], dtype=np.int32)[None]
        lt, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                               jnp.asarray(pos), jnp.zeros(1, np.int32), None)
        toks = [int(np.asarray(lt[0, -1]).argmax())]
        t = ids.shape[1]
        for _ in range(n - 1):
            lt, cache.state = step(model.params, jnp.asarray([[toks[-1]]]),
                                   cache.state, jnp.asarray([[t]]),
                                   jnp.full(1, t, np.int32), None)
            toks.append(int(np.asarray(lt[0, -1]).argmax()))
            t += 1
        return toks

    cache = Cache(model, CacheSpec(layout="paged", num_pages=16,
                                   recurrent_slots=9))
    gen = Generator(model, cache, max_batch_size=8)
    assert gen.has_recurrent
    prompts = [[5, 9, 13, 2, 7], [3, 3, 8, 1], [100, 200, 31, 17, 4, 90]]
    n = 10
    refs = [greedy_ref(p, n) for p in prompts]
    outs = gen.generate([np.asarray(p, np.int32) for p in prompts],
                        max_new_tokens=n)
    for got, ref in zip(outs, refs):
        agree = np.mean([a == b for a, b in zip(got, ref)])
        assert agree >= 0.8, (got, ref)


DSPARK_CFG = dict(
    CFG, compress_ratios=[0, 4, 128, 0], dspark_block_size=4,
    dspark_noise_token_id=3, dspark_markov_rank=16,
    dspark_target_layer_ids=[0, 2],
)


def test_dspark_drafter_matches_plain(tmp_path):
    """DSpark block drafter (V4 MTP component): greedy output must equal
    plain greedy decode; the drafter actually proposes tokens. Exercises the
    speculative-rewind self-healing of the compressor state."""
    from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch

    d = str(tmp_path / "v4sp")
    write_synth_dense_for_arch(d, DSPARK_CFG, seed=7)
    config = Config.from_directory(d)
    assert "mtp" in config.model_classes
    target = Model.from_config(config)
    target.load()
    draft = Model.from_config(config, component="mtp")
    draft.load()
    assert draft.caps.get("dflash_draft")
    assert draft.block_size == 5

    prompt = np.array([5, 9, 13, 2, 7, 44, 91, 30], np.int64)
    plain = Generator(target, Cache(target, CacheSpec(
        layout="paged", num_pages=16, recurrent_slots=5)), max_batch_size=4)
    ref = plain.generate(prompt.copy(), max_new_tokens=12)

    gen = Generator(target, Cache(target, CacheSpec(
        layout="paged", num_pages=16, recurrent_slots=5)), max_batch_size=4,
        draft_model=draft, num_draft_tokens=3)
    assert gen.dflash_model is not None
    out = gen.generate(prompt.copy(), max_new_tokens=12)
    assert out == ref
    assert gen.num_drafted > 0


def test_dsv4_decode_kernel_matches_dense(model):
    """S=1 decode through the Pallas window-ring + HCA-pool kernels (stat
    merge) must produce the same greedy tokens as the dense path. CSA
    layers keep the dense route (indexer top-k), exercised in the same
    forward."""
    import os

    def gen_tokens(backend):
        os.environ["EXL3_TPU_ATTN"] = backend
        try:
            cache = Cache(model, CacheSpec(layout="paged", num_pages=16,
                                           recurrent_slots=9))
            gen = Generator(model, cache, max_batch_size=4)
            prompt = np.asarray([5, 9, 13, 2, 7, 100, 200, 31], np.int32)
            return gen.generate(prompt, max_new_tokens=12,
                                decode_text=False)
        finally:
            os.environ.pop("EXL3_TPU_ATTN", None)

    dense = gen_tokens("dense")
    kern = gen_tokens("interpret")
    agree = np.mean([a == b for a, b in zip(kern, dense)])
    assert agree >= 0.9, (kern, dense)


def test_dsv4_qblock_chunking_exact(model, monkeypatch):
    """Long prefill chunks map over query blocks (bounded score tensors);
    the blocked path must be bit-exact vs one unblocked pass."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 256, size=(1, 300)).astype(np.int32))
    monkeypatch.setenv("EXL3_TPU_DSV4_QBLOCK", "4096")
    l_full = np.asarray(model.forward_simple(ids))
    monkeypatch.setenv("EXL3_TPU_DSV4_QBLOCK", "64")
    l_blk = np.asarray(model.forward_simple(ids))
    np.testing.assert_array_equal(l_full, l_blk)


def test_dsv4_csa_gather_matches_dense(model, monkeypatch):
    """S>1 CSA via per-query top-K entry gather (bounded pool tensors) must
    match the dense masked-score path (reference dsa_triton.py:626-848; the
    two differ only on exact indexer-score ties)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, 256, size=(2, 200)).astype(np.int32))

    monkeypatch.setenv("EXL3_TPU_DSV4_CSA", "dense")
    model._step_cache.clear()
    l_dense = np.asarray(model.forward_simple(ids))

    monkeypatch.setenv("EXL3_TPU_DSV4_CSA", "auto")
    model._step_cache.clear()
    l_gather = np.asarray(model.forward_simple(ids))
    model._step_cache.clear()

    np.testing.assert_allclose(l_gather, l_dense, rtol=2e-3, atol=2e-3)
