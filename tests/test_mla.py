"""MLA (multi-head latent attention) correctness.

Checks the absorbed form (scores via q_nope @ W_UK against the latent,
output via attention @ latent @ W_UV) against an explicit MHA computation
that up-projects per-head K/V from the same weights — independent algebra,
same math (reference exllamav3/modules/mla_attn.py:30-49). Plus cache
parity: cacheless vs linear chunked vs paged vs quantized latent.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.modules.mla_attn import MLAttention
from exllamav3_tpu.modules.module import ForwardCtx

H_SIZE = 128

def _mla_cfg(arch="DeepseekV3ForCausalLM", q_lora_rank=None, layers=2):
    cfg = dict(
        architectures=[arch], bos_token_id=1, eos_token_id=2,
        vocab_size=512, hidden_size=H_SIZE, intermediate_size=256,
        max_position_embeddings=4096, num_attention_heads=4,
        num_hidden_layers=layers, rms_norm_eps=1e-5, rope_theta=10000.0,
        torch_dtype="bfloat16", hidden_act="silu",
        kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=32,
        v_head_dim=32,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=64, first_k_dense_replace=1,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, scoring_func="sigmoid",
    )
    if q_lora_rank:
        cfg["q_lora_rank"] = q_lora_rank
    return cfg


def _build(tmp_path, name, **kw):
    cfg = _mla_cfg(**kw)
    d = str(tmp_path / name)
    write_synth_dense_for_arch(d, cfg, seed=7)
    model = Model.from_config(Config.from_directory(d))
    model.load()
    return model, cfg


def _rms(x, w, eps=1e-5):
    v = x / np.sqrt(np.mean(x.astype(np.float64) ** 2, -1, keepdims=True) + eps)
    return (v * w).astype(np.float64)


def test_absorbed_matches_explicit_mha(tmp_path):
    """Module-level: absorbed MLA forward == explicit up-projected MHA."""
    model, cfg = _build(tmp_path, "v2", arch="DeepseekV2ForCausalLM",
                        q_lora_rank=48, layers=1)
    attn: MLAttention = model.modules[1].attn
    p = model.params
    B, S = 2, 12
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, S, H_SIZE)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))

    ctx = ForwardCtx(positions=jnp.asarray(pos))
    # absorbed module path, minus the final o_proj (checked separately)
    y_abs = np.asarray(attn.forward(jnp.asarray(x), p, ctx))

    # --- explicit MHA in numpy from the same params -------------------------
    def w(key):
        return np.asarray(p[key]["weight"], dtype=np.float64)

    pre = f"{attn.key}"
    qa = _rms(x @ w(f"{pre}.q_a_proj"),
              np.asarray(p[f"{pre}.q_a_layernorm"]["weight"]))
    q = qa @ w(f"{pre}.q_b_proj")
    H, dn, dr, dv, c = (attn.num_q_heads, attn.qk_nope_head_dim,
                        attn.qk_rope_head_dim, attn.v_head_dim, attn.kv_lora_rank)
    q = q.reshape(B, S, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    kv = x @ w(f"{pre}.kv_a_proj_with_mqa")
    c_kv = _rms(kv[..., :c], np.asarray(p[f"{pre}.kv_a_layernorm"]["weight"]))
    k_pe = kv[..., c:]

    # rope via the module's own (separately tested) implementation
    sin, cos = attn.rope.sin_cos(jnp.asarray(pos))
    q_pe = np.asarray(attn.rope.apply(jnp.asarray(q_pe, dtype=jnp.float32), sin, cos))
    k_pe = np.asarray(attn.rope.apply(
        jnp.asarray(k_pe[:, :, None, :], dtype=jnp.float32), sin, cos))[:, :, 0]

    w_uk = np.asarray(p[pre]["w_uk"], dtype=np.float64)  # (c, H, dn)
    w_uv = np.asarray(p[pre]["w_uv"], dtype=np.float64)  # (c, H, dv)
    k_nope = np.einsum("bsc,chn->bshn", c_kv, w_uk)
    v = np.einsum("bsc,chv->bshv", c_kv, w_uv)
    k = np.concatenate([k_nope, np.broadcast_to(k_pe[:, :, None, :],
                                                (B, S, H, dr))], -1)
    qfull = np.concatenate([q_nope, q_pe], -1)

    scores = np.einsum("bshd,bthd->bhst", qfull, k) * attn.sm_scale
    mask = np.tril(np.ones((S, S), bool))
    scores = np.where(mask[None, None], scores, -1e30)
    pr = np.exp(scores - scores.max(-1, keepdims=True))
    pr = pr / pr.sum(-1, keepdims=True)
    o = np.einsum("bhst,bthv->bshv", pr, v).reshape(B, S, H * dv)
    y_ref = o @ w(f"{pre}.o_proj")

    cos_sim = np.sum(y_abs * y_ref) / (np.linalg.norm(y_abs) * np.linalg.norm(y_ref))
    assert cos_sim > 0.999, cos_sim
    rel = np.abs(y_abs - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.05, rel  # bf16 einsum noise


@pytest.mark.parametrize("arch,qlr", [("DeepseekV3ForCausalLM", None),
                                      ("DeepseekV2ForCausalLM", 48)])
def test_mla_cache_parity(tmp_path, arch, qlr):
    model, cfg = _build(tmp_path, arch, arch=arch, q_lora_rank=qlr)
    rng = np.random.default_rng(0)
    B, S = 1, 10
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))
    assert np.isfinite(full).all()

    # linear cache, chunked
    cache = Cache(model, CacheSpec(layout="linear", batch_size=B, max_len=16))
    step = model.jitted_step("dense", donate_cache=False)
    pos = np.broadcast_to(np.arange(6, dtype=np.int32), (B, 6))
    l1, cache.state = step(model.params, jnp.asarray(ids[:, :6]), cache.state,
                           jnp.asarray(pos), jnp.zeros(B, jnp.int32), None)
    outs = [np.asarray(l1)]
    for t in range(6, S):
        pt = np.full((B, 1), t, np.int32)
        lt, cache.state = step(model.params, jnp.asarray(ids[:, t:t+1]),
                               cache.state, jnp.asarray(pt),
                               jnp.full(B, t, np.int32), None)
        outs.append(np.asarray(lt))
    inc = np.concatenate(outs, axis=1)
    assert (inc.argmax(-1) == full.argmax(-1)).mean() > 0.9

    # paged parity
    pcache = Cache(model, CacheSpec(layout="paged", num_pages=4))
    pstep = model.jitted_step("paged", donate_cache=False)
    bt = jnp.asarray(np.arange(4, dtype=np.int32)[None])  # one sequence, 4 pages
    posf = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
    lp, pcache.state = pstep(model.params, jnp.asarray(ids), pcache.state,
                             jnp.asarray(posf), jnp.zeros(B, jnp.int32), bt)
    lp = np.asarray(lp)
    assert (lp.argmax(-1) == full.argmax(-1)).mean() > 0.9


def test_mla_quantized_latent_cache(tmp_path):
    model, cfg = _build(tmp_path, "v3q")
    rng = np.random.default_rng(1)
    B, S = 1, 8
    ids = rng.integers(0, 500, size=(B, S)).astype(np.int32)
    full = np.asarray(model.forward_simple(ids))

    cache = Cache(model, CacheSpec(layout="linear", batch_size=B, max_len=16,
                                   k_bits=8, v_bits=8))
    step = model.jitted_step("dense", donate_cache=False, k_bits=8, v_bits=8)
    posf = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
    lq, cache.state = step(model.params, jnp.asarray(ids), cache.state,
                           jnp.asarray(posf), jnp.zeros(B, jnp.int32), None)
    lq = np.asarray(lq)
    # 8-bit latent should track closely
    cos = np.sum(lq * full) / (np.linalg.norm(lq) * np.linalg.norm(full) + 1e-9)
    assert cos > 0.99, cos
