"""Gemma4 and Step-3.7 vision towers: embeddings flow into generation."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

G4_CFG = dict(
    architectures=["Gemma4ForConditionalGeneration"], bos_token_id=1,
    eos_token_id=2, vocab_size=512, torch_dtype="bfloat16",
    text_config=dict(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=2, rms_norm_eps=1e-5, head_dim=32,
        hidden_activation="gelu_pytorch_tanh", sliding_window=64,
        layer_types=["sliding_attention", "full_attention"],
        rope_parameters={"sliding_attention": {"rope_theta": 10000.0},
                         "full_attention": {"rope_theta": 1000000.0}},
        tie_word_embeddings=True),
    vision_config=dict(num_hidden_layers=2, hidden_size=32,
                       num_attention_heads=2, head_dim=16,
                       intermediate_size=64, patch_size=4,
                       pooling_kernel_size=2, position_embedding_size=8,
                       rms_norm_eps=1e-6, rope_theta=100.0,
                       standardize=True),
)

S37_CFG = dict(
    architectures=["Step3p7ForConditionalGeneration"], bos_token_id=1,
    eos_token_id=2, vocab_size=512, max_position_embeddings=4096,
    torch_dtype="bfloat16",
    text_config=dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=4,
        num_attention_groups=2, num_hidden_layers=2, rms_norm_eps=1e-5,
        head_dim=32, hidden_act="silu", sliding_window=64,
        attention_other_setting=dict(head_dim=32, num_attention_heads=2,
                                     num_attention_groups=1),
        layer_types=["sliding_attention", "full_attention"],
        rope_theta=[10000.0, 500000.0], partial_rotary_factors=[1.0, 0.5],
        moe_intermediate_size=64, moe_num_experts=4, moe_top_k=2,
        share_expert_dim=64, moe_router_scaling_factor=2.0,
        moe_layers_enum="1", swiglu_limits=[7.0, 7.0],
        swiglu_limits_shared=[7.0, 7.0]),
    vision_config=dict(layers=2, width=32, heads=2, mlp_ratio=2.0,
                       patch_size=4, image_size=32, layer_norm_eps=1e-5,
                       use_rope2d=True, rope_theta=10000.0),
)


def _roundtrip(cfg, seed, px_shape, px_range, tmp_path, name):
    d = str(tmp_path / name)
    write_synth_dense_for_arch(d, cfg, seed=seed)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    rng = np.random.default_rng(seed)
    lo, hi = px_range
    px1 = rng.uniform(lo, hi, px_shape).astype(np.float32)
    px2 = rng.uniform(lo, hi, px_shape).astype(np.float32)

    def run(px):
        e = vision.get_image_embeddings(px)
        assert np.isfinite(e.embeddings).all()
        prompt = np.concatenate([
            np.array([5, 9], np.int64), e.token_ids,
            np.array([13, 7], np.int64)])
        gen = Generator(text, Cache(text, CacheSpec(layout="paged",
                                                    num_pages=8)))
        job = Job(prompt, max_new_tokens=6, embeddings=[e])
        gen.enqueue(job)
        while gen.num_remaining_jobs():
            gen.iterate()
        return job.new_tokens

    out1 = run(px1)
    assert out1 == run(px1)
    assert out1 != run(px2)


def test_gemma4_vision_roundtrip(tmp_path):
    _roundtrip(G4_CFG, 31, (16, 16, 3), (0.0, 1.0), tmp_path, "g4")


def test_step37_vision_roundtrip(tmp_path):
    _roundtrip(S37_CFG, 37, (32, 32, 3), (-1.0, 1.0), tmp_path, "s37")


def test_gemma4_unified_vision_roundtrip(tmp_path):
    cfg = dict(G4_CFG, architectures=["Gemma4UnifiedForConditionalGeneration"],
               vision_config=dict(mm_embed_dim=32, output_proj_dims=128,
                                  model_patch_size=4, patch_size=4,
                                  pooling_kernel_size=2, mm_posemb_size=8,
                                  rms_norm_eps=1e-6))
    _roundtrip(cfg, 33, (16, 16, 3), (0.0, 1.0), tmp_path, "g4u")


def test_step37_tiling_geometry():
    """Sliding-window tiling math (reference mm_processing/step3_7.py):
    small images stay single; big images tile with row-end newline marks."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    from exllamav3_tpu.tokenizer.image_processing import step37_get_patches

    # small: no tiling
    img = Image.new("RGB", (400, 300))
    g, patches, mask = step37_get_patches(img)
    assert patches == [] and mask is None

    # 1600x800: window 504, crop canvas 1512x1008 -> 3x2 crops
    img = Image.new("RGB", (1600, 800))
    g, patches, mask = step37_get_patches(img)
    assert len(patches) == 6
    assert all(p.size == (504, 504) for p in patches)
    # newline at the end of row 1 (idx 2); the final row's marker drops
    assert mask == [False, False, True, False, False, False]

    # oversized input caps at 3024 before tiling
    img = Image.new("RGB", (4000, 1000))
    g, _, _ = step37_get_patches(img)
    assert max(g.size) <= 3024


def test_mm_token_string_interleave():
    from exllamav3_tpu.tokenizer.mm_embedding import MMEmbedding

    e = MMEmbedding(np.zeros((3, 8), np.float32),
                    token_string=[50, -1, -1, 51, -1, 52])
    ids = e.token_ids
    assert ids[0] == 50 and ids[3] == 51 and ids[5] == 52
    dyn = [ids[1], ids[2], ids[4]]
    assert dyn == [e.first_index, e.first_index + 1, e.first_index + 2]


def test_step37_multitile_embeddings(tmp_path):
    """Multi-tile path end to end: patch crops + global view interleave with
    delimiter tokens; generation consumes the mixed token string."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    d = str(tmp_path / "s37t")
    write_synth_dense_for_arch(d, S37_CFG, seed=37)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()

    class TokStub:
        _ids = {"<im_start>": 100, "<im_end>": 101, "<patch_start>": 102,
                "<patch_end>": 103, "<patch_newline>": 104}

        def single_id(self, t):
            return self._ids.get(t)

    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 255, (800, 1600, 3))).astype(np.uint8)
    img = Image.fromarray(arr)
    # tower geometry is tiny (image_size 32): shrink the pp crop size too
    config.cfg["patch_size_pp"] = 32
    e = vision.get_image_embeddings_pil(img, tokenizer=TokStub())
    assert e.token_string is not None
    ids = e.token_ids
    assert (ids == 102).sum() == 6          # six patch crops
    assert (ids == 104).sum() == 1          # one newline marker
    assert (ids == 100).sum() == 1          # one global image span
    assert np.isfinite(e.embeddings).all()

    prompt = np.concatenate([np.array([5], np.int64), ids,
                             np.array([7], np.int64)])
    gen = Generator(text, Cache(text, CacheSpec(layout="paged", num_pages=8)))
    job = Job(prompt, max_new_tokens=4, embeddings=[e])
    gen.enqueue(job)
    while gen.num_remaining_jobs():
        gen.iterate()
    assert len(job.new_tokens) == 4
