"""Multimodal: SigLIP tower -> projector -> MMEmbedding -> generation with
image tokens substituted in the prompt (Gemma3ForConditionalGeneration)."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Gemma3ForConditionalGeneration"],
    bos_token_id=2, eos_token_id=1,
    mm_tokens_per_image=4, image_token_index=500,
    text_config=dict(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        max_position_embeddings=4096, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, head_dim=32, hidden_act="gelu_pytorch_tanh",
        sliding_window=64, sliding_window_pattern=2,
        rope_local_base_freq=10000.0, query_pre_attn_scalar=32,
        tie_word_embeddings=True,
    ),
    vision_config=dict(
        hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
        intermediate_size=128, image_size=56, patch_size=14,
        layer_norm_eps=1e-6,
    ),
    torch_dtype="bfloat16",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("g3vl"))
    write_synth_dense_for_arch(d, CFG, seed=17)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    return config, text, vision


def test_vision_tower_and_projector(setup):
    config, text, vision = setup
    rng = np.random.default_rng(0)
    px = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    emb = vision.get_image_embeddings(px)
    assert emb.embeddings.shape == (4, 128)  # mm_tokens x text hidden
    assert np.isfinite(emb.embeddings).all()
    assert emb.first_index >= 1_000_000_000


def test_generate_with_image(setup):
    config, text, vision = setup
    rng = np.random.default_rng(1)
    px1 = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    px2 = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)

    def run(px):
        e = vision.get_image_embeddings(px)
        prompt = np.concatenate([
            np.array([5, 9], np.int64), e.token_ids, np.array([13, 7], np.int64)
        ])
        gen = Generator(text, Cache(text, CacheSpec(layout="paged", num_pages=8)))
        job = Job(prompt, max_new_tokens=8, embeddings=[e])
        gen.enqueue(job)
        while gen.num_remaining_jobs():
            gen.iterate()
        return job.new_tokens

    out1 = run(px1)
    out1_again = run(px1)
    out2 = run(px2)
    assert len(out1) == 8 and all(isinstance(t, int) for t in out1)
    assert out1 == out1_again  # deterministic
    assert out1 != out2  # the image actually reaches the model
