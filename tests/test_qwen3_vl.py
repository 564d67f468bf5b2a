"""Qwen3-VL: vision tower with learned-pos-embed interpolation and deepstack
taps, and the text side's deepstack injection into the first layers."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Qwen3VLForConditionalGeneration"],
    bos_token_id=1, eos_token_id=2, vocab_size=512,
    text_config=dict(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        max_position_embeddings=4096, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, head_dim=32, hidden_act="silu",
    ),
    vision_config=dict(
        depth=3, hidden_size=32, num_heads=2, intermediate_size=64,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=128, num_position_embeddings=16,
        deepstack_visual_indexes=[1],
    ),
    torch_dtype="bfloat16",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("q3vl"))
    write_synth_dense_for_arch(d, CFG, seed=23)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    return config, text, vision


def test_tower_deepstack_shapes(setup):
    config, text, vision = setup
    rng = np.random.default_rng(0)
    px = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)  # 4x4 patches
    e = vision.get_image_embeddings(px)
    # 4x4 patches, 2x2 merge -> 4 mm tokens at text width
    assert e.embeddings.shape == (4, 128)
    assert e.deepstack is not None and len(e.deepstack) == 1
    assert e.deepstack[0].shape == (4, 128)
    assert np.isfinite(e.embeddings).all()
    assert np.isfinite(e.deepstack[0]).all()


def test_deepstack_reaches_model(setup):
    """Same image but zeroed deepstack rows must change the output — proves
    the early-layer injection is wired, not dropped."""
    config, text, vision = setup
    rng = np.random.default_rng(1)
    px = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)

    def run(e):
        prompt = np.concatenate([
            np.array([5, 9], np.int64), e.token_ids,
            np.array([13, 7], np.int64)])
        gen = Generator(text, Cache(text, CacheSpec(layout="paged",
                                                    num_pages=8)))
        job = Job(prompt, max_new_tokens=8, embeddings=[e])
        gen.enqueue(job)
        while gen.num_remaining_jobs():
            gen.iterate()
        return job.new_tokens

    e1 = vision.get_image_embeddings(px)
    out1 = run(e1)
    out1_again = run(vision.get_image_embeddings(px))
    assert out1 == out1_again

    e2 = vision.get_image_embeddings(px)
    e2.deepstack = [np.zeros_like(d) for d in e2.deepstack]
    out2 = run(e2)
    assert out1 != out2
