"""MRoPE 3-stream rope positions for image spans (Qwen-VL family): image
grids change the rope angles of their span; text-only prompts are exact
under the standard rope path."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job
from exllamav3_tpu.tokenizer.mm_embedding import (
    MMEmbedding, mrope_position_streams)

CFG = dict(
    architectures=["Qwen2_5_VLForConditionalGeneration"], bos_token_id=1,
    eos_token_id=2, vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu",
    rope_scaling={"type": "mrope", "mrope_section": [4, 6, 6]},
    vision_config=dict(depth=2, hidden_size=32, num_heads=2,
                       intermediate_size=64, patch_size=4,
                       temporal_patch_size=2, spatial_merge_size=2,
                       window_size=8, fullatt_block_indexes=[1],
                       out_hidden_size=128),
)


def test_mrope_streams_match_hf_semantics():
    class E:
        pass

    e = E()
    e.grid_thw = (1, 4, 4)
    e.mrope_merge_size = 2
    e.first_index = 100
    ids = np.array([7, 100, 101, 102, 103, 9])
    s, delta = mrope_position_streams(ids, [e])
    np.testing.assert_array_equal(s[:, 0], [0, 1, 1, 1, 1, 3])
    np.testing.assert_array_equal(s[:, 1], [0, 1, 1, 2, 2, 3])
    np.testing.assert_array_equal(s[:, 2], [0, 1, 2, 1, 2, 3])
    assert delta == 4 - 6


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mrope"))
    write_synth_dense_for_arch(d, CFG, seed=29)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    return config, text, vision


def test_mrope_changes_image_generation(setup):
    config, text, vision = setup
    gen_factory = lambda: Generator(
        text, Cache(text, CacheSpec(layout="paged", num_pages=8)))
    assert gen_factory().uses_mrope
    rng = np.random.default_rng(3)
    px = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)

    def run(e):
        prompt = np.concatenate([
            np.array([5, 9], np.int64), e.token_ids,
            np.array([13, 7, 21, 30], np.int64)])
        gen = gen_factory()
        job = Job(prompt, max_new_tokens=8, embeddings=[e])
        gen.enqueue(job)
        while gen.num_remaining_jobs():
            gen.iterate()
        return job.new_tokens

    e1 = vision.get_image_embeddings(px)
    assert e1.grid_thw == (1, 4, 4)
    out1 = run(e1)
    assert out1 == run(vision.get_image_embeddings(px))  # deterministic
    # stripping the grid falls back to sequential positions -> different rope
    e3 = vision.get_image_embeddings(px)
    e3.grid_thw = None
    out3 = run(e3)
    assert out1 != out3


def test_pil_preprocess_roundtrip(setup):
    """PIL image -> smart resize -> normalize -> tower -> embeddings."""
    from PIL import Image
    from exllamav3_tpu.tokenizer.image_processing import smart_resize

    config, text, vision = setup
    rng = np.random.default_rng(5)
    img = Image.fromarray(
        rng.integers(0, 255, (19, 21, 3)).astype(np.uint8))
    px = vision.preprocess(img)
    # factor = patch 4 x merge 2 = 8
    assert px.shape[0] % 8 == 0 and px.shape[1] % 8 == 0
    e = vision.get_image_embeddings_pil(img)
    assert np.isfinite(e.embeddings).all()
    assert e.embeddings.shape[1] == 128

    # HF smart_resize semantics
    assert smart_resize(224, 224, 28) == (224, 224)
    h, w = smart_resize(1000, 4000, 28, max_pixels=1280 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert h * w <= 1280 * 28 * 28
