"""Qwen2.5-VL vision tower: patching, 2D rope, window masking, merger, and
end-to-end image-conditioned generation through the text model."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Qwen2_5_VLForConditionalGeneration"],
    bos_token_id=1, eos_token_id=2, vocab_size=512, hidden_size=128,
    intermediate_size=256, max_position_embeddings=4096,
    num_attention_heads=4, num_key_value_heads=2, num_hidden_layers=2,
    rms_norm_eps=1e-5, rope_theta=10000.0, torch_dtype="bfloat16",
    head_dim=32, hidden_act="silu",
    vision_config=dict(depth=2, hidden_size=64, num_heads=4,
                       intermediate_size=128, patch_size=14,
                       temporal_patch_size=2, spatial_merge_size=2,
                       window_size=28,  # 2-patch windows
                       fullatt_block_indexes=[1], out_hidden_size=128),
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("q25vl"))
    write_synth_dense_for_arch(d, CFG, seed=29)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    return text, vision


def test_tower_shapes_and_windows(setup):
    text, vision = setup
    rng = np.random.default_rng(0)
    # 56x56 px -> 4x4 patches -> 2x2 merge -> 4 mm tokens
    px = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    e = vision.get_image_embeddings(px)
    assert e.embeddings.shape == (4, 128)
    assert np.isfinite(e.embeddings).all()

    # different image content must change the embeddings (windows/rope live)
    e2 = vision.get_image_embeddings(
        rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32))
    assert not np.allclose(e.embeddings, e2.embeddings)


def test_image_conditioned_generation(setup):
    text, vision = setup
    rng = np.random.default_rng(1)
    px = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    e = vision.get_image_embeddings(px)
    prompt = np.concatenate([np.array([5], np.int64), e.token_ids,
                             np.array([9, 13], np.int64)])
    gen = Generator(text, Cache(text, CacheSpec(layout="paged", num_pages=8)))
    job = Job(prompt, max_new_tokens=6, embeddings=[e])
    gen.enqueue(job)
    while gen.num_remaining_jobs():
        gen.iterate()
    assert len(job.new_tokens) == 6
