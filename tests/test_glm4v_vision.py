"""GLM-4V vision tower: bicubic pos-embed interpolation (torch grid_sample
parity), block-major downsample, and image-conditioned generation."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import write_synth_dense_for_arch
from exllamav3_tpu.model import Config, Model, Cache, CacheSpec
from exllamav3_tpu.generator import Generator, Job

CFG = dict(
    architectures=["Glm4vForConditionalGeneration"], bos_token_id=1,
    eos_token_id=2, vocab_size=512, hidden_size=128, intermediate_size=256,
    max_position_embeddings=4096, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, rms_norm_eps=1e-5,
    rope_theta=10000.0, torch_dtype="bfloat16", head_dim=32,
    hidden_act="silu", partial_rotary_factor=0.5,
    vision_config=dict(depth=2, hidden_size=32, num_heads=2,
                       intermediate_size=64, patch_size=4,
                       temporal_patch_size=2, spatial_merge_size=2,
                       out_hidden_size=128, image_size=32, rms_norm_eps=1e-5),
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("glm4v"))
    write_synth_dense_for_arch(d, CFG, seed=3)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    return config, text, vision


def test_bicubic_matches_torch():
    import torch
    import torch.nn.functional as F
    from exllamav3_tpu.modules.vision_glm import bicubic_taps

    rng = np.random.default_rng(0)
    side, gh, gw = 8, 5, 3
    table = rng.standard_normal((side * side, 7)).astype(np.float32)
    hc = np.repeat(np.arange(gh), gw).astype(np.float64)
    wc = np.tile(np.arange(gw), gh).astype(np.float64)
    t2d = torch.from_numpy(table.reshape(side, side, 7)) \
        .permute(2, 0, 1).unsqueeze(0)
    grid = torch.stack(
        (torch.from_numpy((wc + 0.5) / (gw / 2) - 1),
         torch.from_numpy((hc + 0.5) / (gh / 2) - 1)),
        dim=-1).unsqueeze(0).unsqueeze(2).float()
    ref = F.grid_sample(t2d, grid, mode="bicubic", align_corners=False,
                        padding_mode="border").squeeze(0).squeeze(-1).T.numpy()
    ix = (wc + 0.5) * side / gw - 0.5
    iy = (hc + 0.5) * side / gh - 0.5
    xi, xw = bicubic_taps(ix, side)
    yi, yw = bicubic_taps(iy, side)
    mine = sum(table[yi[r] * side + xi[c]] * (yw[r] * xw[c])[:, None]
               for r in range(4) for c in range(4))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_glm4v_generate_with_image(setup):
    config, text, vision = setup
    rng = np.random.default_rng(1)
    px1 = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    px2 = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)

    def run(px):
        e = vision.get_image_embeddings(px)
        assert e.embeddings.shape == (4, 128)
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

    out1 = run(px1)
    assert out1 == run(px1)
    assert out1 != run(px2)


PIXTRAL_CFG = dict(
    architectures=["Mistral3ForConditionalGeneration"], bos_token_id=1,
    eos_token_id=2,
    text_config=dict(vocab_size=512, hidden_size=128, intermediate_size=256,
                     num_attention_heads=4, num_key_value_heads=2,
                     num_hidden_layers=2, rms_norm_eps=1e-5,
                     rope_theta=10000.0, head_dim=32, hidden_act="silu"),
    vision_config=dict(num_hidden_layers=2, hidden_size=32,
                       num_attention_heads=2, intermediate_size=64,
                       patch_size=4, spatial_merge_size=2,
                       rope_theta=10000.0),
    torch_dtype="bfloat16",
)


def test_pixtral_generate_with_image(tmp_path):
    d = str(tmp_path / "pix")
    write_synth_dense_for_arch(d, PIXTRAL_CFG, seed=9)
    config = Config.from_directory(d)
    text = Model.from_config(config)
    text.load()
    vision = Model.from_config(config, component="vision")
    vision.load()
    rng = np.random.default_rng(2)
    px1 = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    px2 = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)

    def run(px):
        e = vision.get_image_embeddings(px)
        assert e.embeddings.shape == (4, 128)
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

    out1 = run(px1)
    assert out1 == run(px1)
    assert out1 != run(px2)
