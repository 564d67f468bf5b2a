"""Tokenizer parity utilities (reference tokenizer/tokenizer.py:504-677):
piece lists, prefix lookup for token healing, padding masks, ord lists."""
import numpy as np
import pytest

from exllamav3_tpu.conversion.synth import (
    write_tiny_llama_exl3, tiny_llama_cfg, write_synth_tokenizer)
from exllamav3_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tokm"))
    write_tiny_llama_exl3(d, tiny_llama_cfg(vocab_size=512), seed=3)
    write_synth_tokenizer(d)
    return Tokenizer(d)


def test_piece_list_matches_decode(tok):
    pieces = tok.get_id_to_piece_list()
    assert len(pieces) == tok.vocab_size
    for tid in (5, 40, 100, 200):
        assert pieces[tid] == tok.decode([tid], decode_special_tokens=True)


def test_prefix_lookup_fast_path(tok):
    pieces = tok.get_id_to_piece_list()
    prefix = pieces[65][:1]
    ids = tok.get_tokens_with_prefix_string(prefix)
    assert 65 in ids
    slow = tuple(i for i in range(tok.vocab_size)
                 if tok.decode([i], decode_special_tokens=True)
                 .startswith(prefix))
    assert ids == slow
    assert tok.prefix_token_ids(prefix) == ids
    assert 65 in tok.get_tokens_with_prefix_id(65)


def test_piece_to_id_and_vocab_dict(tok):
    p2i = tok.get_piece_to_id_dict()
    pieces = tok.get_id_to_piece_list()
    assert p2i[pieces[77]] == 77 or pieces[p2i[pieces[77]]] == pieces[77]
    vd = tok.get_vocab_dict()
    assert len(vd) == tok.vocab_size


def test_padding_mask(tok):
    ids = np.array([[1, 2, 3], [1, 2, 2]])
    pad = 2
    tok.pad_token_id = pad
    m = tok.padding_mask(ids)
    assert m.shape == ids.shape
    assert (m[ids == pad] < -1e4).all()
    assert (m[ids != pad] == 0).all()


def test_id_to_ord(tok):
    ords = tok.get_id_to_ord_list()
    assert len(ords) == tok.vocab_size
    pieces = tok.get_id_to_piece_list()
    for i, p in enumerate(pieces[:50]):
        if len(p) == 1 and ord(p) <= 255:
            assert ords[i] == ord(p)


def test_model_init_sampler_and_override(tmp_path):
    """CLI parity: get_arg_sampler builds the configured chain; -or YAML
    overlays another checkpoint's tensors per key glob (reference -or)."""
    import argparse
    import numpy as np
    import yaml
    from exllamav3_tpu import model_init
    from exllamav3_tpu.conversion.synth import write_tiny_llama_exl3, tiny_llama_cfg

    base, alt = str(tmp_path / "a"), str(tmp_path / "b")
    write_tiny_llama_exl3(base, tiny_llama_cfg(), K=4, seed=1)
    write_tiny_llama_exl3(alt, tiny_llama_cfg(), K=4, seed=2)
    ov = str(tmp_path / "ov.yaml")
    yaml.safe_dump({"overrides": [{"model.layers.0.*": alt}]}, open(ov, "w"))

    p = argparse.ArgumentParser()
    model_init.add_args(p)
    args = p.parse_args(["-m", base, "--linear_mode", "reconstruct",
                         "-temp", "0.7", "-topk", "40"])
    s = model_init.get_arg_sampler(args)
    assert not s.greedy and len(s.steps) >= 3
    g = model_init.get_arg_sampler(p.parse_args(["-m", base, "--greedy"]))
    assert g.greedy

    m1 = model_init.init(args, load=True)[0]
    args2 = p.parse_args(["-m", base, "--linear_mode", "reconstruct",
                          "-or", ov])
    m2 = model_init.init(args2, load=True)[0]
    ids = np.ones((1, 6), np.int32)
    l1, l2 = np.asarray(m1.forward_simple(ids)), np.asarray(m2.forward_simple(ids))
    assert not np.allclose(l1, l2)  # layer-0 tensors really were overridden
