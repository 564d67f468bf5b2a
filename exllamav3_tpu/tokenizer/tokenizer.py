"""Tokenizer: HF `tokenizers` wrapper with special-token handling, streaming
decode support, prefix lookup for token healing, and chat-template rendering.

Feature reference: /root/reference/exllamav3/tokenizer/tokenizer.py
(Tokenizer:16, chat templates :680-805).
"""
from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np


class Tokenizer:
    def __init__(self, directory: str):
        from tokenizers import Tokenizer as HFTokenizer

        self.directory = directory
        self.hf = HFTokenizer.from_file(os.path.join(directory, "tokenizer.json"))

        self.tokenizer_config = {}
        tc_path = os.path.join(directory, "tokenizer_config.json")
        if os.path.exists(tc_path):
            with open(tc_path) as f:
                self.tokenizer_config = json.load(f)

        gc_path = os.path.join(directory, "generation_config.json")
        self.generation_config = {}
        if os.path.exists(gc_path):
            with open(gc_path) as f:
                self.generation_config = json.load(f)

        cfg_path = os.path.join(directory, "config.json")
        self.model_config = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                self.model_config = json.load(f)

        self.bos_token_id = self._special_id("bos_token")
        self.eos_token_id = self._special_id("eos_token")
        self.pad_token_id = self._special_id("pad_token")
        if self.eos_token_id is None:
            eos = self.model_config.get("eos_token_id")
            self.eos_token_id = eos[0] if isinstance(eos, list) else eos

        self._vocab = None
        self._id_to_piece = None
        self._special_map = None

    @staticmethod
    def from_config(config) -> "Tokenizer":
        return Tokenizer(config.directory)

    def _special_id(self, name: str):
        tok = self.tokenizer_config.get(name)
        if tok is None:
            return None
        if isinstance(tok, dict):
            tok = tok.get("content")
        tid = self.hf.token_to_id(tok) if tok else None
        return tid

    # -- encode / decode ------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return self.hf.get_vocab_size()

    def _specials(self) -> dict:
        """Special/added token string -> id (reference tokenizer.py
        encode_special_tokens: literal special-token strings in the prompt
        encode to their single ids)."""
        if self._special_map is None:
            m = {}
            try:
                for tid, tok in sorted(
                        self.hf.get_added_tokens_decoder().items()):
                    m[tok.content] = tid
            except AttributeError:
                pass
            for name in ("bos_token", "eos_token", "pad_token", "unk_token"):
                tok = self.tokenizer_config.get(name)
                if isinstance(tok, dict):
                    tok = tok.get("content")
                if tok:
                    tid = self.hf.token_to_id(tok)
                    if tid is not None:
                        m[tok] = tid
            self._special_map = m
        return self._special_map

    def encode(self, text: str, add_bos: bool = False, add_eos: bool = False,
               encode_special_tokens: bool = True) -> np.ndarray:
        if encode_special_tokens and self._specials():
            import re

            sp = self._specials()
            pat = "(" + "|".join(
                re.escape(t) for t in
                sorted(sp, key=len, reverse=True)) + ")"
            ids = []
            for part in re.split(pat, text):
                if not part:
                    continue
                if part in sp:
                    ids.append(sp[part])
                else:
                    ids.extend(self.hf.encode(
                        part, add_special_tokens=False).ids)
        else:
            ids = list(self.hf.encode(text, add_special_tokens=False).ids)
        if add_bos and self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        if add_eos and self.eos_token_id is not None:
            ids = ids + [self.eos_token_id]
        return np.array([ids], dtype=np.int64)

    def decode(self, ids, decode_special_tokens: bool = False) -> str:
        arr = np.asarray(ids).reshape(-1).tolist()
        return self.hf.decode(arr, skip_special_tokens=not decode_special_tokens)

    def single_token(self, token_id: int) -> np.ndarray:
        return np.array([[token_id]], dtype=np.int64)

    # -- vocab utilities -------------------------------------------------------

    def get_vocab(self) -> dict:
        if self._vocab is None:
            self._vocab = self.hf.get_vocab()
        return self._vocab

    def id_to_piece(self, tid: int) -> str:
        if self._id_to_piece is None:
            self._id_to_piece = {v: k for k, v in self.get_vocab().items()}
        return self._id_to_piece.get(tid, "")

    def single_id(self, token: str) -> int | None:
        """Id of a single (special) token string, None when absent
        (reference tokenizer.py single_id:240)."""
        return self.hf.token_to_id(token)

    def num_tokens(self, text: str) -> int:
        return len(self.hf.encode(text, add_special_tokens=False).ids)

    def get_id_to_piece_list(self) -> list:
        """Decoded TEXT of every token id, computed once in one batch decode
        (reference tokenizer.py _get_fixed_vocab:578 — a probe decides
        whether pieces decode standalone or need a space-prefix anchor to
        preserve leading-space bytes)."""
        if getattr(self, "_piece_list", None) is not None:
            return self._piece_list
        n = self.vocab_size
        test = self.hf.encode(" t", add_special_tokens=False).ids
        standalone = (len(test) == 1
                      and len(self.hf.decode([test[0]],
                                             skip_special_tokens=False)) == 2)
        if standalone:
            pieces = self.hf.decode_batch([[i] for i in range(n)],
                                          skip_special_tokens=False)
        else:
            sp = self.hf.encode(" ", add_special_tokens=False).ids
            anchor = sp[0] if sp else None
            if anchor is None:
                pieces = self.hf.decode_batch([[i] for i in range(n)],
                                              skip_special_tokens=False)
            else:
                plen = len(self.hf.decode([anchor],
                                          skip_special_tokens=False))
                pieces = self.hf.decode_batch(
                    [[anchor, i] for i in range(n)],
                    skip_special_tokens=False)
                pieces = [p[plen:] for p in pieces]
        self._piece_list = pieces
        return pieces

    def get_piece_to_id_dict(self) -> dict:
        if getattr(self, "_piece_to_id", None) is None:
            self._piece_to_id = {p: i for i, p in
                                 enumerate(self.get_id_to_piece_list())}
        return self._piece_to_id

    def get_vocab_dict(self) -> dict:
        """Raw piece-string -> id over the full vocab (Formatron wants the
        tokenizer-internal pieces, not decoded text; reference
        tokenizer.py:669)."""
        if getattr(self, "_vocab_dict", None) is None:
            self._vocab_dict = {
                self.hf.id_to_token(i) or f"<undef_{i}>": i
                for i in range(self.vocab_size)}
        return self._vocab_dict

    def get_id_to_ord_list(self) -> list:
        """Byte ordinal of each single-byte token, -1 for multi-byte pieces
        (reference tokenizer.py:538 — stop-string/filter machinery)."""
        if getattr(self, "_id_to_ord", None) is None:
            out = []
            for p in self.get_id_to_piece_list():
                out.append(ord(p) if len(p) == 1 and ord(p) <= 255 else -1)
            self._id_to_ord = out
        return self._id_to_ord

    def padding_mask(self, ids: np.ndarray) -> np.ndarray:
        """Additive f32 bias: -inf-like where ids == pad_token_id, 0
        elsewhere (reference tokenizer.py padding_mask:504)."""
        pad = self.pad_token_id if self.pad_token_id is not None else -1
        return np.where(np.asarray(ids) == pad,
                        np.float32(-65505.0 * 2), np.float32(0.0))

    @lru_cache(maxsize=1000)
    def get_tokens_with_prefix_string(self, prefix: str) -> tuple:
        """Token ids whose decoded text starts with `prefix` — one pass over
        the cached piece list (the O(vocab)-decodes-per-call scan is gone;
        reference tokenizer.py:651)."""
        pieces = self.get_id_to_piece_list()
        return tuple(i for i, p in enumerate(pieces) if p.startswith(prefix))

    @lru_cache(maxsize=1000)
    def get_tokens_with_prefix_id(self, prefix_id: int) -> tuple:
        return self.get_tokens_with_prefix_string(
            self.get_id_to_piece_list()[prefix_id])

    def prefix_token_ids(self, prefix: str) -> tuple:
        """Token healing entry point (kept name)."""
        return self.get_tokens_with_prefix_string(prefix)

    # -- chat templates ----------------------------------------------------------

    def render_chat(self, messages: list, add_generation_prompt: bool = True,
                    template: str | None = None) -> str:
        import jinja2

        template = template or self.tokenizer_config.get("chat_template")
        if template is None:
            raise ValueError("tokenizer has no chat_template")
        if isinstance(template, list):
            template = template[0].get("template", template[0])
        env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
        env.globals["raise_exception"] = lambda msg: (_ for _ in ()).throw(ValueError(msg))
        tpl = env.from_string(template)
        return tpl.render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=self.tokenizer_config.get("bos_token", ""),
            eos_token=self.tokenizer_config.get("eos_token", ""),
        )
