"""Constrained decoding filters.

Feature reference: /root/reference/exllamav3/generator/filter/filter.py
(Filter ABC with feed/rollback for token healing and SD rewind :50-128) and
the llguidance/Formatron engine wrappers. Those engines aren't available in
this environment; the subsystem ships the same interface with built-in
filters (token allow-lists, choice-of-strings via vocab prefix matching), and
external engines can implement Filter to supply logit masks.

Masks are additive logit biases (0 = allowed, -inf = banned) applied inside
the fused batch sampler (batch_sampler.py filter_mask), matching the
reference's logit-bitmask mechanism (sampling kernels apply_mask).
"""
from __future__ import annotations

import numpy as np

NEG_INF = -1e30


class Filter:
    """One constraint attached to a job. The generator calls, per decoded
    token: mask = allowed_mask(); after sampling: feed(token); on
    speculative-decode rejection or token healing: rollback(n)."""

    def begin(self, tokenizer) -> None:
        pass

    def allowed_mask(self, vocab_size: int) -> np.ndarray | None:
        """(V,) f32 additive mask, or None for 'anything'."""
        return None

    def feed(self, token: int) -> None:
        pass

    def rollback(self, n: int) -> None:
        pass

    def is_complete(self) -> bool:
        return False


class AllowedTokensFilter(Filter):
    """Constrain every step to a fixed token set."""

    def __init__(self, tokens):
        self.tokens = np.asarray(sorted(set(int(t) for t in tokens)), dtype=np.int64)

    def allowed_mask(self, vocab_size: int) -> np.ndarray:
        m = np.full(vocab_size, NEG_INF, dtype=np.float32)
        m[self.tokens[self.tokens < vocab_size]] = 0.0
        return m


class ChoiceFilter(Filter):
    """Constrain the output to be exactly one of the given strings.

    Host-side text-prefix matching over vocab piece strings (the way engine-
    less constrained decoding has to work); piece table built once per
    tokenizer.
    """

    def __init__(self, choices: list):
        assert choices
        self.choices = list(choices)
        self.text = ""
        self.history: list[str] = []
        self._pieces: list | None = None
        self._tokenizer = None

    def begin(self, tokenizer) -> None:
        self._tokenizer = tokenizer
        if self._pieces is None and tokenizer is not None:
            self._pieces = [tokenizer.decode([t]) for t in range(tokenizer.vocab_size)]

    def allowed_mask(self, vocab_size: int) -> np.ndarray:
        m = np.full(vocab_size, NEG_INF, dtype=np.float32)
        if self._pieces is None:
            return None
        live = [c for c in self.choices if c.startswith(self.text) and c != self.text]
        for t, piece in enumerate(self._pieces[:vocab_size]):
            if not piece:
                continue
            cand = self.text + piece
            for c in live:
                if c.startswith(cand):
                    m[t] = 0.0
                    break
        return m

    def feed(self, token: int) -> None:
        piece = self._pieces[token] if self._pieces else ""
        self.history.append(piece)
        self.text += piece

    def rollback(self, n: int) -> None:
        for _ in range(min(n, len(self.history))):
            piece = self.history.pop()
            self.text = self.text[: len(self.text) - len(piece)]

    def is_complete(self) -> bool:
        return self.text in self.choices


class LLGuidanceFilter(Filter):
    """llguidance-backed grammar constraint (reference
    generator/filter/llguidance.py LLGuidanceFilter:33): exactly one of
    json_schema / regex / lark_grammar / gbnf_grammar / llg_grammar. The
    engine computes a packed int32 bitmask per step; it converts to the
    additive mask the fused batch sampler consumes. Requires the optional
    `llguidance` package (raises ImportError otherwise); `_engine` is
    injectable for testing."""

    def __init__(self, tokenizer=None, json_schema=None, regex=None,
                 lark_grammar=None, gbnf_grammar=None, llg_grammar=None,
                 _engine=None):
        sources = [("json_schema", json_schema), ("regex", regex),
                   ("lark", lark_grammar), ("gbnf", gbnf_grammar),
                   ("llguidance", llg_grammar)]
        given = [(f, g) for f, g in sources if g is not None]
        assert len(given) == 1, \
            "specify exactly one grammar source"
        self._spec = given[0]
        self._tokenizer = tokenizer
        self._matcher = _engine
        self._consumed = 0
        if _engine is None:
            self._matcher = self._make_matcher()

    def _make_matcher(self):
        try:
            from llguidance import LLTokenizer, LLMatcher, grammar_from
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "LLGuidanceFilter requires the optional `llguidance` "
                "package") from e
        import json as _json

        fmt, text = self._spec
        if isinstance(text, dict):
            text = _json.dumps(text)
        eos = self._tokenizer.eos_token_id if self._tokenizer else None
        llt = LLTokenizer(self._tokenizer.hf.to_str(), eos_token=eos)
        grammar = grammar_from(fmt, text)
        err = LLMatcher.validate_grammar(grammar, llt)
        if err:
            raise ValueError(f"invalid grammar: {err}")
        self._llt = llt
        return LLMatcher(llt, grammar)

    def begin(self, tokenizer) -> None:
        pass

    def allowed_mask(self, vocab_size: int) -> np.ndarray:
        nwords = (vocab_size + 31) // 32
        bm = np.empty((nwords,), dtype=np.int32)
        self._matcher.unsafe_compute_mask_ptr(bm.ctypes.data, bm.nbytes)
        bits = ((bm[:, None].astype(np.uint32)
                 >> np.arange(32, dtype=np.uint32)[None, :]) & 1) \
            .reshape(-1)[:vocab_size]
        mask = np.where(bits.astype(bool), 0.0, NEG_INF).astype(np.float32)
        return mask

    def feed(self, token: int) -> None:
        if self._matcher.is_stopped():
            return
        if self._matcher.consume_token(int(token)):
            self._consumed += 1

    def rollback(self, n: int) -> None:
        n = min(n, self._consumed)
        if n:
            self._matcher.rollback(n)
            self._consumed -= n

    def is_complete(self) -> bool:
        return bool(self._matcher.is_stopped())
