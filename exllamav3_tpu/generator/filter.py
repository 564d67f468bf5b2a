"""Constrained decoding filters.

Feature reference: /root/reference/exllamav3/generator/filter/filter.py
(Filter with trigger activation, prefix strings, journaled feed/rewind
:50-160), formatron.py and llguidance.py engine adapters, and the
background-thread mask evaluation the generator drives.

Design: the base Filter carries the full journal/trigger machinery; engine
subclasses implement five hooks — reset / accept_token / next_mask /
completed / (optional native) rollback_tokens. Rewind past a trigger or
without native rollback replays the journal from the initial state, so ANY
engine becomes rewindable (banned strings, token healing) for free.

Masks are additive logit biases (0 = allowed, -inf = banned) applied inside
the fused batch sampler (batch_sampler.py filter_mask), matching the
reference's logit-bitmask mechanism. Mask computation can run on a worker
thread between decode steps: the generator calls prefetch_mask() right
after feeding a token and allowed_mask() consumes the future at the next
sampling step; feed/rollback invalidate any pending prefetch.
"""
from __future__ import annotations

import numpy as np

NEG_INF = -1e30

# journal entry types (reference filter.py FJ_*): PASS = token through an
# inactive filter, TRIGGER = (re)activation, ACCEPT = consumed by the state
# machine, COMPLETE = consumed and reached the end state
FJ_PASS = 0
FJ_TRIGGER = 1
FJ_ACCEPT = 2
FJ_COMPLETE = 3

_MASK_POOL = None


def _mask_pool():
    global _MASK_POOL
    if _MASK_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _MASK_POOL = ThreadPoolExecutor(max_workers=2,
                                        thread_name_prefix="exl3-filter")
    return _MASK_POOL


class Filter:
    """One constraint attached to a job.

    Generator-facing API: begin(tokenizer), feed(token) -> finished?,
    rollback(n), allowed_mask(vocab) -> (V,) f32 | None, is_complete(),
    prefetch_mask(vocab).

    Engine hooks to implement: reset(), accept_token(t), next_mask(vocab),
    completed(); optionally rollback_tokens(n) -> bool for native rewind.
    """

    def __init__(self, trigger_token: int | None = None,
                 prefix_str: str | None = None,
                 eos_after_completed: bool = False):
        self.trigger_token = trigger_token
        self.prefix_str = prefix_str
        self.eos_after_completed = eos_after_completed
        self.is_active = trigger_token is None
        self._journal: list = []
        self._future = None

    # -- engine hooks ---------------------------------------------------------

    def reset(self) -> None:
        pass

    def accept_token(self, token: int) -> None:
        pass

    def next_mask(self, vocab_size: int) -> np.ndarray | None:
        return None

    def completed(self) -> bool:
        return False

    def rollback_tokens(self, n: int) -> bool:
        """Native state-machine rollback; False -> journal replay instead."""
        return False

    def use_background_worker(self) -> bool:
        return True

    # -- generator-facing -----------------------------------------------------

    def begin(self, tokenizer) -> None:
        self._journal.clear()
        self.is_active = self.trigger_token is None
        self.reset()
        if self.prefix_str and self.is_active:
            self._accept_prefix(self.prefix_str, tokenizer)

    def _accept_prefix(self, text: str, tokenizer) -> None:
        """Feed the prefix string through the engine without journaling
        (it is part of the initial state; reference prefix_str semantics)."""
        if tokenizer is None:
            return
        for t in np.asarray(tokenizer.encode(text)).reshape(-1):
            self.accept_token(int(t))

    def feed(self, token: int) -> bool:
        """Advance on an emitted token; returns True when the filter
        completed on this token AND eos_after_completed is set."""
        self._invalidate()
        if not self.is_active:
            if token == self.trigger_token:
                self.is_active = True
                self.reset()
                self._journal.append((FJ_TRIGGER, token))
            else:
                self._journal.append((FJ_PASS, token))
            return False
        self.accept_token(token)
        if self.completed():
            self.is_active = False
            self._journal.append((FJ_COMPLETE, token))
            return self.eos_after_completed
        self._journal.append((FJ_ACCEPT, token))
        return False

    def rollback(self, n: int) -> None:
        """Rewind the last n fed tokens (banned-string rewinds, SD
        rejection). Uses native rollback when offered, else replays the
        journal."""
        if n == 0:
            return
        self._invalidate()
        n = min(n, len(self._journal))
        popped = self._journal[-n:]
        del self._journal[-n:]
        if any(e == FJ_TRIGGER for e, _ in popped):
            self._rebuild()
            return
        n_acc = sum(1 for e, _ in popped if e in (FJ_ACCEPT, FJ_COMPLETE))
        if any(e == FJ_COMPLETE for e, _ in popped):
            self.is_active = True
        if n_acc and not self.rollback_tokens(n_acc):
            self._rebuild()

    def _rebuild(self) -> None:
        self.is_active = self.trigger_token is None
        self.reset()
        for e, token in self._journal:
            if e == FJ_TRIGGER:
                self.is_active = True
                self.reset()
            elif e in (FJ_ACCEPT, FJ_COMPLETE):
                self.accept_token(token)
                if e == FJ_COMPLETE:
                    self.is_active = False

    def is_complete(self) -> bool:
        return (not self.is_active and any(
            e == FJ_COMPLETE for e, _ in self._journal[-1:])) or (
            self.is_active and self.completed())

    # -- masks (sync + prefetched) --------------------------------------------

    def prefetch_mask(self, vocab_size: int) -> None:
        """Start computing the next step's mask on the worker pool (masks
        for step n+1 evaluate while the host streams/schedules; reference
        filter background-thread evaluation)."""
        if not self.is_active or not self.use_background_worker():
            return
        self._future = _mask_pool().submit(self.next_mask, vocab_size)

    def _invalidate(self) -> None:
        if self._future is not None:
            f, self._future = self._future, None
            if not f.cancel():
                # already running on the worker: wait it out so feed()/
                # rollback() never mutate the engine while a mask
                # computation is mid-flight (the result is discarded)
                try:
                    f.result()
                except Exception:
                    pass

    def allowed_mask(self, vocab_size: int) -> np.ndarray | None:
        if not self.is_active:
            return None
        if self._future is not None:
            f, self._future = self._future, None
            if not f.cancelled():
                return f.result()
        return self.next_mask(vocab_size)


class AllowedTokensFilter(Filter):
    """Constrain every step to a fixed token set."""

    def __init__(self, tokens, **kw):
        super().__init__(**kw)
        self.tokens = np.asarray(sorted(set(int(t) for t in tokens)),
                                 dtype=np.int64)
        self._done = False

    def reset(self) -> None:
        self._done = False

    def next_mask(self, vocab_size: int) -> np.ndarray:
        m = np.full(vocab_size, NEG_INF, dtype=np.float32)
        m[self.tokens[self.tokens < vocab_size]] = 0.0
        return m

    def use_background_worker(self) -> bool:
        return False  # trivial mask, not worth a thread hop


class ChoiceFilter(Filter):
    """Constrain the output to be exactly one of the given strings.

    Host-side text-prefix matching over vocab piece strings (the way engine-
    less constrained decoding has to work); piece table built once per
    tokenizer.
    """

    def __init__(self, choices: list, eos_after_completed: bool = True, **kw):
        super().__init__(eos_after_completed=eos_after_completed, **kw)
        assert choices
        self.choices = list(choices)
        self.text = ""
        self.history: list[str] = []
        self._pieces: list | None = None

    def begin(self, tokenizer) -> None:
        if self._pieces is None and tokenizer is not None:
            if hasattr(tokenizer, "get_id_to_piece_list"):
                self._pieces = tokenizer.get_id_to_piece_list()
            else:  # minimal tokenizer stub: per-token decode
                self._pieces = [tokenizer.decode([t])
                                for t in range(tokenizer.vocab_size)]
        super().begin(tokenizer)

    def reset(self) -> None:
        self.text = ""
        self.history = []

    def accept_token(self, token: int) -> None:
        piece = self._pieces[token] if self._pieces else ""
        self.history.append(piece)
        self.text += piece

    def rollback_tokens(self, n: int) -> bool:
        for _ in range(min(n, len(self.history))):
            piece = self.history.pop()
            self.text = self.text[: len(self.text) - len(piece)]
        return True

    def next_mask(self, vocab_size: int) -> np.ndarray | None:
        if self._pieces is None:
            return None
        m = np.full(vocab_size, NEG_INF, dtype=np.float32)
        live = [c for c in self.choices
                if c.startswith(self.text) and c != self.text]
        for t, piece in enumerate(self._pieces[:vocab_size]):
            if not piece:
                continue
            cand = self.text + piece
            for c in live:
                if c.startswith(cand):
                    m[t] = 0.0
                    break
        return m

    def completed(self) -> bool:
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
                 _engine=None, **kw):
        kw.setdefault("eos_after_completed", True)
        super().__init__(**kw)
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

    def reset(self) -> None:
        if self._consumed:
            self._matcher.rollback(self._consumed)
            self._consumed = 0

    def accept_token(self, token: int) -> None:
        if self._matcher.is_stopped():
            return
        if self._matcher.consume_token(int(token)):
            self._consumed += 1

    def rollback_tokens(self, n: int) -> bool:
        n = min(n, self._consumed)
        if n:
            self._matcher.rollback(n)
            self._consumed -= n
        return True

    def next_mask(self, vocab_size: int) -> np.ndarray:
        nwords = (vocab_size + 31) // 32
        bm = np.empty((nwords,), dtype=np.int32)
        self._matcher.unsafe_compute_mask_ptr(bm.ctypes.data, bm.nbytes)
        bits = ((bm[:, None].astype(np.uint32)
                 >> np.arange(32, dtype=np.uint32)[None, :]) & 1) \
            .reshape(-1)[:vocab_size]
        mask = np.where(bits.astype(bool), 0.0, NEG_INF).astype(np.float32)
        return mask

    def completed(self) -> bool:
        return bool(self._matcher.is_stopped())


class FormatronFilter(Filter):
    """Formatron-backed constraint (reference generator/filter/formatron.py
    FormatronFilter:66): a FormatterBuilder compiled against a kbnf
    vocabulary built from the tokenizer's raw piece dict. Optional
    dependency, import-gated like the reference (including its
    pydantic-compat shim); `_formatter` is injectable for testing."""

    def __init__(self, tokenizer=None, formatter_builder=None,
                 vocab_processors=None, _formatter=None, **kw):
        kw.setdefault("eos_after_completed", True)
        super().__init__(**kw)
        self._tokenizer = tokenizer
        self._f = _formatter
        if _formatter is None:
            self._f = self._build(formatter_builder, vocab_processors)

    def _build(self, builder, vocab_processors):
        if not _load_formatron():  # pragma: no cover
            raise ImportError("FormatronFilter requires the optional "
                              "`formatron` + `kbnf` packages")
        assert builder is not None, "formatter_builder required"
        vocab = _formatron_vocabulary(self._tokenizer, vocab_processors)
        return builder.build(
            vocab, lambda tokens: self._tokenizer.hf.decode(tokens))

    def reset(self) -> None:
        self._f.reset()

    def accept_token(self, token: int) -> None:
        if self._f.is_completed():
            return
        self._f.accept_token(int(token))

    def next_mask(self, vocab_size: int) -> np.ndarray:
        self._f.compute_allowed_tokens()
        ids = self._f.get_allowed_tokens_since_last_computation()
        m = np.full(vocab_size, NEG_INF, dtype=np.float32)
        idx = np.asarray(list(ids), dtype=np.int64)
        m[idx[idx < vocab_size]] = 0.0
        return m

    def completed(self) -> bool:
        return bool(self._f.is_completed())


_formatron_state: dict = {}


def _load_formatron() -> bool:
    """Deferred optional import with the reference's pydantic 2.12 compat
    shim (formatron references removed pydantic.typing names)."""
    if "ok" in _formatron_state:
        return _formatron_state["ok"]
    try:
        import typing as _typing
        import pydantic.typing as _pt

        for name in ("Any", "Literal", "Mapping", "Type", "Union",
                     "get_args", "get_origin"):
            if name not in vars(_pt):
                setattr(_pt, name, getattr(_typing, name))
    except Exception:
        pass
    try:
        import kbnf
        from formatron.formatter import FormatterBuilder  # noqa: F401
        from formatron.integrations.utils import get_original_characters  # noqa: F401

        _formatron_state.update(ok=True, kbnf=kbnf)
    except Exception:
        _formatron_state["ok"] = False
    return _formatron_state["ok"]


def _formatron_vocabulary(tokenizer, vocab_processors):
    from formatron.integrations.utils import get_original_characters

    kbnf = _formatron_state["kbnf"]
    vocab = tokenizer.get_vocab_dict()
    chars = get_original_characters(vocab, vocab_processors)
    return kbnf.Vocabulary(
        {k: kbnf.Token(v) for k, v in chars.items()},
        {v: k for k, v in vocab.items()})
