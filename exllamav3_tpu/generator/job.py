"""Job: one generation request in the continuous-batching generator.

Feature reference: /root/reference/exllamav3/generator/job.py (Job:46 —
prompt, sampler, stop conditions, token healing, banned strings, streaming
detokenization, page allocation :1329).
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

from ..constants import PAGE_SIZE
from .sampler import Sampler, GreedySampler

_serial = itertools.count()


class Job:
    def __init__(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 256,
        sampler: Sampler | None = None,
        stop_conditions: list | None = None,
        identifier=None,
        banned_strings: list | None = None,
        return_logits: bool = False,
        return_top_logprobs: int = 0,
        seed: int | None = None,
        filters: list | None = None,
        token_healing: bool = False,
        loop_detect: bool = False,
        embeddings: list | None = None,  # MMEmbedding payloads (images etc.)
        # classifier-free guidance: mixed logits
        #   l = l_neg + cfg_scale * (l_pos - l_neg)
        # (reference job.py CFG sequence pairs)
        negative_input_ids: np.ndarray | None = None,
        cfg_scale: float | None = None,
    ):
        ids = np.asarray(input_ids).reshape(-1).astype(np.int64)
        assert ids.size > 0, "empty prompt"
        self.input_ids = ids
        self.max_new_tokens = max_new_tokens
        self.sampler = sampler or GreedySampler()
        self.identifier = identifier if identifier is not None else next(_serial)
        self.seed = seed if seed is not None else next(_serial)
        self.return_logits = return_logits

        self.filters = filters or []
        self.stop_tokens: set[int] = set()
        self.stop_strings: list[str] = []
        for sc in stop_conditions or []:
            if isinstance(sc, str):
                self.stop_strings.append(sc)
            else:
                self.stop_tokens.add(int(sc))
        self.banned_strings = banned_strings or []
        self.return_top_logprobs = return_top_logprobs
        self.token_healing = token_healing
        self.healing_prefix: str | None = None
        # banned-string rewinds: position (len(new_tokens)) -> banned token ids
        self.pos_bans: dict[int, set] = {}
        self.embeddings = embeddings or []
        if self.embeddings:
            from ..tokenizer.mm_embedding import FIRST_MM_EMBEDDING_INDEX

            assert int(ids[-1]) < FIRST_MM_EMBEDDING_INDEX, \
                "prompt must end with a text token"
        self.cfg_scale = cfg_scale
        self.negative_input_ids = None
        if cfg_scale is not None:
            assert negative_input_ids is not None, "CFG needs a negative prompt"
            self.negative_input_ids = np.asarray(
                negative_input_ids).reshape(-1).astype(np.int64)
        # negative-sequence bookkeeping (pages parallel the main sequence)
        self.pages_neg: list[int] = []
        self.prefill_done_neg = 0
        self.rq_handle = None  # recurrent-state stash handle (requeue)
        self.loop_detector = None
        if loop_detect:
            from .loop_detect import LoopDetector

            self.loop_detector = LoopDetector()

        # runtime state (owned by the generator)
        self.status = "queued"  # queued | prefill | running | finished
        self.pages: list[int] = []
        self.page_hashes: list[bytes | None] = []
        self.cached_tokens = 0
        self.prefill_done = 0  # tokens whose KV is in cache
        self.new_tokens: list[int] = []
        self.held_text = ""  # text held back for stop-string matching
        self.emitted_text = ""
        self.eos_reason: str | None = None
        self.time_enqueued = 0.0
        self.time_prefill_start = 0.0
        self.time_prefill_end = 0.0
        self.time_first_token = 0.0
        self.time_last_token = 0.0
        self.accepted_draft_tokens = 0
        self.rejected_draft_tokens = 0

    def metrics(self) -> dict:
        """Per-job serving metrics attached to the finished result event
        (reference generator.py:386-395): queue wait, prefill and generate
        durations, TTFT, draft accept/reject counts and throughputs."""
        t_gen = max(self.time_last_token - self.time_prefill_end, 0.0)
        n = len(self.new_tokens)
        return {
            "prompt_tokens": int(self.input_ids.size),
            "cached_tokens": int(self.cached_tokens),
            "generated_tokens": n,
            "time_enqueued": self.time_enqueued,
            "queued_s": max(self.time_prefill_start - self.time_enqueued, 0.0),
            "prefill_s": max(self.time_prefill_end - self.time_prefill_start,
                             0.0),
            "ttft_s": max(self.time_first_token - self.time_enqueued, 0.0),
            "generate_s": t_gen,
            "generate_tok_s": (n / t_gen) if t_gen > 0 else 0.0,
            "accepted_draft_tokens": self.accepted_draft_tokens,
            "rejected_draft_tokens": self.rejected_draft_tokens,
        }

    # -- geometry ---------------------------------------------------------

    @property
    def seq_len(self) -> int:
        return int(self.input_ids.size) + len(self.new_tokens)

    def all_ids(self) -> np.ndarray:
        if not self.new_tokens:
            return self.input_ids
        return np.concatenate([self.input_ids, np.asarray(self.new_tokens, dtype=np.int64)])

    def pages_needed(self) -> int:
        return (self.seq_len + PAGE_SIZE - 1) // PAGE_SIZE

    @property
    def seq_len_neg(self) -> int:
        return int(self.negative_input_ids.size) + len(self.new_tokens)

    def all_ids_neg(self) -> np.ndarray:
        if not self.new_tokens:
            return self.negative_input_ids
        return np.concatenate([self.negative_input_ids,
                               np.asarray(self.new_tokens, dtype=np.int64)])

    def pages_needed_neg(self) -> int:
        return (self.seq_len_neg + PAGE_SIZE - 1) // PAGE_SIZE
