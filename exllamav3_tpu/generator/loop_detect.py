"""Streaming loop (repetition-period) detector.

Feature reference: /root/reference/exllamav3/generator/loop_detect.py
(LoopDetector:4 — flat-latency period detection over a trailing token
window). Re-derived: maintain a trailing window; after each token, check
whether the tail consists of >= min_repeats copies of a period <= max_period.
"""
from __future__ import annotations


class LoopDetector:
    def __init__(self, max_period: int = 64, min_repeats: int = 3,
                 window: int = 512, min_loop_tokens: int = 24):
        self.max_period = max_period
        self.min_repeats = min_repeats
        self.window = window
        self.min_loop_tokens = min_loop_tokens
        self.tokens: list[int] = []

    def feed(self, token: int) -> bool:
        """Feed one token; returns True when a loop is detected."""
        self.tokens.append(int(token))
        if len(self.tokens) > self.window:
            self.tokens = self.tokens[-self.window:]
        n = len(self.tokens)
        for period in range(1, self.max_period + 1):
            span = period * self.min_repeats
            if span > n or span < self.min_loop_tokens:
                continue
            tail = self.tokens[-span:]
            base = tail[:period]
            if all(tail[i] == base[i % period] for i in range(span)):
                return True
        return False

    def rollback(self, n: int) -> None:
        if n:
            self.tokens = self.tokens[:-n] if n < len(self.tokens) else []
