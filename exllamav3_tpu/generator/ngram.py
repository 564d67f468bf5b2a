"""Suffix-automaton n-gram drafting.

Feature reference: /root/reference/exllamav3/exllamav3_ext/sam.cpp (BC_SAM)
and generator/job.py:1501-1510 — an incremental suffix automaton over the
job's token stream proposes continuations of the longest matching suffix.
Pure host-side; a C++ port can drop in behind the same interface.
"""
from __future__ import annotations


class SuffixAutomaton:
    """Online suffix automaton over a token sequence with position tracking
    (endpos sample per state) so we can look up 'what followed this context
    last time' in O(draft_len)."""

    def __init__(self):
        self.next: list[dict] = [{}]
        self.link: list[int] = [-1]
        self.length: list[int] = [0]
        self.endpos: list[int] = [-1]  # sample end position of the state
        self.last = 0
        self.tokens: list[int] = []

    def extend(self, token: int):
        t = int(token)
        self.tokens.append(t)
        pos = len(self.tokens) - 1
        cur = len(self.next)
        self.next.append({})
        self.link.append(-1)
        self.length.append(self.length[self.last] + 1)
        self.endpos.append(pos)
        p = self.last
        while p != -1 and t not in self.next[p]:
            self.next[p][t] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][t]
            if self.length[p] + 1 == self.length[q]:
                self.link[cur] = q
            else:
                clone = len(self.next)
                self.next.append(dict(self.next[q]))
                self.link.append(self.link[q])
                self.length.append(self.length[p] + 1)
                self.endpos.append(self.endpos[q])
                while p != -1 and self.next[p].get(t) == q:
                    self.next[p][t] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur

    def draft(self, max_tokens: int, min_context: int = 2) -> list[int]:
        """Propose a continuation: find the state reached by the full current
        suffix (the 'last' state tracks it), jump to its earlier occurrence,
        and copy what followed."""
        if len(self.tokens) < min_context + 1:
            return []
        # walk suffix links until the state has an end position strictly
        # before the current end (i.e. the suffix occurred before)
        s = self.link[self.last]
        n = len(self.tokens)
        while s > 0:
            ep = self.endpos[s]
            if self.length[s] >= min_context and ep < n - 1:
                start = ep + 1
                return self.tokens[start : start + max_tokens]
            s = self.link[s]
        return []
