"""Bit-width allocation across quantizable modules.

Feature reference: /root/reference/exllamav3/conversion/allocation.py
(create_q_strategy:30) — integer base bpw per qgroup, remaining fractional
budget spent one bit at a time by priority, with head_bits override for the
output layer.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class QGroup:
    key: str  # module key prefix (e.g. "model.layers.3.mlp")
    linears: list  # Linear modules in the group
    numel: int
    K: int = 4


# Qgroups quantize better when these get the extra bit first (empirically the
# down/o projections are most sensitive; mirrors the reference's priority use)
_PRIORITY_SUBSTR = ("down_proj", "o_proj", "v_proj")


def create_q_strategy(qgroups: list, bpw: float, head_bits: int = 6,
                      head_key: str = "lm_head") -> None:
    """Assign integer K per qgroup so the weighted average lands near bpw."""
    base = int(bpw)
    frac = bpw - base
    body = [g for g in qgroups if head_key not in g.key]
    for g in qgroups:
        g.K = head_bits if head_key in g.key else max(1, min(8, base))
    if frac <= 0 or not body:
        return
    budget = frac * sum(g.numel for g in body)

    def prio(g: QGroup):
        p = sum(i for i, s in enumerate(_PRIORITY_SUBSTR) if s in g.key)
        has = any(s in g.key for s in _PRIORITY_SUBSTR)
        return (0 if has else 1, p, g.numel)

    for g in sorted(body, key=prio):
        if g.K >= 8:
            continue
        if g.numel <= budget:
            g.K += 1
            budget -= g.numel
