"""Bit-width allocation across quantizable modules.

Feature reference: /root/reference/exllamav3/conversion/allocation.py
(create_q_strategy:31-156) — budgeted per-bit spending: every qgroup starts
at floor(bpw); the remaining fractional budget is spent ONE BIT AT A TIME in
promotion order (group priority first, then distance to the nearer end of
the forward pass — end layers contribute disproportionately to end-to-end
error), in repeated passes until the budget can't afford another whole-group
bump. `--hq` clamps selected groups to a minimum above base; head/MTP
modules carry fixed auxiliary bit targets outside the budget.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class QGroup:
    key: str  # module key prefix (e.g. "model.layers.3.mlp")
    linears: list  # Linear modules in the group
    numel: int
    K: int = 4
    priority: int = 0       # higher promotes earlier (reference q_priority)
    hq_bits: int = 0        # --hq minimum boost over base for this group
    is_head: bool = False   # fixed head_bits target, outside the budget
    is_mtp: bool = False    # fixed mtp_bits target, outside the budget


# groups whose quantization error propagates widest get --hq boosts and
# early promotion (reference architectures set select_hq_bits/q_priority on
# down/o/v projections; here the group key carries the signal)
_HQ_SUBSTR = ("down_proj", "o_proj", "v_proj", "wo_b", "shared_expert")


def _layer_of(key: str) -> int:
    m = re.search(r"\.(\d+)\.", key)
    return int(m.group(1)) if m else -1


def _stack_of(key: str) -> str | None:
    m = re.search(r"\.(\d+)\.", key)
    return key[: m.start()] if m else None


def create_q_strategy(
    qgroups: list,
    bpw: float,
    head_bits: int = 6,
    head_key: str = "lm_head",
    mtp_bits: int | None = None,
    mtp_key: str = "mtp",
    hq: bool = False,
) -> float:
    """Assign integer K per qgroup; returns the achieved body bpw.

    Matches the reference algorithm (allocation.py:110-148): base =
    floor(bpw), budget = bpw * total body numel, promote whole groups in
    passes ordered by (-priority, end-distance, layer, index), then apply
    the --hq minimum clamp.
    """
    import math

    base = max(1, min(8, int(math.floor(bpw))))

    body: list[QGroup] = []
    for g in qgroups:
        if g.is_head or head_key in g.key:
            g.is_head = True
            g.K = head_bits
        elif g.is_mtp or (mtp_bits is not None and mtp_key in g.key):
            g.is_mtp = True
            g.K = mtp_bits if mtp_bits is not None else base
        else:
            g.K = base
            if hq and not g.hq_bits and any(s in g.key for s in _HQ_SUBSTR):
                g.hq_bits = 1
            body.append(g)
    if not body:
        return 0.0

    sum_numel = sum(g.numel for g in body)
    sum_bits = base * sum_numel
    max_bits = int(bpw * float(sum_numel))

    # promotion order: priority desc, then distance to the nearer end of the
    # layer stack, then layer, then original index
    stack_max: dict[str, int] = {}
    for g in body:
        s = _stack_of(g.key)
        if s is not None:
            stack_max[s] = max(stack_max.get(s, -1), _layer_of(g.key))

    def order_key(pair):
        idx, g = pair
        s = _stack_of(g.key)
        layer = _layer_of(g.key)
        dist = 0 if s is None else min(layer, stack_max[s] - layer)
        return (-g.priority, dist, layer, idx)

    order = [g for _, g in sorted(enumerate(body), key=order_key)]

    # spend the fractional budget one whole-group bit at a time, in passes
    while sum_bits < max_bits:
        updates = False
        for g in order:
            cost = (min(8, g.K + 1) - g.K) * g.numel
            if cost > 0 and sum_bits + cost <= max_bits:
                g.K += 1
                sum_bits += cost
                updates = True
        if not updates:
            break

    if hq:
        for g in body:
            g.K = max(g.K, min(8, base + g.hq_bits))

    final_bits = sum(g.K * g.numel for g in body)
    return final_bits / sum_numel
