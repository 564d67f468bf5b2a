"""Budgeted bit allocator (reference conversion/allocation.py:31-156):
fractional budgets, end-layer promotion order, --hq clamps, aux targets."""
from exllamav3_tpu.conversion.allocation import QGroup, create_q_strategy


def _mk_groups(layers=8, numel=1000):
    gs = []
    for i in range(layers):
        gs.append(QGroup(key=f"model.layers.{i}.self_attn", linears=[],
                         numel=numel))
        gs.append(QGroup(key=f"model.layers.{i}.mlp.down_proj", linears=[],
                         numel=2 * numel))
    gs.append(QGroup(key="lm_head", linears=[], numel=4 * numel))
    return gs


def test_fractional_budget_hits_target():
    for bpw in (2.25, 3.0, 3.5, 4.75, 5.9):
        gs = _mk_groups()
        achieved = create_q_strategy(gs, bpw, head_bits=6)
        body = [g for g in gs if not g.is_head]
        total = sum(g.K * g.numel for g in body)
        numel = sum(g.numel for g in body)
        # never exceeds the budget; lands within one whole-group bump of it
        assert total <= bpw * numel + 1e-6
        assert achieved >= bpw - (2 * 1000 * 8) / numel
        assert abs(achieved - total / numel) < 1e-9


def test_monotone_in_bpw():
    prev = None
    for bpw in [2.0 + 0.25 * i for i in range(17)]:  # 2.0 .. 6.0
        gs = _mk_groups()
        create_q_strategy(gs, bpw, head_bits=6)
        ks = {g.key: g.K for g in gs}
        if prev is not None:
            assert all(ks[k] >= prev[k] for k in ks), (bpw, ks, prev)
        prev = ks


def test_end_layers_promoted_first():
    gs = _mk_groups(layers=9)
    create_q_strategy(gs, 4.34, head_bits=6)
    k = {g.key: g.K for g in gs}
    # the fractional budget lands on the ends before the middle
    assert k["model.layers.0.mlp.down_proj"] == 5
    assert k["model.layers.8.mlp.down_proj"] == 5
    assert k["model.layers.4.mlp.down_proj"] == 4


def test_hq_clamps_sensitive_groups():
    gs = _mk_groups(layers=4)
    create_q_strategy(gs, 3.0, head_bits=6, hq=True)
    for g in gs:
        if g.is_head:
            assert g.K == 6
        elif "down_proj" in g.key:
            assert g.K >= 4  # base 3 + hq boost
        else:
            assert g.K >= 3


def test_aux_targets():
    gs = _mk_groups(layers=2)
    gs.append(QGroup(key="model.mtp.head.linear", linears=[], numel=500))
    create_q_strategy(gs, 4.0, head_bits=8, mtp_bits=5)
    k = {g.key: g.K for g in gs}
    assert k["lm_head"] == 8
    assert k["model.mtp.head.linear"] == 5
    # aux targets sit outside the body budget
    body = [g for g in gs if not g.is_head and not g.is_mtp]
    assert sum(g.K * g.numel for g in body) <= 4.0 * sum(
        g.numel for g in body)


def test_priority_promotes_first():
    gs = [QGroup(key=f"model.layers.{i}.mlp", linears=[], numel=1000)
          for i in range(8)]
    gs[5].priority = 2
    create_q_strategy(gs, 4.13, head_bits=6)  # budget for exactly one bump
    assert gs[5].K == 5
    assert sum(g.K for g in gs) == 4 * 8 + 1
