"""Bit-allocation optimizer over a sensitivity measurement.

Feature reference: /root/reference/exllamav3/conversion/optimize_model.py
(recombine per-layer bitrates to hit a budget with minimum error). Given
measure.py output and a target average bpw, greedily upgrades the layer with
the best error-reduction per added bit until the budget is spent; emits a
strategy file ({linear_key: K}) consumed by convert_model(strategy=...).
"""
from __future__ import annotations

import json


def optimize_strategy(measurement: dict, target_bpw: float) -> dict:
    bits = sorted(int(b) for b in measurement["bits"])
    mods = measurement["modules"]
    keys = list(mods)
    total_weights = sum(mods[k]["numel"] for k in keys)
    budget_bits = target_bpw * total_weights

    alloc = {k: bits[0] for k in keys}
    spent = bits[0] * total_weights

    def gain(k):
        """Error reduction per bit for upgrading key k one step."""
        cur = alloc[k]
        idx = bits.index(cur)
        if idx + 1 >= len(bits):
            return None
        nxt = bits[idx + 1]
        e_cur = mods[k]["err"][str(cur)]
        e_nxt = mods[k]["err"][str(nxt)]
        cost = (nxt - cur) * mods[k]["numel"]
        return (e_cur - e_nxt) * mods[k]["numel"] / max(cost, 1), nxt, cost

    while True:
        best = None
        for k in keys:
            g = gain(k)
            if g is None:
                continue
            value, nxt, cost = g
            if spent + cost > budget_bits:
                continue
            if best is None or value > best[0]:
                best = (value, k, nxt, cost)
        if best is None:
            break
        _, k, nxt, cost = best
        alloc[k] = nxt
        spent += cost

    achieved = spent / total_weights
    return {"strategy": alloc, "achieved_bpw": achieved,
            "target_bpw": target_bpw}


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-i", "--measurement", default="measurement.json")
    p.add_argument("-o", "--out_file", default="strategy.json")
    p.add_argument("-b", "--bpw", type=float, required=True)
    args = p.parse_args()
    with open(args.measurement) as f:
        measurement = json.load(f)
    result = optimize_strategy(measurement, args.bpw)
    with open(args.out_file, "w") as f:
        json.dump(result, f, indent=2)
    print(f"achieved {result['achieved_bpw']:.3f} bpw "
          f"(target {args.bpw})")


if __name__ == "__main__":
    main()
