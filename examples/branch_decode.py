#!/usr/bin/env python
"""Interactive branch decoding (feature reference: /root/reference/examples/
branch_decode.py — a FastAPI tree-exploration UI; this environment ships no
fastapi, so this is the console edition of the same idea).

The session holds a committed token prefix in a linear cache. At each step
the model proposes the top-N continuations with their probabilities; you
pick one (or type text to inject), the branch extends by a short greedy
burst, and `u` rewinds the last commit — the cache is simply re-trusted up
to the previous length, no recompute of the shared prefix.

    python examples/branch_decode.py -m <model_dir> [--mode int8] [--topn 5]
    python examples/branch_decode.py -m <model_dir> --script   # non-interactive demo
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


class BranchSession:
    """Committed token list + linear cache trusted up to cache_len."""

    def __init__(self, model, tokenizer=None, max_len: int = 4096):
        from exllamav3_tpu.model import Cache, CacheSpec

        self.model = model
        self.tokenizer = tokenizer
        self.cache = Cache(model, CacheSpec(layout="linear", batch_size=1,
                                            max_len=max_len))
        self.tokens: list[int] = []
        self.cache_len = 0
        self.history: list[int] = []  # commit lengths, for undo
        self.last_logits = None

    def _forward_from(self, start: int):
        """Run tokens[start:] through the model, updating the cache."""
        import jax.numpy as jnp

        ids = np.asarray(self.tokens[start:], np.int32)[None, :]
        pos = np.arange(start, start + ids.shape[1], dtype=np.int32)[None, :]
        step = self.model.jitted_step("dense", donate_cache=False)
        logits, self.cache.state = step(
            self.model.params, jnp.asarray(ids), self.cache.state,
            jnp.asarray(pos), jnp.full(1, start, np.int32), None)
        self.cache_len = len(self.tokens)
        self.last_logits = np.asarray(logits[0, -1], np.float32)

    def commit(self, new_tokens: list[int]):
        self.history.append(len(self.tokens))
        start = self.cache_len
        self.tokens.extend(int(t) for t in new_tokens)
        self._forward_from(start)

    def undo(self) -> bool:
        if not self.history:
            return False
        n = self.history.pop()
        self.tokens = self.tokens[:n]
        # the cache beyond n is stale but untrusted; recompute the last
        # position's logits by re-running the final token
        if n == 0:
            self.cache_len = 0
            self.last_logits = None
            return True
        self.cache_len = n - 1
        self._forward_from(n - 1)
        return True

    def top_branches(self, topn: int):
        l = self.last_logits
        p = np.exp(l - l.max())
        p /= p.sum()
        idx = np.argsort(-p)[:topn]
        return [(int(i), float(p[i])) for i in idx]

    def greedy_burst(self, first: int, n: int) -> list[int]:
        out = [first]
        self.commit([first])
        for _ in range(n - 1):
            t = int(np.argmax(self.last_logits))
            out.append(t)
            self.commit([t])
        # collapse the burst into one undo step
        for _ in range(n - 1 if n > 1 else 0):
            self.history.pop()
        return out

    def text(self, ids) -> str:
        if self.tokenizer is None:
            return " ".join(str(i) for i in ids)
        return self.tokenizer.decode(list(ids))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mode", default="auto")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--topn", type=int, default=5)
    ap.add_argument("--burst", type=int, default=8,
                    help="greedy tokens appended after each pick")
    ap.add_argument("--script", action="store_true",
                    help="non-interactive: explore two branches and exit")
    args = ap.parse_args()

    from exllamav3_tpu.model import Config, Model, InferParams
    from exllamav3_tpu.tokenizer import Tokenizer

    model = Model.from_config(Config.from_directory(
        args.model, infer_params=InferParams(linear_mode=args.mode)))
    model.load()
    tokenizer = None
    try:
        tokenizer = Tokenizer(args.model)
    except Exception:
        print("(no tokenizer: raw token-id mode)")

    sess = BranchSession(model, tokenizer)
    if tokenizer is not None:
        prompt_ids = tokenizer.encode(args.prompt, add_bos=True).reshape(-1)
    else:
        prompt_ids = np.arange(1, 9)
    sess.commit(list(prompt_ids))
    print(f"prompt: {sess.text(sess.tokens)!r}")

    if args.script:
        branches = sess.top_branches(2)
        for tid, prob in branches:
            burst = sess.greedy_burst(tid, args.burst)
            print(f"branch p={prob:.3f}: ...{sess.text(burst)!r}")
            sess.undo()
        print(f"after undo x2, committed length {len(sess.tokens)} "
              f"== prompt length {len(prompt_ids)}")
        return

    while True:
        print("\ntop continuations:")
        branches = sess.top_branches(args.topn)
        for i, (tid, prob) in enumerate(branches):
            print(f"  [{i}] p={prob:.3f}  {sess.text([tid])!r}")
        cmd = input("pick 0-N, (u)ndo, text to inject, (q)uit > ").strip()
        if cmd == "q":
            break
        if cmd == "u":
            print("undone" if sess.undo() else "nothing to undo")
            continue
        if cmd.isdigit() and int(cmd) < len(branches):
            burst = sess.greedy_burst(branches[int(cmd)][0], args.burst)
            print(f"... {sess.text(burst)!r}")
        elif cmd and tokenizer is not None:
            sess.commit(list(tokenizer.encode(cmd).reshape(-1)))
            print(f"injected; context now {len(sess.tokens)} tokens")
        print(f"context: ...{sess.text(sess.tokens[-24:])!r}")


if __name__ == "__main__":
    main()
