#!/usr/bin/env python
"""Compile-and-verify every Pallas kernel family on the REAL TPU.

CPU interpret mode validates semantics but NOT Mosaic layout legality — two
kernel families (the W·A8 int8-MXU matmuls and the int-B bf16 matmul) shipped
with layouts that could never compile on hardware before this gate existed.
Run after any kernel change; each check is a tiny-shape compile + numeric
comparison against the jnp reference.

    python tools/tpu_compile_check.py            # all families
    python tools/tpu_compile_check.py linear     # substring filter
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILURES = []


def check(name: str, fn, flt: str):
    if flt and flt not in name:
        return
    try:
        err = fn()
        status = "PASS" if err is None or err < 0.03 else f"NUMERIC {err:.4f}"
        if status != "PASS":
            FAILURES.append(name)
        extra = f" (rel err {err:.5f})" if err is not None else ""
        print(f"{name:28s} {status}{extra}", flush=True)
    except Exception as e:
        FAILURES.append(name)
        msg = str(e).splitlines()
        print(f"{name:28s} FAIL {msg[0][:90] if msg else type(e).__name__}",
              flush=True)
        if os.environ.get("EXL3TPU_CHECK_TRACE"):
            traceback.print_exc()


def rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))


def main():
    flt = sys.argv[1] if len(sys.argv) > 1 else ""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    k, n, m = 512, 512, 16

    # -- EXL3 fused trellis GEMM ----------------------------------------------
    def exl3_fused():
        from exllamav3_tpu.ops.exl3_gemm import exl3_matmul, prepare_trellis_words
        from exllamav3_tpu.quant.reconstruct import reconstruct_full_jnp

        K = 4
        trellis = rng.integers(-32768, 32768,
                               size=(k // 16, n // 16, 16 * K)).astype(np.int16)
        words = jnp.asarray(prepare_trellis_words(trellis))
        suh = jnp.asarray(np.sign(rng.standard_normal(k)).astype(np.float16))
        svh = jnp.asarray((np.sign(rng.standard_normal(n)) * 0.02).astype(np.float16))
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = reconstruct_full_jnp(jnp.asarray(trellis), suh, svh, K, 0,
                                 dtype=jnp.float32)
        ref = np.asarray(x.astype(jnp.float32) @ w)
        got = np.asarray(exl3_matmul(x, words, suh, svh, K, 0))  # m<=16: fused
        return rel(got, ref)

    check("linear/exl3-fused", exl3_fused, flt)

    # -- int8 / int4 / int-B matmuls ------------------------------------------
    def int8_pallas():
        from exllamav3_tpu.ops.q_matmul import int8_matmul_pallas, int8_matmul_ref

        w_q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sc = jnp.asarray(rng.uniform(0.01, 0.02, n), jnp.float32)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        return rel(int8_matmul_pallas(x, w_q, sc), int8_matmul_ref(x, w_q, sc))

    check("linear/int8-pallas", int8_pallas, flt)

    def int4_pair():
        from exllamav3_tpu.ops.q_matmul import (int4_matmul, int4_matmul_a8,
                                                int4_matmul_ref, int4_pack_jnp)

        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        packed, sc = int4_pack_jnp(jnp.asarray(w))
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        ref = int4_matmul_ref(x, packed, sc)
        e1 = rel(int4_matmul(x, packed, sc, use_pallas=True), ref)
        e2 = rel(int4_matmul_a8(x, packed, sc), ref)
        return max(e1, e2)

    check("linear/int4+a8", int4_pair, flt)

    for bits in (3, 5, 6):
        def intb_pair(bits=bits):
            from exllamav3_tpu.ops.q_matmul import (intb_matmul, intb_matmul_ref,
                                                    intb_pack_jnp)

            w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
            packed, sc = intb_pack_jnp(jnp.asarray(w), bits)
            x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            ref = intb_matmul_ref(x, packed, sc, bits)
            e1 = rel(intb_matmul(x, packed, sc, bits, use_pallas=True), ref)
            os.environ["EXL3TPU_INTB_A8"] = "1"
            try:
                e2 = rel(intb_matmul(x, packed, sc, bits), ref)
            finally:
                del os.environ["EXL3TPU_INTB_A8"]
            return max(e1, e2)

        check(f"linear/int{bits}+a8", intb_pair, flt)

    # -- fused MLP -------------------------------------------------------------
    def fused_mlp():
        from exllamav3_tpu.ops.fused_mlp import fused_mlp_int8_pallas

        h, inter = 512, 1024
        gu = rng.standard_normal((h, 2 * inter)).astype(np.float32) * 0.02
        d = rng.standard_normal((inter, h)).astype(np.float32) * 0.02
        gu_s = np.abs(gu).max(0) / 127.0
        gu_q = jnp.asarray(np.clip(np.round(gu / gu_s), -127, 127), jnp.int8)
        d_s = np.abs(d).max(0) / 127.0
        d_q = jnp.asarray(np.clip(np.round(d / d_s), -127, 127), jnp.int8)
        x = jnp.asarray(rng.standard_normal((8, h)), jnp.bfloat16)
        got = fused_mlp_int8_pallas(x, gu_q, jnp.asarray(gu_s, jnp.float32),
                                    d_q)
        # reference: dequant + silu MLP, then the caller-side d_scale
        xg = np.asarray(x, np.float32) @ (np.asarray(gu_q, np.float32) * gu_s)
        g, u = xg[:, :inter], xg[:, inter:]
        a = g / (1 + np.exp(-g)) * u
        ref = a @ np.asarray(d_q, np.float32)
        return rel(got, ref)

    check("mlp/fused-int8", fused_mlp, flt)

    # -- MoE selected experts ---------------------------------------------------
    def moe_selected():
        from exllamav3_tpu.ops.moe_gemm import selected_expert_mlp

        E, h, inter, topk, T = 8, 256, 512, 2, 4
        wg = jnp.asarray(rng.standard_normal((E, h, inter)) * 0.05, jnp.bfloat16)
        wu = jnp.asarray(rng.standard_normal((E, h, inter)) * 0.05, jnp.bfloat16)
        wd = jnp.asarray(rng.standard_normal((E, inter, h)) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((T, h)), jnp.bfloat16)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        topv, topi = jax.lax.top_k(jax.nn.softmax(logits), topk)
        got = selected_expert_mlp(x, topi, topv, wu, wd, wg=wg,
                                  activation="silu")
        xf = np.asarray(x, np.float32)
        ref = np.zeros((T, h), np.float32)
        for t in range(T):
            for j in range(topk):
                e = int(topi[t, j])
                g = xf[t] @ np.asarray(wg[e], np.float32)
                u = xf[t] @ np.asarray(wu[e], np.float32)
                a = g / (1 + np.exp(-g)) * u
                ref[t] += float(topv[t, j]) * (a @ np.asarray(wd[e], np.float32))
        return rel(got, ref)

    check("moe/selected-experts", moe_selected, flt)

    # -- flash attention family -------------------------------------------------
    def flash(k_bits, v_bits, S=1, window=0):
        from exllamav3_tpu.ops.flash_attention import flash_attention
        from exllamav3_tpu.ops.kv_quant import quantize_kv

        B, Hq, Hk, D, PS, P = 2, 8, 2, 128, 256, 4
        T = 300  # tokens cached per sequence
        kk = rng.standard_normal((B, P * PS, Hk, D)).astype(np.float32) * 0.3
        vv = rng.standard_normal((B, P * PS, Hk, D)).astype(np.float32) * 0.3
        kk[:, T:] = 0
        vv[:, T:] = 0
        q = jnp.asarray(rng.standard_normal((B, S, Hq, D)) * 0.3, jnp.bfloat16)
        pos = jnp.asarray(np.arange(T - S, T)[None, :].repeat(B, 0), jnp.int32)
        tot = jnp.full((B,), T, jnp.int32)
        bt = jnp.asarray(np.arange(B * P, dtype=np.int32).reshape(B, P))
        kp = np.zeros((B * P, PS, Hk, D), np.float32)
        vp = np.zeros((B * P, PS, Hk, D), np.float32)
        for b in range(B):
            kp[b * P:(b + 1) * P] = kk[b].reshape(P, PS, Hk, D)
            vp[b * P:(b + 1) * P] = vv[b].reshape(P, PS, Hk, D)
        if k_bits:
            kw, ks = quantize_kv(jnp.asarray(kp), k_bits)
            vw, vs = quantize_kv(jnp.asarray(vp), v_bits)
            state = {"k_q": kw, "k_s": ks, "v_q": vw, "v_s": vs}
            from exllamav3_tpu.ops.kv_quant import dequantize_kv

            kd = np.asarray(dequantize_kv(kw, ks, k_bits))
            vd = np.asarray(dequantize_kv(vw, vs, v_bits))
        else:
            state = {"k": jnp.asarray(kp, jnp.bfloat16),
                     "v": jnp.asarray(vp, jnp.bfloat16)}
            kd, vd = kp, vp
        got = flash_attention(q, state, pos, tot, block_tables=bt,
                              scale=D ** -0.5, sliding_window=window,
                              k_bits=k_bits, v_bits=v_bits)
        # numpy causal reference over the dequantized cache
        kd2 = np.stack([kd[b * P:(b + 1) * P].reshape(P * PS, Hk, D)
                        for b in range(B)]).astype(np.float32)
        vd2 = np.stack([vd[b * P:(b + 1) * P].reshape(P * PS, Hk, D)
                        for b in range(B)]).astype(np.float32)
        qf = np.asarray(q, np.float32)
        G = Hq // Hk
        ref = np.zeros((B, S, Hq, D), np.float32)
        posn = np.asarray(pos)
        for b in range(B):
            for s_ in range(S):
                for hq in range(Hq):
                    hk = hq // G
                    p_ = int(posn[b, s_])
                    lo = max(0, p_ - window + 1) if window else 0
                    ks_ = kd2[b, lo:p_ + 1, hk]
                    vs_ = vd2[b, lo:p_ + 1, hk]
                    sc_ = (qf[b, s_, hq] @ ks_.T) * (D ** -0.5)
                    e = np.exp(sc_ - sc_.max())
                    ref[b, s_, hq] = (e / e.sum()) @ vs_
        return rel(got, ref)

    check("attn/paged-decode", lambda: flash(0, 0, S=1), flt)
    check("attn/paged-verify-s4", lambda: flash(0, 0, S=4), flt)
    for bits in (2, 3, 4, 5, 6, 7, 8):
        check(f"attn/quant-kv-{bits}bit", lambda b=bits: flash(b, b), flt)
    check("attn/sliding-window", lambda: flash(0, 0, S=1, window=128), flt)

    print("-" * 44, flush=True)
    if FAILURES:
        print(f"FAILED: {len(FAILURES)} -> {FAILURES}")
        sys.exit(1)
    print("all kernel families compile and verify on this device")


if __name__ == "__main__":
    main()
