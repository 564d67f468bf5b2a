"""Unified Pallas flash attention (paged/linear, S>=1, quantized KV, MLA)
vs the jnp dense reference, in interpret mode on CPU."""
import numpy as np
import jax.numpy as jnp
import pytest

from exllamav3_tpu.constants import PAGE_SIZE
from exllamav3_tpu.ops.attention import attend_dense
from exllamav3_tpu.ops.flash_attention import flash_attention, channel_perm
from exllamav3_tpu.ops.kv_quant import quantize_kv, dequantize_kv


def _mk_paged(rng, P, Hk, D, scale=0.3):
    k = (rng.standard_normal((P, PAGE_SIZE, Hk, D)) * scale).astype(np.float32)
    v = (rng.standard_normal((P, PAGE_SIZE, Hk, D)) * scale).astype(np.float32)
    return jnp.asarray(k), jnp.asarray(v)


def _gather(pages, bt):
    g = np.asarray(pages)[np.asarray(bt)]  # (B, MP, PS, Hk, D)
    B, MP, PS, Hk, D = g.shape
    return jnp.asarray(g.reshape(B, MP * PS, Hk, D))


def _ref(q, k, v, qpos, total_lens, **kw):
    B, T = k.shape[:2]
    k_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    k_valid = k_pos < jnp.asarray(total_lens)[:, None]
    return np.asarray(attend_dense(
        q, k, v, q_positions=jnp.asarray(qpos), k_positions=k_pos,
        k_valid=k_valid, **kw))


@pytest.mark.parametrize("S,sliding,softcap,sinks", [
    (1, 0, 0.0, False),
    (1, 100, 0.0, False),
    (1, 0, 30.0, False),
    (1, 0, 0.0, True),
    (4, 0, 0.0, False),       # spec-decode verify block
    (8, 64, 20.0, True),      # verify + window + softcap + sinks
])
def test_paged_decode_verify(S, sliding, softcap, sinks):
    rng = np.random.default_rng(1)
    B, Hq, Hk, D, P, MP = 2, 8, 2, 64, 6, 2
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_pages, v_pages = _mk_paged(rng, P, Hk, D)
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    starts = np.array([300 - S + 1, 120 - S + 1], dtype=np.int32)
    qpos = starts[:, None] + np.arange(S, dtype=np.int32)[None]
    total = qpos[:, -1] + 1
    sink_arr = (jnp.asarray((rng.standard_normal(Hq) * 0.5).astype(np.float32))
                if sinks else None)
    scale = D ** -0.5
    kw = dict(scale=scale, sliding_window=sliding, logit_softcap=softcap,
              sinks=sink_arr)

    ref = _ref(q, _gather(k_pages, bt), _gather(v_pages, bt), qpos, total, **kw)
    got = np.asarray(flash_attention(
        q, {"k": k_pages, "v": v_pages}, jnp.asarray(qpos),
        jnp.asarray(total), block_tables=jnp.asarray(bt),
        interpret=True, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("S", [64, 96])
def test_paged_prefill_tall(S):
    """Prefill chunk (tall mode): history + current chunk already written."""
    rng = np.random.default_rng(2)
    B, Hq, Hk, D, P, MP = 2, 8, 4, 64, 8, 3
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_pages, v_pages = _mk_paged(rng, P, Hk, D)
    bt = np.array([[1, 2, 3], [4, 5, 0]], dtype=np.int32)
    starts = np.array([256, 100], dtype=np.int32)   # chunk begins mid-cache
    qpos = starts[:, None] + np.arange(S, dtype=np.int32)[None]
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    ref = _ref(q, _gather(k_pages, bt), _gather(v_pages, bt), qpos, total,
               scale=scale)
    got = np.asarray(flash_attention(
        q, {"k": k_pages, "v": v_pages}, jnp.asarray(qpos),
        jnp.asarray(total), block_tables=jnp.asarray(bt),
        scale=scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kb,vb", [(4, 4), (8, 8), (2, 2), (8, 4),
                                   (3, 3), (5, 5), (6, 6), (7, 7),
                                   (5, 3), (7, 4)])
def test_paged_quantized(kb, vb):
    """In-kernel dequant must match jnp dequantize-then-attend exactly."""
    rng = np.random.default_rng(3)
    B, S, Hq, Hk, D, P = 2, 2, 8, 2, 64, 4
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    v_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    kq, ks = quantize_kv(jnp.asarray(k_raw), kb)
    vq, vs = quantize_kv(jnp.asarray(v_raw), vb)
    state = {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    qpos = np.array([[299, 300], [119, 120]], dtype=np.int32)
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    k_dq = dequantize_kv(kq, ks, kb, jnp.float32)
    v_dq = dequantize_kv(vq, vs, vb, jnp.float32)
    ref = _ref(q, _gather(k_dq, bt), _gather(v_dq, bt), qpos, total,
               scale=scale)
    got = np.asarray(flash_attention(
        q, state, jnp.asarray(qpos), jnp.asarray(total),
        block_tables=jnp.asarray(bt), scale=scale, k_bits=kb, v_bits=vb,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_channel_perm_roundtrip():
    for bits in (2, 3, 4, 5, 6, 7, 8):
        perm, inv = channel_perm(128, bits)
        assert (perm[inv] == np.arange(128)).all()
        assert (np.sort(perm) == np.arange(128)).all()


@pytest.mark.parametrize("quant", [False, True])
def test_mla_latent(quant):
    """Hk=1, V = leading `latent` channels of K (absorbed MLA decode)."""
    rng = np.random.default_rng(4)
    B, S, Hq, c, dr, P = 2, 1, 16, 128, 64, 4
    D = c + dr
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32) * 0.2)
    kv_raw = rng.standard_normal((P, PAGE_SIZE, 1, D)).astype(np.float32) * 0.3
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    qpos = np.array([[300], [120]], dtype=np.int32)
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    if quant:
        lat_q, lat_s = quantize_kv(jnp.asarray(kv_raw[..., :c]), 4)
        state = {"kv_q": lat_q, "kv_s": lat_s,
                 "k_pe": jnp.asarray(kv_raw[..., c:])}
        lat_dq = dequantize_kv(lat_q, lat_s, 4, jnp.float32)
        kv_eff = jnp.concatenate([lat_dq, jnp.asarray(kv_raw[..., c:])], -1)
        kb = 4
    else:
        state = {"kv": jnp.asarray(kv_raw)}
        kv_eff = jnp.asarray(kv_raw)
        kb = 0

    k_all = _gather(kv_eff, bt)
    ref = _ref(q, k_all, k_all[..., :c], qpos, total, scale=scale)
    got = np.asarray(flash_attention(
        q, state, jnp.asarray(qpos), jnp.asarray(total),
        block_tables=jnp.asarray(bt), scale=scale, latent=c, k_bits=kb,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_linear_layout():
    rng = np.random.default_rng(5)
    B, S, Hq, Hk, D, T = 2, 1, 8, 2, 64, 160
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3)
    qpos = np.array([[150], [80]], dtype=np.int32)
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    ref = _ref(q, k, v, qpos, total, scale=scale)
    got = np.asarray(flash_attention(
        q, {"k": k, "v": v}, jnp.asarray(qpos), jnp.asarray(total),
        scale=scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_padded_rows_and_batch():
    """Padded batch row (total_len 0) and padded S tail must not disturb
    valid rows; padded outputs are allowed to be garbage."""
    rng = np.random.default_rng(6)
    B, S, Hq, Hk, D, P, MP = 2, 33, 8, 2, 64, 4, 2
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_pages, v_pages = _mk_paged(rng, P, Hk, D)
    bt = np.array([[1, 2], [0, 0]], dtype=np.int32)
    # row 0: chunk of 20 valid tokens from 100; rows padded with park pos
    park = MP * PAGE_SIZE
    qpos = np.full((B, S), park, np.int32)
    qpos[0, :20] = 100 + np.arange(20)
    total = np.array([120, 0], dtype=np.int32)
    scale = D ** -0.5

    ref = _ref(q[:1, :20], _gather(k_pages, bt[:1]), _gather(v_pages, bt[:1]),
               qpos[:1, :20], total[:1], scale=scale)
    got = np.asarray(flash_attention(
        q, {"k": k_pages, "v": v_pages}, jnp.asarray(qpos),
        jnp.asarray(total), block_tables=jnp.asarray(bt),
        scale=scale, interpret=True))
    np.testing.assert_allclose(got[:1, :20], ref, rtol=2e-3, atol=2e-3)


def test_ring_decode_kernel():
    """SWA-ring decode kernel vs dense reference: arbitrary per-slot
    positions, unwritten (-1) and stale-future slots masked."""
    from exllamav3_tpu.ops.flash_attention import flash_ring_attention

    rng = np.random.default_rng(9)
    N, W, Hk, D, Hq, B = 5, 48, 2, 64, 8, 3
    sw = 40
    ring_k = jnp.asarray(rng.standard_normal((N, W, Hk, D)).astype(np.float32) * 0.3)
    ring_v = jnp.asarray(rng.standard_normal((N, W, Hk, D)).astype(np.float32) * 0.3)
    slots = np.array([4, 0, 2], np.int32)
    qpos = np.array([[100], [47], [10]], np.int32)
    # positions: mostly the last W window, some unwritten, some stale future
    pos = np.full((N, W), -1, np.int32)
    for b, s in enumerate(slots):
        p0 = int(qpos[b, 0])
        for t in range(min(p0 + 1, W)):
            pp = p0 - t
            pos[s, pp % W] = pp
        pos[s, (p0 + 3) % W] = p0 + 3  # stale speculative write
    pos_j = jnp.asarray(pos)

    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    got = np.asarray(flash_ring_attention(
        q, ring_k, ring_v, pos_j, jnp.asarray(slots), jnp.asarray(qpos),
        scale=D ** -0.5, sliding_window=sw, interpret=True))

    k_g = np.asarray(ring_k)[slots]
    v_g = np.asarray(ring_v)[slots]
    kpos_g = pos[slots]
    ref = np.asarray(attend_dense(
        q, jnp.asarray(k_g), jnp.asarray(v_g), jnp.asarray(qpos),
        jnp.asarray(kpos_g), k_valid=jnp.asarray(kpos_g >= 0),
        scale=D ** -0.5, sliding_window=sw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_return_stats_merge():
    """Two partial kernel calls over disjoint key ranges must merge (online-
    softmax stat combination + optional sink) to the single-shot answer —
    the contract DSV4 window+pool fusion and SP shards build on."""
    rng = np.random.default_rng(11)
    B, S, Hq, Hk, D, T = 2, 1, 8, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3)
    qpos = np.array([[255], [200]], dtype=np.int32)
    total = qpos[:, -1] + 1
    scale = D ** -0.5
    sinks = jnp.asarray((rng.standard_normal(Hq) * 0.5).astype(np.float32))

    ref = np.asarray(flash_attention(
        q, {"k": k, "v": v}, jnp.asarray(qpos), jnp.asarray(total),
        scale=scale, sinks=sinks, interpret=True))

    H = T // 2
    acc1, m1, l1 = flash_attention(
        q, {"k": k[:, :H], "v": v[:, :H]}, jnp.asarray(qpos),
        jnp.asarray(np.minimum(total, H)), scale=scale,
        return_stats=True, interpret=True)
    # second half: shift positions so kp stays absolute
    acc2, m2, l2 = flash_attention(
        q, {"k": k[:, H:], "v": v[:, H:]},
        jnp.asarray(qpos - H), jnp.asarray(total - H), scale=scale,
        return_stats=True, interpret=True)

    sk = sinks[None, None, :]
    mg = jnp.maximum(jnp.maximum(m1, m2), sk)
    c1 = jnp.where(m1 <= -1e29, 0.0, jnp.exp(m1 - mg))
    c2 = jnp.where(m2 <= -1e29, 0.0, jnp.exp(m2 - mg))
    lg = l1 * c1 + l2 * c2 + jnp.exp(sk - mg)
    acc = acc1 * c1[..., None] + acc2 * c2[..., None]
    got = np.asarray(acc / lg[..., None])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("S,sliding,softcap,sinks", [
    (1, 0, 0.0, False),
    (1, 100, 0.0, True),
    (4, 64, 20.0, True),
])
def test_merged_quantized_features(S, sliding, softcap, sinks):
    """The merged-head quantized decode path (even bits, S<=32) must honor
    sliding window / softcap / sinks exactly like the dense reference."""
    rng = np.random.default_rng(12)
    B, Hq, Hk, D, P = 2, 8, 2, 64, 6
    kb = vb = 4
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    v_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    # MERGED storage (even bits): all heads' words share one dense lane dim
    kq, ks = quantize_kv(jnp.asarray(k_raw.reshape(P, PAGE_SIZE, Hk * D)), kb)
    vq, vs = quantize_kv(jnp.asarray(v_raw.reshape(P, PAGE_SIZE, Hk * D)), vb)
    state = {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    starts = np.array([300 - S + 1, 120 - S + 1], dtype=np.int32)
    qpos = starts[:, None] + np.arange(S, dtype=np.int32)[None]
    total = qpos[:, -1] + 1
    scale = D ** -0.5
    sink_arr = (jnp.asarray((rng.standard_normal(Hq) * 0.5).astype(np.float32))
                if sinks else None)
    kw = dict(scale=scale, sliding_window=sliding, logit_softcap=softcap,
              sinks=sink_arr)

    k_dq = dequantize_kv(kq, ks, kb, jnp.float32).reshape(
        P, PAGE_SIZE, Hk, D)
    v_dq = dequantize_kv(vq, vs, vb, jnp.float32).reshape(
        P, PAGE_SIZE, Hk, D)
    ref = _ref(q, _gather(k_dq, bt), _gather(v_dq, bt), qpos, total, **kw)
    got = np.asarray(flash_attention(
        q, state, jnp.asarray(qpos), jnp.asarray(total),
        block_tables=jnp.asarray(bt), k_bits=kb, v_bits=vb,
        interpret=True, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_merged_quantized_stats_linear():
    """Merged path with return_stats on a LINEAR-layout quantized cache:
    two disjoint halves must merge to the single-shot answer."""
    rng = np.random.default_rng(13)
    B, S, Hq, Hk, D, T = 2, 1, 8, 4, 64, 256
    kb = vb = 8
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_raw = rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3
    v_raw = rng.standard_normal((B, T, Hk, D)).astype(np.float32) * 0.3
    kq, ks = quantize_kv(jnp.asarray(k_raw.reshape(B, T, Hk * D)), kb)
    vq, vs = quantize_kv(jnp.asarray(v_raw.reshape(B, T, Hk * D)), vb)
    qpos = np.array([[255], [200]], dtype=np.int32)
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    state = {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}
    ref = np.asarray(flash_attention(
        q, state, jnp.asarray(qpos), jnp.asarray(total), scale=scale,
        k_bits=kb, v_bits=vb, interpret=True))

    H = T // 2
    st1 = {"k_q": kq[:, :H], "k_s": ks[:, :H],
           "v_q": vq[:, :H], "v_s": vs[:, :H]}
    st2 = {"k_q": kq[:, H:], "k_s": ks[:, H:],
           "v_q": vq[:, H:], "v_s": vs[:, H:]}
    acc1, m1, l1 = flash_attention(
        q, st1, jnp.asarray(qpos), jnp.asarray(np.minimum(total, H)),
        scale=scale, k_bits=kb, v_bits=vb, return_stats=True, interpret=True)
    acc2, m2, l2 = flash_attention(
        q, st2, jnp.asarray(qpos - H), jnp.asarray(total - H),
        scale=scale, k_bits=kb, v_bits=vb, return_stats=True, interpret=True)

    mg = jnp.maximum(m1, m2)
    c1 = jnp.where(m1 <= -1e29, 0.0, jnp.exp(m1 - mg))
    c2 = jnp.where(m2 <= -1e29, 0.0, jnp.exp(m2 - mg))
    lg = l1 * c1 + l2 * c2
    acc = acc1 * c1[..., None] + acc2 * c2[..., None]
    got = np.asarray(acc / lg[..., None])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_merged_prefill_dense_fallback():
    """S>32 on merged storage dequantizes pool-wide and runs the dense
    kernel; result must match the dequantize-then-attend reference."""
    rng = np.random.default_rng(14)
    B, S, Hq, Hk, D, P = 2, 64, 8, 2, 64, 8
    kb = vb = 4
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    v_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    kq, ks = quantize_kv(jnp.asarray(k_raw.reshape(P, PAGE_SIZE, Hk * D)), kb)
    vq, vs = quantize_kv(jnp.asarray(v_raw.reshape(P, PAGE_SIZE, Hk * D)), vb)
    state = {"k_q": kq, "k_s": ks, "v_q": vq, "v_s": vs}
    bt = np.array([[1, 2, 3], [4, 5, 0]], dtype=np.int32)
    starts = np.array([256, 100], dtype=np.int32)
    qpos = starts[:, None] + np.arange(S, dtype=np.int32)[None]
    total = qpos[:, -1] + 1
    scale = D ** -0.5

    k_dq = dequantize_kv(kq, ks, kb, jnp.float32).reshape(
        P, PAGE_SIZE, Hk, D)
    v_dq = dequantize_kv(vq, vs, vb, jnp.float32).reshape(
        P, PAGE_SIZE, Hk, D)
    ref = _ref(q, _gather(k_dq, bt), _gather(v_dq, bt), qpos, total,
               scale=scale)
    got = np.asarray(flash_attention(
        q, state, jnp.asarray(qpos), jnp.asarray(total),
        block_tables=jnp.asarray(bt), scale=scale, k_bits=kb, v_bits=vb,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_merged_vs_legacy_storage_parity():
    """The merged (3-D) and per-head (4-D) storage layouts hold identical
    numerics: decode through each kernel path must agree bit-for-bit-ish."""
    rng = np.random.default_rng(15)
    B, S, Hq, Hk, D, P = 2, 1, 8, 2, 64, 4
    kb = vb = 4
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    v_raw = rng.standard_normal((P, PAGE_SIZE, Hk, D)).astype(np.float32) * 0.3
    kq4, ks4 = quantize_kv(jnp.asarray(k_raw), kb)
    vq4, vs4 = quantize_kv(jnp.asarray(v_raw), vb)
    kq3, ks3 = quantize_kv(
        jnp.asarray(k_raw.reshape(P, PAGE_SIZE, Hk * D)), kb)
    vq3, vs3 = quantize_kv(
        jnp.asarray(v_raw.reshape(P, PAGE_SIZE, Hk * D)), vb)
    bt = np.array([[1, 2], [3, 0]], dtype=np.int32)
    qpos = np.array([[300], [120]], dtype=np.int32)
    total = qpos[:, -1] + 1
    kw = dict(block_tables=jnp.asarray(bt), scale=D ** -0.5, k_bits=kb,
              v_bits=vb, interpret=True)
    legacy = np.asarray(flash_attention(
        q, {"k_q": kq4, "k_s": ks4, "v_q": vq4, "v_s": vs4},
        jnp.asarray(qpos), jnp.asarray(total), **kw))
    merged = np.asarray(flash_attention(
        q, {"k_q": kq3, "k_s": ks3, "v_q": vq3, "v_s": vs3},
        jnp.asarray(qpos), jnp.asarray(total), **kw))
    np.testing.assert_allclose(merged, legacy, rtol=1e-5, atol=1e-5)
