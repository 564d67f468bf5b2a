"""Model conversion driver: dense HF checkpoint -> EXL3.

Feature reference: /root/reference/exllamav3/conversion/convert_model.py
(main:879 — per-module loop: load unquantized, capture Hessians over
calibration rows, quantize linears, advance reference state, save shard,
timed resumable checkpoint) and convert.py CLI.

TPU architecture: the forward passes (capture + state advance) run as jitted
module forwards on the TPU; the Viterbi tile search runs batched on the TPU
through quant/quantize.py's jnp backend; the LDLQ recursion's small matmuls
run in numpy on host. Conversion is resumable via a job_state.json +
per-module qtensors shards, like the reference.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np
import jax

from ..model.config import Config
from ..model.model import Model
from ..modules.module import ForwardCtx
from ..modules.linear import Linear
from ..quant.quantize import HessianData, quantize_exl3_np
from ..quant.codebook import CB_3INST, CB_MCG, CB_MUL1
from ..loader.safetensors import save_file, f32_to_bf16_u16
from .allocation import QGroup, create_q_strategy
from .calibration import get_calibration
from .compile import compile_model

import jax.numpy as jnp


def build_capture_fn(module):
    """(params, state, positions, valid) -> {qmap: (H_f32, count)}: one
    traced forward of `module` with per-qmap H = x^T x contracted on device.
    Non-finite tokens and valid==0 (padding) rows contribute nothing. Rows
    may be sharded over a dp mesh axis — the contraction over the sharded
    dim becomes partial sums + all-reduce under GSPMD (the reference's
    conversion data parallelism, convert_model.py:976-984)."""

    def _cap(prm, st, pos, valid):
        cdev: dict = {}
        ctx = ForwardCtx(positions=pos, capture_dev=cdev)
        module.forward(st, prm, ctx)
        nb = st.shape[0]
        out = {}
        for qmap, xs in cdev.items():
            Hc = cnt = None
            for x2 in xs:
                x3 = x2.astype(jnp.float32).reshape(nb, -1, x2.shape[-1])
                finite = jnp.isfinite(x3).all(-1, keepdims=True)
                m = finite & (valid[:, None, None] > 0)
                x3 = jnp.where(m, x3, 0.0)
                xf = x3.reshape(-1, x3.shape[-1])
                h = xf.T @ xf
                c = jnp.sum(m.astype(jnp.int32))
                Hc = h if Hc is None else Hc + h
                cnt = c if cnt is None else cnt + c
            out[qmap] = (Hc, cnt)
        return out

    return _cap


def convert_model(
    in_dir: str,
    out_dir: str,
    bpw: float = 4.0,
    head_bits: int = 6,
    rows: int = 64,
    length: int = 1024,
    cal_text: list | None = None,
    cb: int = CB_3INST,
    seed: int = 0,
    resume: bool = True,
    verbose: bool = True,
    viterbi_backend: str = "auto",
    fast: bool = False,
    strategy: dict | None = None,  # per-linear-key K overrides (optimize.py)
    hq: bool = False,              # clamp sensitive groups >= base+1 bits
    mtp_bits: int | None = None,   # auxiliary target for MTP-head linears
    serving_bits: int | None = None,  # emit Hessian-aware int-B serving
                                      # tensors (<key>.sq) alongside, 3-6
    dp: int = 0,  # shard calibration rows over this many devices during
                  # capture/advance (reference convert_model.py:976-984 row
                  # sharding across replicas; here one GSPMD mesh axis)
):
    os.makedirs(out_dir, exist_ok=True)
    qdir = os.path.join(out_dir, "qtensors")
    os.makedirs(qdir, exist_ok=True)
    state_path = os.path.join(out_dir, "job_state.json")

    # fusion would hide per-projection weights from Hessian capture
    from ..model.config import InferParams

    config = Config.from_directory(
        in_dir, infer_params=InferParams(fuse_projections=False))
    model = Model.from_config(config)

    tokenizer = None
    try:
        from ..tokenizer import Tokenizer

        tokenizer = Tokenizer(in_dir)
    except Exception:
        pass

    cal_ids = get_calibration(tokenizer, rows=rows, length=length,
                              text_files=cal_text, vocab_size=config.vocab_size,
                              seed=seed)

    # quantization groups: per-module, grouped by qmap
    job = {"in_dir": in_dir, "bpw": bpw, "head_bits": head_bits,
           "completed": [], "proxy_err": {}}
    if resume and os.path.exists(state_path):
        with open(state_path) as f:
            job = json.load(f)

    # build the module-level plan
    plans = []
    for mi, module in enumerate(model.modules):
        linears = [m for m in module.walk() if isinstance(m, Linear)]
        groups: dict[str, QGroup] = {}
        for lin in linears:
            gkey = lin.key.rsplit(".", 1)[0]
            g = groups.setdefault(gkey, QGroup(key=lin.key, linears=[], numel=0))
            g.linears.append(lin)
            g.numel += lin.in_features * lin.out_features
        plans.append((mi, module, list(groups.values())))

    all_groups = [g for _, _, gs in plans for g in gs]
    achieved = create_q_strategy(all_groups, bpw, head_bits, hq=hq,
                                 mtp_bits=mtp_bits)
    if verbose:
        print(f" -- bit allocation: body {achieved:.3f} bpw "
              f"(target {bpw}), head {head_bits}")

    # calibration state flows through modules; starts as token ids
    state = cal_ids.astype(np.int32)
    B, S = state.shape
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)).copy()
    # rows whose hidden state has gone non-finite are excluded from all
    # further capture and state advancement; the job aborts past 10% bad —
    # the remainder no longer represents the calibration distribution
    # (reference convert_model.py check_bad_rows:544, :943-951)
    bad_rows = set(job.get("bad_rows") or [])
    # streamed capture/advance: rows process in chunks so host/device peak
    # memory stays bounded regardless of the calibration set size
    # (reference captures 250x2048-row sets in chunks, :631)
    row_batch = int(os.environ.get("EXL3_TPU_CAL_BATCH", "16"))
    checkpoint_s = float(os.environ.get("EXL3_TPU_CKPT_INTERVAL", "60"))

    # conversion data parallelism: one mesh axis over the row (batch) dim.
    # H = sum_rows x^T x is a contraction over the sharded dim, so GSPMD
    # inserts the partial-sum + all-reduce; chunks pad to a multiple of the
    # axis size with a validity mask so padded rows contribute nothing.
    dp_mesh = None
    dp_sharding = None
    if dp and dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()[:dp]
        if len(devs) < dp:
            raise ValueError(f"dp={dp} but only {len(devs)} devices visible")
        dp_mesh = Mesh(np.asarray(devs), axis_names=("dp",))
        dp_sharding = NamedSharding(dp_mesh, P("dp"))
        row_batch += (-row_batch) % dp

    def _put_rows(arr):
        """Device-put a (rows, ...) array, sharded over dp when active."""
        a = jnp.asarray(arr)
        if dp_sharding is None:
            return a
        return jax.device_put(a, dp_sharding)

    def live_row_chunks():
        live = [r for r in range(B) if r not in bad_rows]
        for i in range(0, len(live), row_batch):
            yield live[i : i + row_batch]

    def _pad_chunk(rows_c):
        """Pad a ragged chunk to a multiple of the dp axis; valid=0 rows
        contribute nothing to H and their advance output is discarded."""
        valid = np.ones(len(rows_c), np.float32)
        if dp_mesh is None:
            return rows_c, valid
        pad = (-len(rows_c)) % dp_mesh.shape["dp"]
        if pad:
            rows_c = list(rows_c) + [rows_c[0]] * pad
            valid = np.concatenate([valid, np.zeros(pad, np.float32)])
        return rows_c, valid

    def save_job():
        job["bad_rows"] = sorted(bad_rows)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(job, f)
        os.replace(tmp, state_path)

    t_start = time.time()
    # one compiled advance per module STRUCTURE: transformer blocks of the
    # same shape/config re-key their params onto the first such block's
    # keys instead of paying a fresh (tens of seconds) XLA compile each —
    # 12 identical-layer compiles dominated the 0.1b wall-clock
    adv_cache: dict = {}

    def _structure_sig(module, params):
        mk = module.key
        rel = lambda k: k[len(mk):] if mk and k.startswith(mk) else k
        mods = tuple(
            (rel(m.key), type(m).__name__,
             getattr(m, "sliding_window", None),
             getattr(m, "layer_type", None))
            for m in module.walk())
        tensors = tuple(sorted(
            (rel(k), n, tuple(a.shape), str(a.dtype))
            for k, g in params.items() for n, a in g.items()))
        return (mods, tensors)

    def _get_advance(module, params):
        """-> (jitted fn, params remapped onto the compile-owner's keys)."""
        sig = _structure_sig(module, params)
        ent = adv_cache.get(sig)
        mk = module.key
        rel = lambda k: k[len(mk):] if mk and k.startswith(mk) else k
        if ent is None:
            def _advance(prm, st, pos):
                return module.forward(st, prm, ForwardCtx(positions=pos))

            ent = (jax.jit(_advance), mk)
            adv_cache[sig] = ent
            return ent[0], params
        fn, base_key = ent
        if base_key == mk:
            return fn, params
        return fn, {base_key + rel(k): g for k, g in params.items()}

    # one compiled CAPTURE per module structure: the whole forward runs as a
    # single dispatch per row chunk with per-qmap H = x^T x contracted ON
    # DEVICE (the eager walk paid one dispatch per op plus one device->host
    # readback per linear — ~35 ms each over the tunnel). qmap labels are
    # structure-relative strings ("block.attn.qkv"), so same-structure
    # modules share both the compile and the returned dict keys.
    cap_cache: dict = {}

    def _get_capture(module, params):
        sig = _structure_sig(module, params)
        ent = cap_cache.get(sig)
        mk = module.key
        rel = lambda k: k[len(mk):] if mk and k.startswith(mk) else k
        if ent is None:
            ent = (jax.jit(build_capture_fn(module)), mk)
            cap_cache[sig] = ent
            return ent[0], params
        fn, base_key = ent
        if base_key == mk:
            return fn, params
        return fn, {base_key + rel(k): g for k, g in params.items()}

    for mi, module, groups in plans:
        params: dict = {}
        module.load(params)  # loads dense weights (or passthrough modules)

        done = str(mi) in map(str, job["completed"])
        shard_path = os.path.join(qdir, f"module_{mi:04d}.safetensors")
        partial_done = set(job.get("partial", {}).get(str(mi), []))
        shard: dict = {}
        if (done or partial_done) and os.path.exists(shard_path):
            # re-apply saved quantized tensors so the state advance matches
            # (mid-module resume re-applies just the finished linears)
            shard = _apply_saved(module, params, shard_path, config,
                                 only_keys=None if done else partial_done)
            # trust only what actually validated and loaded: a corrupt or
            # truncated shard demotes the module (or the affected linears)
            # back to requantization instead of silently shipping garbage
            expected = {lin.key for g in groups for lin in g.linears}
            loaded = {k for k in expected if f"{k}.trellis" in shard}
            if done and loaded < expected:
                done = False
                job["completed"] = [c for c in job["completed"]
                                    if str(c) != str(mi)]
                partial_done = loaded
            elif not done:
                partial_done &= loaded
        has_linears = any(isinstance(m, Linear) for m in module.walk())
        if has_linears and not done:
            # 1. capture Hessians (streamed over row chunks): jitted device
            # contraction when the module traces (one dispatch per chunk,
            # rows sharded over dp), eager per-linear accumulation otherwise
            capture: dict = {}
            t_cap = time.time()
            try:
                cap_fn, cap_params = _get_capture(module, params)
            except Exception:
                cap_fn, cap_params = None, params
            for rows_c in live_row_chunks():
                hs = None
                if cap_fn is not None:
                    rows_p, valid = _pad_chunk(rows_c)
                    try:
                        hs = jax.device_get(cap_fn(
                            cap_params, _put_rows(state[rows_p]),
                            _put_rows(positions[rows_p]),
                            _put_rows(valid)))
                    except Exception:
                        cap_fn = None
                if hs is None:  # modules that resist tracing
                    ctx = ForwardCtx(positions=jnp.asarray(positions[rows_c]),
                                     capture=capture)
                    x = module.forward(jnp.asarray(state[rows_c]), params, ctx)
                    del x
                    continue
                for qmap, (h, cnt) in hs.items():
                    hd = capture.setdefault(qmap, HessianData(k=h.shape[0]))
                    hd.accumulate_chunk(h, cnt)
            if verbose:
                print(f" -- module {mi}: H capture {time.time()-t_cap:.1f}s"
                      + (f" (dp={dp})" if dp_mesh is not None else ""))

            # 2. quantize each group (timed mid-module checkpoints: the
            # shard file + job_state rewrite whenever checkpoint_s elapses)
            last_ckpt = time.time()
            for g in groups:
                for lin in g.linears:
                    if lin.key in partial_done:
                        continue
                    qmap_key = lin.qmap
                    hd = capture.get(qmap_key) or HessianData(k=lin.in_features)
                    w = lin.get_weight_f32(params)  # (in, out) f32
                    t0 = time.time()
                    K = (strategy or {}).get(lin.key, g.K)
                    out, proxy_err, _ = quantize_exl3_np(
                        w, hd, K=K, cb=cb, seed=seed + hash(lin.key) % 65536,
                        backend=viterbi_backend, skip_g_scale=fast,
                    )
                    if verbose:
                        print(f" -- {lin.key}: K={K} proxy_err={proxy_err:.6f} "
                              f"({time.time()-t0:.1f}s)")
                    job["proxy_err"][lin.key] = proxy_err
                    if serving_bits:
                        # independent GPTQ-grade uniform int-B codes of the
                        # SAME dense weight in the shared-rotated basis —
                        # serving at low-bit bytes without the load-time
                        # round-to-nearest cliff (doc/performance.md)
                        from ..quant.quantize import quantize_serving_intb_np

                        sq = quantize_serving_intb_np(w, hd, serving_bits)
                        if sq is not None:
                            shard[f"{lin.key}.sq"] = sq[0]
                            shard[f"{lin.key}.sq_scale"] = sq[1]
                    for name, arr in out.items():
                        shard[f"{lin.key}.{name}"] = arr
                    _swap_linear_to_exl3(lin, params, out, K, cb)
                    partial_done.add(lin.key)
                    if time.time() - last_ckpt > checkpoint_s:
                        save_file(shard, shard_path)
                        job.setdefault("partial", {})[str(mi)] = \
                            sorted(partial_done)
                        save_job()
                        last_ckpt = time.time()
            save_file(shard, shard_path)
            job["completed"].append(mi)
            job.get("partial", {}).pop(str(mi), None)
            save_job()

        # 3. advance state with the (possibly quantized) module, streamed;
        # rows that emerge non-finite are excluded from here on. The advance
        # needs no Hessian capture, so it runs as ONE jitted dispatch per
        # chunk (shared across same-structure modules) instead of an eager
        # per-op walk (each eager op pays a dispatch; ~35 ms over a tunnel).
        new_state = None
        t_adv = time.time()
        try:
            adv_fn, adv_params = _get_advance(module, params)
        except Exception:
            adv_fn, adv_params = None, params
        for rows_c in live_row_chunks():
            try:
                if adv_fn is None:
                    raise TypeError
                rows_p, _ = _pad_chunk(rows_c)
                out_dev = adv_fn(adv_params, _put_rows(state[rows_p]),
                                 _put_rows(positions[rows_p]))
            except Exception:  # modules that resist tracing: eager fallback
                adv_fn = None
                out_dev = module.forward(
                    jnp.asarray(state[rows_c]), params,
                    ForwardCtx(positions=jnp.asarray(positions[rows_c])))
            out_c = np.asarray(jax.device_get(out_dev),
                               dtype=np.float32)[: len(rows_c)]
            if new_state is None:
                new_state = np.zeros((B,) + out_c.shape[1:], np.float32)
            finite = np.isfinite(out_c).all(
                axis=tuple(range(1, out_c.ndim)))
            for j, r in enumerate(rows_c):
                if finite[j]:
                    new_state[r] = out_c[j]
                else:
                    bad_rows.add(r)
        if len(bad_rows) > 0.10 * B:
            save_job()
            raise RuntimeError(
                f"{len(bad_rows)} of {B} calibration rows have produced "
                f"non-finite states (> 10%), aborting job. "
                f"Rows: {sorted(bad_rows)}")
        state = new_state if new_state is not None else state
        if verbose and has_linears:
            print(f" -- module {mi}: advance {time.time()-t_adv:.1f}s")

    if verbose:
        print(f" -- quantization done in {time.time()-t_start:.0f}s; compiling")
    compile_model(in_dir, out_dir, bpw=bpw, head_bits=head_bits,
                  serving_bits=serving_bits)
    return job


def _swap_linear_to_exl3(lin: Linear, params: dict, out: dict, K: int, cb: int):
    """Replace the dense params with quantized (reconstruct mode) so the
    state advance sees quantized weights (error feedback across layers)."""
    p = {
        "trellis": jnp.asarray(out["trellis"]),
        "suh": jnp.asarray(out["suh"].astype(np.float32)),
        "svh": jnp.asarray(out["svh"].astype(np.float32)),
    }
    old = params[lin.key]
    if "bias" in old:
        p["bias"] = old["bias"]
    params[lin.key] = p
    lin.quant_type = "exl3"
    lin.mode = "reconstruct"
    lin.K = K
    lin.cb = cb


def _apply_saved(module, params, shard_path, config, only_keys=None):
    """Swap saved quantized tensors back in. only_keys restricts to linears
    finished before a mid-module checkpoint (timed-resume). Returns the
    loaded shard tensors so a resumed module keeps accumulating into the
    same file."""
    from ..loader.safetensors import SafetensorsCollection

    shard: dict = {}
    stc = SafetensorsCollection(os.path.dirname(shard_path))
    for m in module.walk():
        if isinstance(m, Linear):
            if only_keys is not None and m.key not in only_keys:
                continue
            t = stc.get_tensor(m.key + ".trellis", optional=True)
            if t is None:
                continue
            out = {
                "trellis": t,
                "suh": stc.get_tensor(m.key + ".suh"),
                "svh": stc.get_tensor(m.key + ".svh"),
            }
            if not (np.isfinite(np.asarray(out["suh"], np.float32)).all()
                    and np.isfinite(np.asarray(out["svh"], np.float32)).all()):
                # corrupt shard entry (e.g. pre-atomic-write interrupted
                # save): drop it so the caller requantizes this linear
                print(f" !! {m.key}: non-finite saved tensors, requantizing")
                continue
            K = t.shape[-1] // 16
            cb = CB_MCG if stc.has_tensor(m.key + ".mcg") else (
                CB_MUL1 if stc.has_tensor(m.key + ".mul1") else CB_3INST)
            _swap_linear_to_exl3(m, params, out, K, cb)
            for name, arr in out.items():
                shard[f"{m.key}.{name}"] = np.asarray(arr)
            # carry every other saved tensor of this linear (codebook
            # markers, serving-int-B .sq codes, bias) so a mid-module
            # resume's next shard rewrite doesn't drop them
            for extra in ("mcg", "mul1", "sq", "sq_scale", "bias"):
                a = stc.get_tensor(f"{m.key}.{extra}", optional=True)
                if a is not None:
                    shard[f"{m.key}.{extra}"] = np.asarray(a)
    stc.close()
    return shard
