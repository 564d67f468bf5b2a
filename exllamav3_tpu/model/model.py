"""Model: module-list container, loading, and jitted step functions.

Feature reference: /root/reference/exllamav3/model/model.py (Model:151,
load:469, prefill:187, forward:210). TPU redesign: parameters live in an
explicit pytree; `forward` is a pure function of (params, ids, cache_state,
positions); jit-compiled step functions are cached per static shape bucket
(the analogue of the reference's CUDA-graph slots). Device placement /
sharding is applied to the params pytree by parallel/sharding.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..modules.module import Module, ForwardCtx


class _Root(Module):
    def __init__(self, config, modules):
        super().__init__(config, key="")
        self.modules = modules


# approximate serving bytes per EXL3 weight for each runtime mode, including
# group/channel scales (doc/performance.md runtime-mode table; int8 carries a
# per-output-channel f32 scale — negligible at 8B geometry)
_MODE_BYTES_PER_WEIGHT = {"int8": 1.0, "int6": 0.8125, "int4": 0.5625}
_EXL3_SIDE_SUFFIXES = (".suh", ".svh", ".su", ".sv", ".mcg", ".mul1")


def estimate_linear_mode_bytes(config, mode: str) -> int:
    """Estimated total weight-bytes footprint of the model if all EXL3
    linears load in `mode`, from the safetensors header alone (no reads).
    Dense (non-EXL3) tensors load as bf16 regardless of mode."""
    total = 0
    for key in config.stc.keys():
        if key.endswith(".trellis"):
            s = config.stc.get_shape(key)
            weights = s[0] * s[1] * 256  # (k/16, n/16, 16K) uint16 tiles
            if mode == "fused":
                total += s[0] * s[1] * s[2] * 2  # packed trellis stays put
            else:
                total += int(weights * _MODE_BYTES_PER_WEIGHT[mode])
        elif key.endswith(_EXL3_SIDE_SUFFIXES):
            continue  # sign/rotation vectors: O(k + n) per linear
        else:
            s = config.stc.get_shape(key)
            n = 1
            for d in s:
                n *= d
            total += n * 2
    return total


def device_hbm_bytes() -> int | None:
    """Per-device HBM capacity, or None when unknown (CPU backend).
    EXL3TPU_HBM_BYTES overrides (tests; capacity planning for other chips)."""
    import os

    env = os.environ.get("EXL3TPU_HBM_BYTES")
    if env:
        return int(env)
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return None


def select_linear_mode(config, hbm_bytes: int | None = None,
                       reserve_frac: float = 0.20) -> str:
    """Footprint-driven serving ladder for linear_mode="auto".

    int8 dominates every packed int-B mode on decode speed (measured on the
    v5e bench: ~102 tok/s vs int6 37.7 / int4 75 at 8B geometry —
    doc/performance.md), so the ladder is tiered by FOOTPRINT: pick int8
    whenever the weights fit the device with `reserve_frac` HBM left for
    KV cache + activations, else walk down int6 -> int4 -> fused (the
    capacity mode: format bytes at any bpw). Unknown capacity (CPU backend,
    no EXL3TPU_HBM_BYTES) assumes int8 fits."""
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    if hbm_bytes is None:
        return "int8"
    budget = hbm_bytes * (1.0 - reserve_frac)
    for mode in ("int8", "int6", "int4"):
        if estimate_linear_mode_bytes(config, mode) <= budget:
            return mode
    return "fused"


class Model:
    config_class = None

    def __init__(self, config, **kwargs):
        self.config = config
        self.modules: list[Module] = []
        self.params: dict | None = None
        self.caps = {}
        self._step_cache: dict = {}

    @property
    def root(self) -> Module:
        return _Root(self.config, self.modules)

    @staticmethod
    def from_config(config, component: str = "text", **kwargs) -> "Model":
        """component: "text" (default), "vision" (multimodal tower) or "mtp"
        (draft head), when the architecture provides them."""
        cls = config.model_classes[component]
        return cls(config, **kwargs)

    # -- loading -------------------------------------------------------------

    def load(self, progress_cb=None) -> dict:
        ip = self.config.infer_params
        if ip.linear_mode == "auto" and self.config.stc is not None:
            ip.linear_mode = select_linear_mode(self.config)
        if getattr(ip, "moe_offload", False):
            # reload replaces (not accumulates) this config's host expert RAM
            from . import moe_host

            moe_host.release(id(self.config))
        params: dict = {}
        n = len(self.modules)
        for i, m in enumerate(self.modules):
            m.load(params)
            if progress_cb:
                progress_cb(i + 1, n)
        self.params = params
        return params

    def unload(self):
        self.params = None
        self._step_cache.clear()
        if getattr(self.config.infer_params, "moe_offload", False):
            from . import moe_host

            moe_host.release(id(self.config))

    # -- forward --------------------------------------------------------------

    def forward_modules(self, ids, params: dict, ctx: ForwardCtx,
                        last_module_idx: int | None = None):
        x = ids
        mods = self.modules if last_module_idx is None else self.modules[: last_module_idx + 1]
        for m in mods:
            x = m.forward(x, params, ctx)
        return x

    def step_fn(self, attn_mode: str = "dense", k_bits: int = 0, v_bits: int = 0,
                compand_a: float = 0.0, sp_mesh=None, sp_axis: str = "sp",
                ep_mesh=None, ep_axis: str = "tp",
                return_hidden: bool = False, recurrent_history: bool = False,
                capture_layers: tuple = ()):
        """Pure (params, ids, cache_state, positions, cache_seqlens,
        block_tables) -> (logits, new_cache_state). With return_hidden, also
        returns the pre-final-norm residual stream (for MTP draft heads).
        With recurrent_history, also returns per-step recurrent states
        {layer_key: {"conv": (B,S,C,ks-1), "S": (B,S,H,dk,dv)}} for
        speculative rewind."""

        def fn(params, ids, cache_state, positions, cache_seqlens, block_tables,
               state_slots=None, mm_embeddings=None, mrope_positions=None):
            ctx = ForwardCtx(
                positions=positions,
                attn_mode=attn_mode,
                cache=dict(cache_state) if cache_state is not None else None,
                block_tables=block_tables,
                cache_seqlens=cache_seqlens,
                k_bits=k_bits,
                v_bits=v_bits,
                compand_a=compand_a,
                state_slots=state_slots,
            )
            if sp_mesh is not None:
                # sequence-parallel serving (parallel/sp.py): attention
                # modules run their paged path as a shard_map island
                ctx.extras["sp"] = (sp_mesh, sp_axis)
            if ep_mesh is not None:
                # expert-parallel decode: BlockSparseMLP runs its routed
                # compute as a shard_map island over the expert-sharded
                # stacked tensors (selected-expert kernel per shard + psum)
                ctx.extras["ep"] = (ep_mesh, ep_axis)
            if mm_embeddings is not None:
                ctx.extras["mm_embeddings"] = mm_embeddings
            if mrope_positions is not None:
                # (B, S, 3) t/h/w rope streams for image-token spans; the
                # plain positions still index the KV cache and masks
                ctx.extras["mrope_positions"] = mrope_positions
            if hasattr(ids, "dtype") and jnp.issubdtype(ids.dtype, jnp.integer):
                ctx.extras["input_ids"] = ids  # hash-MoE / value embeddings
            rec_hist = None
            if recurrent_history:
                rec_hist = {}
                ctx.extras["recurrent_history"] = rec_hist
            if capture_layers:
                # residual stream after selected blocks (DFlash draft input);
                # indices are block numbers (0-based transformer layers)
                caps: list = []
                x = ids
                want = set(capture_layers)
                for mi, m in enumerate(self.modules):
                    x = m.forward(x, params, ctx)
                    li = mi - self.first_block_idx
                    if li in want:
                        caps.append(x)
                new_state = ctx.cache if cache_state is not None else None
                return x, caps, new_state
            if return_hidden:
                # run up to (excluding) the final norm + head; the residual
                # stream there is what MTP heads consume
                x = ids
                for m in self.modules[: self.logit_layer_idx - 1]:
                    x = m.forward(x, params, ctx)
                hidden = x
                for m in self.modules[self.logit_layer_idx - 1 :]:
                    x = m.forward(x, params, ctx)
                new_state = ctx.cache if cache_state is not None else None
                if recurrent_history:
                    return x, hidden, new_state, rec_hist
                return x, hidden, new_state
            logits = self.forward_modules(ids, params, ctx)
            new_state = ctx.cache if cache_state is not None else None
            if recurrent_history:
                return logits, new_state, rec_hist
            return logits, new_state

        return fn

    def jitted_step(self, attn_mode: str = "dense", donate_cache: bool = True,
                    k_bits: int = 0, v_bits: int = 0, compand_a: float = 0.0):
        key = (attn_mode, donate_cache, k_bits, v_bits, compand_a)
        if key not in self._step_cache:
            fn = self.step_fn(attn_mode, k_bits, v_bits, compand_a)
            donate = (2,) if donate_cache else ()
            self._step_cache[key] = jax.jit(fn, donate_argnums=donate)
        return self._step_cache[key]

    # -- convenience ------------------------------------------------------------

    def prefill(self, ids: np.ndarray, cache, positions=None):
        """Run ids (B, S) through the model, updating cache; returns logits of
        the last position. Linear-cache convenience path."""
        B, S = ids.shape
        if positions is None:
            positions = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
        step = self.jitted_step("dense")
        logits, cache.state = step(
            self.params,
            jnp.asarray(ids),
            cache.state,
            jnp.asarray(positions),
            jnp.asarray(positions[:, :1].reshape(B)),
            None,
        )
        return logits

    def forward_simple(self, ids: np.ndarray, jit: bool = True):
        """Cacheless full forward (eval / conversion advance)."""
        B, S = ids.shape
        if not jit:
            positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
            ctx = ForwardCtx(positions=positions)
            ctx.extras["input_ids"] = jnp.asarray(ids)
            return self.forward_modules(jnp.asarray(ids), self.params, ctx)
        if "cacheless" not in self._step_cache:

            def fn(params, ids):
                b, s = ids.shape
                positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
                ctx = ForwardCtx(positions=positions)
                ctx.extras["input_ids"] = ids
                return self.forward_modules(ids, params, ctx)

            self._step_cache["cacheless"] = jax.jit(fn)
        return self._step_cache["cacheless"](self.params, jnp.asarray(ids))
