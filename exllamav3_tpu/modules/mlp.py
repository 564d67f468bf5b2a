"""MLP / GatedMLP (feature reference: /root/reference/exllamav3/modules/mlp.py).

Activations (silu/gelu/relu2/xielu) are jnp expressions; XLA fuses the
act*mul into the down-projection epilogue (the reference needed fused CUDA
kernels: activation.cu).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax

from .module import Module, ForwardCtx
from .linear import Linear

ACT2FN = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


def act_mul_clamped(act, gate, up, limit: float):
    """Reference activation_kernels.cuh act_mul with act_limit != 0: clamp the
    up projection to [-L, L] and the activated gate to min(act(g), L)
    (DeepSeek-V4 swiglu_limit)."""
    return jnp.minimum(act(gate), limit) * jnp.clip(up, min=-limit, max=limit)


def act_fn_silu_oai(gate, up, alpha: float = 1.702, limit: float = 7.0):
    """gpt-oss style clamped swiglu (reference activation.cu silu_oai)."""
    gate = jnp.clip(gate, max=limit)
    up = jnp.clip(up, min=-limit, max=limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return (up + 1.0) * glu


def act_fn_xielu(x, alpha_p, alpha_n):
    """Apertus xIELU with learnable positive/negative curvatures
    (reference mlp.py act_xielu_torch:242)."""
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32))
    an = jax.nn.softplus(alpha_n.astype(jnp.float32)) + 0.5
    eps = -9.9838e-07
    return jnp.where(
        x > 0,
        ap * x * x + 0.5 * x,
        (jnp.expm1(jnp.minimum(x, eps)) - x) * an + 0.5 * x,
    )


class GatedMLP(Module):
    def __init__(
        self,
        config,
        key: str,
        hidden_size: int,
        intermediate_size: int,
        key_up: str = "up_proj",
        key_gate: str = "gate_proj",
        key_down: str = "down_proj",
        qmap: str | None = None,
        activation: str = "silu",
        act_clamp: float = 0.0,
        out_dtype=None,
        interm_dtype=None,
        act_silu_oai: bool = False,
        act_limit: float = 0.0,  # non-zero: clamped oai swiglu (step3, gpt-oss)
        key_alpha_p: str | None = None,
        key_alpha_n: str | None = None,
    ):
        super().__init__(config, key, qmap)
        self.activation = activation
        self.act_clamp = act_clamp
        self.act_silu_oai = act_silu_oai or bool(act_limit)
        self.act_limit = act_limit or 7.0
        self.key_alpha_p = key_alpha_p
        self.key_alpha_n = key_alpha_n
        self.out_dtype = out_dtype
        self.up = Linear(config, f"{key}.{key_up}", hidden_size, intermediate_size,
                         qmap=qmap and qmap + ".up")
        self.gate = Linear(config, f"{key}.{key_gate}", hidden_size, intermediate_size,
                           qmap=qmap and qmap + ".up")
        self.down = Linear(config, f"{key}.{key_down}", intermediate_size, hidden_size,
                           qmap=qmap and qmap + ".down")
        self.modules = [self.up, self.gate, self.down]

    def load(self, params: dict) -> None:
        super().load(params)
        if self.activation == "xielu":
            _load_xielu_alphas(self, params)
        self._fused_gu = False
        if getattr(self.config.infer_params, "fuse_projections", False) \
                and self.activation != "xielu":
            from .multilinear import try_fuse

            self._fused_gu = try_fuse(params, self.key, "gate_up",
                                      [self.gate, self.up])

    def refuse(self, params: dict) -> None:
        if getattr(self, "_fused_gu", False) or self.activation == "xielu" \
                or not getattr(self.config.infer_params, "fuse_projections", False):
            return
        from .multilinear import try_fuse

        self._fused_gu = try_fuse(params, self.key, "gate_up",
                                  [self.gate, self.up])

    def unfuse(self, params: dict) -> None:
        if not getattr(self, "_fused_gu", False):
            return
        from .multilinear import unfuse

        n = self.up.out_features
        unfuse(params, self.key, "gate_up", [self.gate, self.up], [n, n])
        self._fused_gu = False

    def forward(self, x, params: dict, ctx: ForwardCtx):
        from ..util.env import mlp_backend

        backend = mlp_backend()
        if backend in ("fused", "interpret"):
            from ..ops.fused_mlp import fused_mlp_eligible, fused_mlp_int8

            T = int(np.prod(x.shape[:-1]))
            if fused_mlp_eligible(self, params, T):
                p = params[self.key]
                pd = params[self.down.key]
                y = fused_mlp_int8(
                    x, p["gate_up_q"], p["gate_up_scale"], pd["weight_q"],
                    pd["scale"], d_bias=pd.get("bias"),
                    activation=self.activation, act_clamp=self.act_clamp,
                    interpret=(backend == "interpret"),
                )
                if self.out_dtype is not None:
                    y = y.astype(self.out_dtype)
                return y
        if getattr(self, "_fused_gu", False):
            from .multilinear import fused_forward

            gu = fused_forward(params, self.key, "gate_up", x)
            inter = gu.shape[-1] // 2
            g, u = gu[..., :inter], gu[..., inter:]
        else:
            g = self.gate.forward(x, params, ctx).astype(jnp.float32)
            u = self.up.forward(x, params, ctx).astype(jnp.float32)
        if self.act_silu_oai:
            h = act_fn_silu_oai(g, u, limit=self.act_limit)
        elif self.activation == "xielu":
            p = params[self.key]
            h = act_fn_xielu(g, p["alpha_p"], p["alpha_n"]) * u
        elif self.act_clamp:
            h = act_mul_clamped(ACT2FN[self.activation], g, u, self.act_clamp)
        else:
            h = ACT2FN[self.activation](g) * u
        h = h.astype(x.dtype)
        y = self.down.forward(h, params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y


class MLP(Module):
    """Non-gated MLP (up -> act -> down)."""

    def __init__(self, config, key: str, hidden_size: int, intermediate_size: int,
                 key_up: str = "up_proj", key_down: str = "down_proj",
                 qmap: str | None = None, activation: str = "gelu", out_dtype=None):
        super().__init__(config, key, qmap)
        self.activation = activation
        self.out_dtype = out_dtype
        self.up = Linear(config, f"{key}.{key_up}", hidden_size, intermediate_size,
                         qmap=qmap and qmap + ".up")
        self.down = Linear(config, f"{key}.{key_down}", intermediate_size, hidden_size,
                           qmap=qmap and qmap + ".down")
        self.modules = [self.up, self.down]
        self.key_alpha_p = None
        self.key_alpha_n = None

    def load(self, params: dict) -> None:
        super().load(params)
        if self.activation == "xielu":
            _load_xielu_alphas(self, params)

    def forward(self, x, params: dict, ctx: ForwardCtx):
        u = self.up.forward(x, params, ctx).astype(jnp.float32)
        if self.activation == "xielu":
            p = params[self.key]
            h = act_fn_xielu(u, p["alpha_p"], p["alpha_n"])
        else:
            h = ACT2FN[self.activation](u)
        y = self.down.forward(h.astype(x.dtype), params, ctx)
        if self.out_dtype is not None:
            y = y.astype(self.out_dtype)
        return y


def _load_xielu_alphas(mod, params: dict) -> None:
    stc = mod.config.stc
    kp = mod.key_alpha_p or f"{mod.key}.act_fn.alpha_p"
    kn = mod.key_alpha_n or f"{mod.key}.act_fn.alpha_n"
    from .gated_delta_net import _get_f32

    params[mod.key] = {
        "alpha_p": jnp.asarray(_get_f32(stc, kp)),
        "alpha_n": jnp.asarray(_get_f32(stc, kn)),
    }
