"""Standard CLI argument surface for examples/eval scripts.

Feature reference: /root/reference/exllamav3/model_init.py (add_args:11,
init:52-120). TP flags map to mesh axes instead of GPU splits.
"""
from __future__ import annotations

import argparse


def add_args(p: argparse.ArgumentParser, cache: bool = True, draft: bool = True,
             sampling: bool = True):
    p.add_argument("-m", "--model_dir", required=True, help="model directory")
    p.add_argument("-or", "--override", dest="override",
                   help="tensor-override YAML: {overrides: [{glob: 'model dir'"
                        "}]} maps key globs to alternate checkpoints "
                        "(reference -or / VariantSafetensorsCollection)")
    p.add_argument("--linear_mode", default="auto",
                   choices=["auto", "fused", "int3", "int4", "int5", "int6",
                            "int8", "bf16", "reconstruct"],
                   help="EXL3 runtime representation")
    p.add_argument("--moe_offload", action="store_true",
                   help="host-offload MoE expert stacks to CPU RAM as int8 "
                        "(capacity mode; reference moe_cpu_host.py)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel ways (mesh)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel ways (mesh)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ways: the generator's paged cache "
                        "shards its page dim over this many devices "
                        "(doc/parallelism.md; GQA K/V and MLA latents)")
    if cache:
        p.add_argument("-cs", "--cache_size", type=int, default=16384,
                       help="total KV cache tokens")
        p.add_argument("-ck", "--cache_k_bits", type=int, default=0,
                       help="quantized cache K bits (0=off, 2-8)")
        p.add_argument("-cv", "--cache_v_bits", type=int, default=0,
                       help="quantized cache V bits")
        p.add_argument("-cc", "--cache_compand", type=float, default=0.0,
                       help="cubic compander coefficient for the quantized "
                            "cache (reference compand_a; try 0.65)")
    if draft:
        p.add_argument("-dm", "--draft_model_dir",
                       help="draft model for SD (DFlash drafters auto-detect)")
        p.add_argument("--ngram", action="store_true", help="n-gram drafting")
        p.add_argument("--mtp", action="store_true",
                       help="use the checkpoint's MTP head for drafting")
        p.add_argument("--draft_tokens", type=int, default=4)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--cpu_cache_gb", type=float, default=0.0,
                   help="host-RAM second-tier page cache size")
    p.add_argument("--swa_ring", action="store_true",
                   help="sliding-window layers on fixed rings (less memory)")
    p.add_argument("--recurrent_cache_gb", type=float, default=0.0,
                   help="host-RAM LRU for recurrent-state checkpoints")
    if sampling:
        # reference model_init.py sampling surface (-temp/-topk/-topp/...)
        p.add_argument("-temp", "--temperature", type=float, default=0.8)
        p.add_argument("-topk", "--top_k", type=int, default=0)
        p.add_argument("-topp", "--top_p", type=float, default=1.0)
        p.add_argument("-minp", "--min_p", type=float, default=0.08)
        p.add_argument("-repp", "--repetition_penalty", type=float, default=1.0)
        p.add_argument("-presp", "--presence_penalty", type=float, default=0.0)
        p.add_argument("-freqp", "--frequency_penalty", type=float, default=0.0)
        p.add_argument("--adaptive_target", type=float, default=1.0,
                       help="adaptive-p target probability (<1 enables)")
        p.add_argument("--adaptive_decay", type=float, default=0.0)
        p.add_argument("--greedy", action="store_true")
    return p


def get_arg_sampler(args):
    """Sampler from the standard CLI args (reference get_arg_sampler)."""
    from .generator.sampler import CustomSampler, GreedySampler

    if getattr(args, "greedy", False) or getattr(args, "temperature", 0.8) == 0:
        return GreedySampler()
    return CustomSampler(
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        rep_p=args.repetition_penalty,
        presence_p=args.presence_penalty,
        frequency_p=args.frequency_penalty,
        adaptive_p=args.adaptive_target,
        adaptive_decay=args.adaptive_decay,
    )


def init(args, load: bool = True):
    """Build (model, config, cache, tokenizer, generator_kwargs) from args."""
    from .model import Config, Model, InferParams, Cache, CacheSpec
    from .constants import PAGE_SIZE

    if getattr(args, "moe_offload", False) and (
            getattr(args, "tp", 1) * getattr(args, "dp", 1) > 1):
        # the host callback executes per shard with locally-sharded operands
        # but a global result shape under GSPMD — offload is single-device
        # capacity mode (the reference's CPU host is likewise per-process)
        raise ValueError("--moe_offload is a single-device capacity mode and "
                         "cannot be combined with --tp/--dp > 1")
    config = Config.from_directory(
        args.model_dir, infer_params=InferParams(
            linear_mode=args.linear_mode,
            moe_offload=getattr(args, "moe_offload", False))
    )
    if getattr(args, "override", None):
        config.stc = _apply_overrides(config.stc, args.override)
    model = Model.from_config(config)
    if load:
        model.load()
        if args.tp > 1 or args.dp > 1:
            import jax
            from .parallel.sharding import make_mesh, shard_params

            mesh = make_mesh(jax.devices()[: args.tp * args.dp],
                             dp=args.dp, tp=args.tp)
            model.params = shard_params(model.params, mesh)
            model.mesh = mesh

    tokenizer = None
    try:
        from .tokenizer import Tokenizer

        tokenizer = Tokenizer(args.model_dir)
    except Exception:
        pass

    cache = None
    gen_kwargs = {}
    if hasattr(args, "cache_size"):
        num_pages = max(args.cache_size // PAGE_SIZE, 2)
        cache = Cache(model, CacheSpec(
            layout="paged", num_pages=num_pages,
            k_bits=args.cache_k_bits, v_bits=args.cache_v_bits,
            compand_a=getattr(args, "cache_compand", 0.0),
            swa_ring=getattr(args, "swa_ring", False),
            recurrent_slots=args.max_batch + 1,
        ))
        gen_kwargs.update(k_bits=args.cache_k_bits, v_bits=args.cache_v_bits,
                          max_batch_size=args.max_batch)
        if getattr(args, "sp", 1) > 1:
            import jax
            from jax.sharding import Mesh
            import numpy as np

            gen_kwargs.update(sp_mesh=Mesh(
                np.asarray(jax.devices()[: args.sp]), axis_names=("sp",)))
    if getattr(args, "cpu_cache_gb", 0):
        gen_kwargs.update(cpu_cache_bytes=int(args.cpu_cache_gb * (1 << 30)))
    if getattr(args, "recurrent_cache_gb", 0):
        gen_kwargs.update(
            recurrent_cache_bytes=int(args.recurrent_cache_gb * (1 << 30)))
    if getattr(args, "mtp", False) and "mtp" in config.model_classes:
        mtp = Model.from_config(config, component="mtp")
        if load:
            mtp.load()
        gen_kwargs.update(mtp_model=mtp, num_draft_tokens=args.draft_tokens)
    if getattr(args, "draft_model_dir", None):
        dconfig = Config.from_directory(args.draft_model_dir)
        draft = Model.from_config(dconfig)
        if load:
            draft.load()
        gen_kwargs.update(draft_model=draft, num_draft_tokens=args.draft_tokens)
    if getattr(args, "ngram", False):
        gen_kwargs.update(use_ngram_draft=True, num_draft_tokens=args.draft_tokens)

    return model, config, cache, tokenizer, gen_kwargs


def _apply_overrides(stc, yaml_path: str):
    """Wrap the collection with per-glob overlays from a YAML file
    (reference examples/overrides.yaml: {overrides: [{"model.layers.0.*":
    "/path/to/variant"}, ...]} or a flat {glob: dir} mapping)."""
    import yaml

    from .loader.safetensors import SafetensorsCollection, VariantSafetensorsCollection

    with open(yaml_path) as f:
        spec = yaml.safe_load(f) or {}
    entries = spec.get("overrides", spec)
    if isinstance(entries, dict):
        entries = [entries]
    var = VariantSafetensorsCollection(stc)
    for entry in entries:
        for glob_pat, directory in entry.items():
            var.add_overlay(glob_pat, SafetensorsCollection(directory))
    return var
