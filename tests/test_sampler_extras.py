"""Sampler breadth: XTC, logit bias, token bans — single and batched paths."""
import numpy as np
import jax
import jax.numpy as jnp

from exllamav3_tpu.generator.sampler import (
    Sampler, SS_XTC, SS_LogitBias, SS_BanTokens, SS_Temperature,
)
from exllamav3_tpu.generator.batch_sampler import BatchSamplerParams, batch_sample


def test_xtc_drops_top_choices():
    # three dominant tokens; XTC must keep only the least likely of them
    logits = jnp.asarray(np.array([[10.0, 9.5, 9.0, 0.0, -1.0]]))
    s = Sampler(steps=(SS_XTC(threshold=0.05, probability=1.0),))
    key = jax.random.PRNGKey(0)
    toks = [int(s.sample(logits, jax.random.fold_in(key, i))[0]) for i in range(20)]
    # tokens 0 and 1 (more likely than the least-likely above-threshold) gone
    assert 0 not in toks and 1 not in toks
    assert 2 in toks  # the survivor of the top group


def test_logit_bias_and_bans():
    logits = jnp.asarray(np.array([[5.0, 4.0, 3.0, 2.0]]))
    s = Sampler(steps=(SS_BanTokens(tokens=(0,)),), greedy=True)
    assert int(s.sample(logits, jax.random.PRNGKey(0))[0]) == 1
    s2 = Sampler(steps=(SS_LogitBias(bias=((3, 10.0),)),), greedy=True)
    assert int(s2.sample(logits, jax.random.PRNGKey(0))[0]) == 3


def test_batch_xtc():
    rng = np.random.default_rng(0)
    V = 512
    logits = np.full((2, V), -5.0, np.float32)
    logits[:, 0] = 10.0
    logits[:, 1] = 9.0
    logits[:, 2] = 8.0
    sp = BatchSamplerParams.from_samplers([
        Sampler(steps=(SS_XTC(threshold=0.01, probability=1.0),)),
        Sampler(steps=()),  # row 1: no xtc
    ]).as_device()
    counts = jnp.zeros((2, V), jnp.int32)
    toks = np.array([
        np.asarray(batch_sample(jnp.asarray(logits), sp, counts,
                                jax.random.PRNGKey(i)))
        for i in range(24)
    ])
    assert 0 not in toks[:, 0] and 1 not in toks[:, 0]  # xtc row
    assert (toks[:, 1] == 0).mean() > 0.5  # plain row keeps the argmax
