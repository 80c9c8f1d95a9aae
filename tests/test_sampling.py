"""Sampler / logits-processor semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp

from csm_mlx_tpu.ops.sampling import (
    LogitBias,
    RepetitionPenalty,
    SamplerConfig,
    make_logits_processors,
    make_sampler,
)


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 2.0, -1.0, 0.5]])
    s = SamplerConfig(temperature=0.0)
    assert int(s(jax.random.PRNGKey(0), logits)[0]) == 1


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
    s = make_sampler(temp=1.0, top_k=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    samples = {int(s(k, logits)[0]) for k in keys}
    assert samples <= {3, 4}
    assert len(samples) == 2


def test_top_p_nucleus():
    # p = [0.01, 0.04, 0.2, 0.75] -> top_p=0.8 keeps {3, 2}
    probs = np.array([0.01, 0.04, 0.2, 0.75])
    logits = jnp.asarray(np.log(probs)[None])
    s = make_sampler(temp=1.0, top_p=0.8)
    keys = jax.random.split(jax.random.PRNGKey(1), 300)
    samples = {int(s(k, logits)[0]) for k in keys}
    assert samples <= {2, 3}
    assert 3 in samples


def test_min_p_threshold():
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(probs)[None])
    s = make_sampler(temp=1.0, min_p=0.5)  # keep p >= 0.5 * 0.5 = 0.25
    keys = jax.random.split(jax.random.PRNGKey(2), 300)
    samples = {int(s(k, logits)[0]) for k in keys}
    assert samples <= {0, 1}


def test_min_tokens_to_keep():
    probs = np.array([0.97, 0.01, 0.01, 0.01])
    logits = jnp.asarray(np.log(probs)[None])
    s = make_sampler(temp=1.0, top_p=0.5, min_tokens_to_keep=2)
    keys = jax.random.split(jax.random.PRNGKey(3), 500)
    samples = {int(s(k, logits)[0]) for k in keys}
    assert len(samples) >= 2


def test_temperature_categorical_distribution():
    logits = jnp.asarray([[0.0, jnp.log(3.0)]])  # p = [0.25, 0.75]
    s = SamplerConfig(temperature=1.0)
    keys = jax.random.split(jax.random.PRNGKey(4), 2000)
    samples = np.array([int(s(k, logits)[0]) for k in keys])
    frac = samples.mean()
    assert 0.70 < frac < 0.80


def test_repetition_penalty_only_recent_valid():
    proc = RepetitionPenalty(penalty=2.0, context_size=20)
    logits = jnp.asarray([[1.0, -1.0, 2.0]])
    history = jnp.full((1, 8), -1, dtype=jnp.int32).at[0, -1].set(0)
    out = np.asarray(proc(history, logits))
    np.testing.assert_allclose(out[0], [0.5, -1.0, 2.0])  # token 0 penalized

    empty = jnp.full((1, 8), -1, dtype=jnp.int32)
    out2 = np.asarray(proc(empty, logits))
    np.testing.assert_allclose(out2[0], [1.0, -1.0, 2.0])


def test_logit_bias():
    proc = LogitBias(bias=((1, 5.0), (2, -5.0)))
    logits = jnp.zeros((1, 4))
    out = np.asarray(proc(jnp.full((1, 4), -1), logits))
    np.testing.assert_allclose(out[0], [0.0, 5.0, -5.0, 0.0])


def test_make_logits_processors_factory():
    procs = make_logits_processors(logit_bias={3: 1.0},
                                   repetition_penalty=1.5)
    assert len(procs) == 2
    procs_none = make_logits_processors()
    assert procs_none == ()


def test_temperature_scales_before_nucleus():
    """mlx_lm parity: top_p's nucleus is computed over softmax(logits/temp).
    At temp=0.1 the scaled top token holds >70% of the mass, so top_p=0.7
    keeps ONLY it; filtering unscaled logits would also keep token 1."""
    logits = jnp.asarray([[2.0, 1.9, -10.0, -10.0]])
    s = make_sampler(temp=0.1, top_p=0.7)
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    toks = np.asarray([int(s(k, logits)[0]) for k in keys])
    assert (toks == 0).all(), np.unique(toks)
