"""Jittable samplers and logits processors.

Implements the *documented* sampling surface of the reference (README.md:49,
`cli/generate.py:168-174`): a pluggable sampler supporting
temperature / top-p / min-p / top-k / min-tokens-to-keep, plus a
logits-processor chain (repetition penalty, logit bias) with token-history
carry (cf. `c0_history`, `generation.py:30`). The reference shipped with a
`sampler=` TypeError bug (generation.py:95-104 never accepted it); here both
`sampler=` and `temperature=` work.

Everything is a pure function of (rng key, logits) so it can live inside the
fully-jitted frame loop. History is a fixed-size ring with a valid count —
static shapes, no recompiles as generation proceeds. Sampling math runs in
fp32 (categorical over *unnormalized* logits, matching
`mx.random.categorical` semantics at generation.py:54).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# The c0 token-history carried through the compiled generation loop is a
# fixed ring of this many entries (the reference's history grows
# unboundedly; a jit carry cannot). Processors must not ask for more.
HISTORY_SIZE = 64  # >= mlx_lm's default repetition window of 20

NEG_INF = jnp.float32(-1e30)

# A sampler maps (key, logits (B, V) fp32) -> tokens (B,) int32.
Sampler = Callable[[jax.Array, jax.Array], jax.Array]
# A processor maps (history (B, H) int32 padded with -1, logits) -> logits.
LogitsProcessor = Callable[[jax.Array, jax.Array], jax.Array]


def _top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _min_p_filter(logits: jax.Array, min_p: float, min_tokens_to_keep: int) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= min_p * top
    if min_tokens_to_keep > 1:
        kth = jax.lax.top_k(logits, min_tokens_to_keep)[0][..., -1:]
        keep = keep | (logits >= kth)
    return jnp.where(keep, logits, NEG_INF)


def _top_p_filter(logits: jax.Array, top_p: float, min_tokens_to_keep: int) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # A token is inside the nucleus if the cumulative mass *before* it is
    # still < top_p; the first token is always kept.
    in_nucleus = (cum - probs) < top_p
    keep_n = jnp.maximum(in_nucleus.sum(axis=-1, keepdims=True), min_tokens_to_keep)
    threshold = jnp.take_along_axis(sorted_logits, keep_n - 1, axis=-1)
    return jnp.where(logits < threshold, NEG_INF, logits)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Hashable sampler description — safe as a jit static argument."""

    temperature: float = 0.8
    top_p: float = 0.0
    min_p: float = 0.0
    top_k: int = 0
    min_tokens_to_keep: int = 1

    def __call__(self, key: jax.Array, logits: jax.Array) -> jax.Array:
        logits = logits.astype(jnp.float32)
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # Temperature scales BEFORE the probability-mass filters, matching
        # mlx_lm's samplers (top_p/min_p compute their nucleus over
        # softmax(logits/temp)); filtering unscaled logits would select a
        # different nucleus for every temperature != 1.
        logits = logits / self.temperature
        if self.top_k > 0:
            logits = _top_k_filter(logits, self.top_k)
        if self.min_p > 0.0:
            logits = _min_p_filter(logits, self.min_p, self.min_tokens_to_keep)
        if 0.0 < self.top_p < 1.0:
            logits = _top_p_filter(logits, self.top_p, self.min_tokens_to_keep)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def make_sampler(
    temp: float = 0.8,
    top_p: float = 0.0,
    min_p: float = 0.0,
    top_k: int = 0,
    min_tokens_to_keep: int = 1,
) -> SamplerConfig:
    """Reference-documented factory (README.md:30, cli/generate.py:168-174)."""
    return SamplerConfig(
        temperature=temp,
        top_p=top_p,
        min_p=min_p,
        top_k=top_k,
        min_tokens_to_keep=min_tokens_to_keep,
    )


@dataclasses.dataclass(frozen=True)
class RepetitionPenalty:
    """Divide/multiply logits of recently generated tokens by `penalty`.

    History entries of -1 (padding) are ignored; only the most recent
    `context_size` valid entries count, matching mlx_lm's processor.
    """

    penalty: float = 1.3
    context_size: int = 20

    def __call__(self, history: jax.Array, logits: jax.Array) -> jax.Array:
        if history.ndim == 1:
            history = history[None]
        b, v = logits.shape
        h = history.shape[-1]
        # Mask of "token t appears in the recent window" per batch row.
        recent = history[:, max(0, h - self.context_size):]
        valid = recent >= 0
        onehot = jax.nn.one_hot(
            jnp.where(valid, recent, 0), v, dtype=jnp.bool_
        ) & valid[..., None]
        seen = onehot.any(axis=1)
        penalized = jnp.where(
            logits > 0, logits / self.penalty, logits * self.penalty
        )
        return jnp.where(seen, penalized, logits)


@dataclasses.dataclass(frozen=True)
class LogitBias:
    """Additive per-token bias (README.md:122's logit-bias example)."""

    bias: Tuple[Tuple[int, float], ...]

    def __call__(self, history: jax.Array, logits: jax.Array) -> jax.Array:
        tokens = jnp.asarray([t for t, _ in self.bias], dtype=jnp.int32)
        values = jnp.asarray([v for _, v in self.bias], dtype=logits.dtype)
        return logits.at[..., tokens].add(values)


def make_logits_processors(
    logit_bias: Optional[dict] = None,
    repetition_penalty: Optional[float] = None,
    repetition_context_size: int = 20,
) -> Tuple[LogitsProcessor, ...]:
    """mlx_lm-parity factory for the processor chain."""
    processors = []
    if logit_bias:
        processors.append(LogitBias(tuple(sorted(logit_bias.items()))))
    if repetition_penalty and repetition_penalty != 1.0:
        if repetition_context_size > HISTORY_SIZE:
            # The compiled loop carries a fixed 64-entry history ring; a
            # larger window would be silently capped — fail loudly instead.
            raise ValueError(
                f"repetition_context_size={repetition_context_size} exceeds "
                f"the generation loop's history ring (HISTORY_SIZE="
                f"{HISTORY_SIZE})")
        processors.append(
            RepetitionPenalty(repetition_penalty, repetition_context_size)
        )
    return tuple(processors)


def apply_processors(
    processors: Sequence[LogitsProcessor],
    history: jax.Array,
    logits: jax.Array,
) -> jax.Array:
    for proc in processors:
        logits = proc(history, logits)
    return logits
