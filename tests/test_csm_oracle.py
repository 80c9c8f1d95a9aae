"""Cross-implementation check of the CSM glue against an independent oracle.

`tests/oracle_csm.py` is a numpy transcription of the *reference* code
(models.py:53-92, attention.py, generation.py:21-161) with no code shared
with csm_mlx_tpu. Exact greedy-token agreement between the two over random
weights verifies the CSM-specific semantics (fused audio-table offsets,
masked-sum embed, per-frame decoder restart, frame feedback, EOS) from two
independently-written implementations — the check the in-repo mirrors
(written by the same author as the production code) cannot provide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_args
from csm_mlx_tpu.models.csm import CSM, init_csm_params
from csm_mlx_tpu.generation import generate_frame, generate_tokens

import oracle_csm


@pytest.fixture(scope="module")
def oracle_model():
    """Tiny random CSM with a NON-zero audio_head (the stock init zeroes it,
    which degenerates every decoder argmax to 0)."""
    args = tiny_args()
    params = init_csm_params(jax.random.PRNGKey(7), args, dtype=jnp.float32)
    params["audio_head"] = (
        jax.random.normal(jax.random.PRNGKey(8), params["audio_head"].shape)
        * (args.decoder_dim ** -0.5)
    ).astype(jnp.float32)
    return CSM(args, params=params, dtype=jnp.float32)


def _np_params(model):
    return jax.tree_util.tree_map(np.asarray, model.params)


def _random_prompt(args, s, seed):
    rng = np.random.RandomState(seed)
    prompt = np.zeros((s, args.n_audio_codebooks + 1), dtype=np.int32)
    mask = np.zeros_like(prompt)
    for i in range(s):
        if rng.rand() < 0.5:  # "text row": token in the text slot only
            prompt[i, -1] = rng.randint(1, args.n_text_vocab)
            mask[i, -1] = 1
        else:  # "audio row": tokens in the 32 audio slots
            prompt[i, :-1] = rng.randint(0, args.n_audio_vocab,
                                         args.n_audio_codebooks)
            mask[i, :-1] = 1
    return prompt, mask


def test_oracle_first_frame_exact(oracle_model):
    """Greedy first frame (prefill + 31-step decoder) matches the oracle
    token-for-token."""
    args = oracle_model.args
    prompt, mask = _random_prompt(args, 7, seed=0)

    frame = np.asarray(
        generate_frame(oracle_model, jnp.asarray(prompt[None]),
                       token_mask=jnp.asarray(mask[None]), temperature=0.0)
    )

    cache = [oracle_csm.OracleKVCache()
             for _ in oracle_model.params["backbone"]["layers"]]
    oracle_frame = oracle_csm.generate_frame(
        _np_params(oracle_model), args, prompt[None].astype(np.int64),
        mask[None].astype(np.float32), cache)

    np.testing.assert_array_equal(frame, oracle_frame)


def test_oracle_frame_loop_exact(oracle_model):
    """The full fused generation loop (bucketed left-padding, EOS detection,
    frame feedback with zeroed text column) produces the exact token stream
    of the oracle's literal reference-style python loop."""
    args = oracle_model.args
    prompt, mask = _random_prompt(args, 5, seed=1)
    max_frames = 8

    frames, n = generate_tokens(oracle_model, prompt, mask, max_frames,
                                temperature=0.0)
    oracle_frames = oracle_csm.generate_tokens(
        _np_params(oracle_model), args, prompt, mask, max_frames)

    assert n == oracle_frames.shape[0]
    np.testing.assert_array_equal(frames, oracle_frames)


def test_oracle_stepwise_frame_state_exact(oracle_model):
    """The stateful generate_frame idiom (threading FrameState like the
    reference threads its in-place KV cache) matches the oracle frame by
    frame, including the 1-step feedback path."""
    args = oracle_model.args
    prompt, mask = _random_prompt(args, 4, seed=2)

    np_params = _np_params(oracle_model)
    oracle_cache = [oracle_csm.OracleKVCache()
                    for _ in np_params["backbone"]["layers"]]

    inp_np = prompt[None].astype(np.int64)
    mask_np = mask[None].astype(np.float32)
    state = None
    for step in range(3):
        if state is None:
            state = generate_frame(
                oracle_model, jnp.asarray(inp_np.astype(np.int32)),
                token_mask=jnp.asarray(mask_np.astype(np.int32)),
                temperature=0.0, return_state=True)
        else:
            state = generate_frame(
                oracle_model, jnp.asarray(inp_np.astype(np.int32)),
                token_mask=jnp.asarray(mask_np.astype(np.int32)),
                temperature=0.0, cache=state.cache, key=state.key,
                history=state.history, return_state=True)
        oracle_frame = oracle_csm.generate_frame(
            np_params, args, inp_np, mask_np, oracle_cache)
        np.testing.assert_array_equal(
            np.asarray(state.frame), oracle_frame,
            err_msg=f"frame mismatch at step {step}")
        # feed back (generation.py:156-161)
        frame = oracle_frame
        inp_np = np.concatenate(
            [frame, np.zeros((1, 1), np.int32)], axis=1
        )[:, None, :].astype(np.int64)
        mask_np = np.concatenate(
            [np.ones_like(frame, dtype=np.float32),
             np.zeros((1, 1), np.float32)], axis=1)[:, None, :]


def test_oracle_batch_rows_independent(oracle_model):
    """B=2 prefill: each batch row matches its own B=1 oracle run (the
    batched path must not leak information across rows)."""
    args = oracle_model.args
    p0, m0 = _random_prompt(args, 6, seed=3)
    p1, m1 = _random_prompt(args, 6, seed=4)
    batch_p = np.stack([p0, p1])
    batch_m = np.stack([m0, m1])

    frames = np.asarray(
        generate_frame(oracle_model, jnp.asarray(batch_p),
                       token_mask=jnp.asarray(batch_m), temperature=0.0)
    )

    np_params = _np_params(oracle_model)
    for row, (p, m) in enumerate([(p0, m0), (p1, m1)]):
        cache = [oracle_csm.OracleKVCache()
                 for _ in np_params["backbone"]["layers"]]
        of = oracle_csm.generate_frame(
            np_params, args, p[None].astype(np.int64),
            m[None].astype(np.float32), cache)
        np.testing.assert_array_equal(frames[row: row + 1], of,
                                      err_msg=f"row {row}")
