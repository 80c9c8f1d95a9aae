"""Continuous batching engine (csm_mlx_tpu/continuous.py).

The load-bearing claim is EXACT token parity: a request admitted into a
running batch mid-flight — spliced into a recycled row of a shared KV cache
via the virtual-left-pad trick — must produce the same greedy tokens as a
fresh one-shot `generate_tokens` run. Also covered: slot recycling across
more requests than slots, in-place cache compaction (rebase), the decode-
behind codec path with per-row Mimi state recycling, and zero-frame EOS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import tiny_args
from csm_mlx_tpu.continuous import ContinuousEngine
from csm_mlx_tpu.generation import generate_tokens
from csm_mlx_tpu.models.csm import CSM


@pytest.fixture(scope="module")
def model():
    return CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
               rng=jax.random.PRNGKey(0))


def _prompt(args, s, seed=0):
    rng = np.random.RandomState(seed)
    k = args.n_audio_codebooks + 1
    prompt = np.zeros((s, k), dtype=np.int32)
    prompt[:, -1] = rng.randint(3, 200, size=s)
    mask = np.zeros((s, k), dtype=np.int32)
    mask[:, -1] = 1
    return prompt, mask


def _solo(model, prompt, mask, max_frames):
    frames, n = generate_tokens(model, prompt, mask, max_frames,
                                temperature=0.0)
    return np.asarray(frames[:int(n)])


def _engine(model, **kw):
    kw.setdefault("n_slots", 2)
    kw.setdefault("max_frames", 12)
    kw.setdefault("max_prompt_bucket", 32)
    kw.setdefault("capacity_slack", 16)
    kw.setdefault("codec", False)
    # 3 frames per dispatched block: exercises caps/EOS landing mid-block
    # AND on block edges across the varying max_frames used below.
    kw.setdefault("frames_per_step", 3)
    kw.setdefault("key", jax.random.PRNGKey(7))
    return ContinuousEngine(model, **kw)


def test_single_request_matches_generate_tokens(model):
    eng = _engine(model, frames_per_step=1)  # K=1: per-frame stepping
    p, m = _prompt(model.args, 5, seed=1)
    res = eng.submit_prompt(p, m, max_frames=6)
    eng.run_until_idle()
    got = res.wait(timeout=0)
    np.testing.assert_array_equal(got, _solo(model, p, m, 6))
    assert eng.stats.completed == 1


def test_midflight_admission_parity(model):
    """A row admitted while another is mid-generation produces exactly the
    tokens of a fresh solo run — the virtual-left-pad splice is exact."""
    eng = _engine(model)
    pa, ma = _prompt(model.args, 5, seed=2)
    pb, mb = _prompt(model.args, 7, seed=3)
    ra = eng.submit_prompt(pa, ma, max_frames=12)
    for _ in range(4):  # A runs several frames before B exists
        assert eng._drive_once()
    steps_before_b = eng.stats.steps
    assert steps_before_b >= 4
    rb = eng.submit_prompt(pb, mb, max_frames=5)
    eng.run_until_idle()
    np.testing.assert_array_equal(ra.wait(0), _solo(model, pa, ma, 12))
    np.testing.assert_array_equal(rb.wait(0), _solo(model, pb, mb, 5))
    assert eng.stats.admissions == 2


def test_slot_reuse_many_requests(model):
    """5 mixed-length requests through 2 slots: every stream recycles a row
    (fresh pad splice, history reset) and still matches its solo run."""
    eng = _engine(model, pipeline_depth=3)
    reqs = []
    for i, mf in enumerate([3, 7, 2, 5, 4]):
        p, m = _prompt(model.args, 4 + i, seed=10 + i)
        reqs.append((eng.submit_prompt(p, m, max_frames=mf), p, m, mf))
    eng.run_until_idle()
    for res, p, m, mf in reqs:
        np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, mf))
    assert eng.stats.completed == 5
    assert eng.stats.admissions == 5


def test_rebase_compaction_parity(model):
    """With a deliberately tiny cache the engine must compact (roll) the
    slot axis mid-service; positions are pad-relative so tokens still match
    solo runs exactly."""
    eng = _engine(model, max_frames=8, capacity_slack=4)
    assert eng.capacity == 32 + 8 + 4
    reqs = []
    for i in range(6):
        p, m = _prompt(model.args, 5 + (i % 3), seed=20 + i)
        reqs.append((eng.submit_prompt(p, m, max_frames=8), p, m))
    eng.run_until_idle()
    assert eng.stats.rebases >= 1
    for res, p, m in reqs:
        np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, 8))


def test_zero_frame_eos_via_sampler(model):
    """A sampler that emits all-zero frames makes every stream EOS before
    its first step: the admit-time EOS path must complete the request with
    zero frames and free the slot."""
    zero_sampler = lambda key, logits: jnp.zeros(logits.shape[:-1],
                                                 dtype=jnp.int32)
    eng = _engine(model, sampler=zero_sampler)
    p, m = _prompt(model.args, 5, seed=30)
    r1 = eng.submit_prompt(p, m, max_frames=6)
    r2 = eng.submit_prompt(p, m, max_frames=6)
    eng.run_until_idle()
    assert r1.wait(0).shape[0] == 0
    assert r2.wait(0).shape[0] == 0
    assert eng.stats.completed == 2


def test_max_frames_one_caps_at_admission(model):
    """The per-request cap must bind from the very first frame: the admit
    path appends frame 0, so max_frames=1 finishes there (reason 'cap')
    with exactly one frame — not two."""
    eng = _engine(model)
    p, m = _prompt(model.args, 5, seed=4)
    res = eng.submit_prompt(p, m, max_frames=1)
    eng.run_until_idle()
    got = res.wait(timeout=0)
    assert got.shape[0] == 1
    assert res.finish_reason == "cap"
    np.testing.assert_array_equal(got, _solo(model, p, m, 1))


def test_max_frames_one_with_codec_flushes_chunk(model):
    """Cap-at-admission with the codec on: the single frame's decode-behind
    chunk (computed by the next step block) must still be delivered before
    the stream finishes."""
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    eng = _engine(model, n_slots=1, codec=True)
    p, m = _prompt(model.args, 5, seed=5)
    res = eng.submit_prompt(p, m, max_frames=1)
    eng.run_until_idle()
    assert res.wait(0).shape[0] == 1
    assert res.finish_reason == "cap"
    assert res.audio().shape[0] == eng._mimi.frame_size
    tok_mod.get_audio_tokenizer.cache_clear()


def test_max_frames_zero_rejected(model):
    eng = _engine(model)
    p, m = _prompt(model.args, 5)
    with pytest.raises(ValueError, match="max_frames"):
        eng.submit_prompt(p, m, max_frames=0)


def test_submit_after_engine_death_raises(model):
    """Once the drive loop dies the carry is unusable: submits must fail
    fast instead of enqueueing work nobody will drive."""
    eng = _engine(model)
    eng._dead = RuntimeError("device error")
    p, m = _prompt(model.args, 5)
    with pytest.raises(RuntimeError, match="died"):
        eng.submit_prompt(p, m)


def test_first_chunk_latency_instrumentation(model):
    """A codec stream populates the rolling first-chunk latency
    reservoirs (admission->first-chunk and submit->first-chunk) and the
    /stats summary returns sane, ordered percentiles."""
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    eng = _engine(model, n_slots=1, codec=True)
    assert eng.stats.first_chunk_latency_ms()["admit_p50_ms"] is None
    p, m = _prompt(model.args, 5, seed=9)
    res = eng.submit_prompt(p, m, max_frames=2)
    eng.run_until_idle()
    res.wait(0)
    assert res.t_submit is not None
    assert res.t_admitted is not None and res.t_admitted >= res.t_submit
    assert res.t_first_chunk is not None
    assert res.t_first_chunk >= res.t_admitted
    lat = eng.stats.first_chunk_latency_ms()
    assert lat["admit_p50_ms"] is not None and lat["admit_p50_ms"] > 0
    assert lat["submit_p50_ms"] >= lat["admit_p50_ms"]
    assert lat["admit_p99_ms"] >= lat["admit_p50_ms"]
    assert len(eng.stats.admit_to_first_chunk) == 1
    tok_mod.get_audio_tokenizer.cache_clear()


def test_quantized_codec_engine_close_to_f32(model):
    """quantize_codec=True: same greedy tokens (generation untouched), audio
    differs from the f32-codec engine only by W8A8 decode quantization
    noise; the process-wide cached tokenizer stays unquantized (its encode
    and any other decode users must remain exact f32)."""
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    p, m = _prompt(model.args, 5, seed=6)

    eng_q = _engine(model, n_slots=1, codec=True, quantize_codec=True)
    rq = eng_q.submit_prompt(p, m, max_frames=3)
    eng_q.run_until_idle()
    aq = rq.audio()
    toks_q = rq.wait(0)

    eng_f = _engine(model, n_slots=1, codec=True)
    rf = eng_f.submit_prompt(p, m, max_frames=3)
    eng_f.run_until_idle()
    af = rf.audio()

    np.testing.assert_array_equal(toks_q, rf.wait(0))
    assert aq.shape == af.shape
    rel = float(np.sqrt(np.mean((aq - af) ** 2))
                / (np.sqrt(np.mean(af ** 2)) + 1e-12))
    assert 0 < rel < 0.15, rel

    mimi = tok_mod.get_audio_tokenizer(model.args.n_audio_codebooks)
    assert "weight_q" not in mimi.params["decoder"]["init"]
    assert "weight_q" in eng_q._mimi_params["decoder"]["init"]
    tok_mod.get_audio_tokenizer.cache_clear()


def test_audio_and_chunks_consumable_repeatedly(model):
    """The end sentinel is re-enqueued so a second consumer (audio() after
    a chunks() loop, or audio() twice) terminates instead of hanging."""
    eng = _engine(model)
    p, m = _prompt(model.args, 5, seed=6)
    res = eng.submit_prompt(p, m, max_frames=2)
    eng.run_until_idle()
    res.wait(0)
    assert list(res.chunks()) == []  # codec off: no chunks, just sentinel
    assert res.audio().shape == (0,)
    assert res.audio().shape == (0,)  # and again — must not block


def test_fail_all_finishes_flush_pending_requests(model):
    """A cap-finished row whose last chunk is still in flight (slot.req is
    None but prov_req set) must be failed by _fail_all, not leaked as a
    forever-pending consumer."""
    from csm_mlx_tpu.continuous import ContinuousResult

    eng = _engine(model)
    res = ContinuousResult(4, model.args.n_audio_codebooks)
    slot = eng._slots[0]
    slot.req, slot.prov_req, slot.flush_step = None, res, 3
    eng._fail_all(RuntimeError("stopped"))
    assert res.done.is_set()
    assert slot.flush_step is None
    with pytest.raises(RuntimeError):
        res.wait(0)


def test_fail_all_covers_readmitted_flush_pending(model):
    """A cap-finished request whose slot was RE-ADMITTED (prov_req now the
    new request) exists only in the in-flight payloads; _fail_all must scan
    those too or its consumer hangs forever on the end sentinel."""
    from csm_mlx_tpu.continuous import ContinuousResult

    eng = _engine(model)
    old = ContinuousResult(4, model.args.n_audio_codebooks)
    new = ContinuousResult(4, model.args.n_audio_codebooks)
    admitted = ContinuousResult(4, model.args.n_audio_codebooks)
    slot = eng._slots[0]
    slot.req, slot.prov_req, slot.flush_step = new, new, None
    # `old` rides an unfetched step block; `admitted` an unfetched admit.
    eng._inflight.append(("step", ([(old, 3), (None, 0)], 5), None))
    eng._inflight.append(("admit", ([(1, admitted)], 6), None))
    eng._fail_all(RuntimeError("stopped"))
    for res in (old, new, admitted):
        assert res.done.is_set()
        with pytest.raises(RuntimeError):
            res.wait(0)
    assert not eng._inflight


def test_mimi_rebase_keeps_index_bounded(model):
    """The Mimi ring index advances `downsample_stride` TOKENS per frame;
    the periodic rebase must compute its shift in token units or the index
    grows ~1/frame forever and rotary phases eventually lose precision."""
    import dataclasses
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    eng = _engine(model, n_slots=1, codec=True)
    stride = eng._mimi.cfg.downsample_stride
    w = int(eng._dec_state.transformer.window)

    def advance(frames):
        # Simulate `frames` dispatched frames: the engine's counters plus
        # the device-side index exactly as mimi_decode_step_fn advances it.
        eng._frames_total += frames
        tr = eng._dec_state.transformer
        eng._dec_state = dataclasses.replace(
            eng._dec_state,
            transformer=dataclasses.replace(
                tr, index=tr.index + stride * frames))

    for _epoch in range(3):
        advance(eng._MIMI_REBASE_AT)
        eng._maybe_rebase()
        idx = int(eng._dec_state.transformer.index)
        # Exact bookkeeping: index == stride*frames - applied shift ...
        assert idx == stride * eng._frames_total - eng._mimi_rebased
        # ... and bounded: the residue lands in [2w, 3w) after EVERY epoch
        # (the frame-unit bug instead kept a residue that grew ~1/frame).
        assert 2 * w <= idx < 3 * w
    tok_mod.get_audio_tokenizer.cache_clear()


def test_capacity_slack_must_cover_step_block(model):
    with pytest.raises(ValueError, match="capacity_slack"):
        _engine(model, capacity_slack=2, frames_per_step=3)


@pytest.mark.slow
def test_codec_continuity_on_recycled_row(model, monkeypatch):
    """With the fused decode-behind codec, a stream on a recycled row must
    produce the same audio as a fresh batch Mimi decode of its tokens (the
    per-row ring `start` hides the dead predecessor's sliding window; the
    conv carries reset to zeros)."""
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    eng = _engine(model, n_slots=1, codec=True, max_frames=6)
    mimi = eng._mimi

    outs = []
    for i in range(2):  # request 2 recycles request 1's only slot
        p, m = _prompt(model.args, 5, seed=40 + i)
        outs.append(eng.submit_prompt(p, m, max_frames=6))
    eng.run_until_idle()
    for res in outs:
        tokens = res.wait(0)
        assert tokens.shape[0] > 0
        audio = res.audio()
        assert audio.shape[0] == tokens.shape[0] * mimi.frame_size
        codes = jnp.asarray(tokens.T[None], dtype=jnp.int32)
        ref = np.asarray(mimi.decode(codes))[0, 0]
        scale = max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(audio, ref, atol=2e-3 * scale)
    tok_mod.get_audio_tokenizer.cache_clear()

@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_random_admissions_and_cancels_match_solo(model, seed):
    """Seeded stress run: random prompt lengths, admission times, frame
    caps, and mid-flight cancels — every COMPLETED stream must still match
    its solo generate_tokens run token-for-token (the engine's core
    exactness claim under schedules no structured test enumerates)."""
    rng = np.random.RandomState(100 + seed)
    eng = _engine(model, n_slots=3, max_frames=10, capacity_slack=16,
                  pipeline_depth=2)
    reqs = []
    n_requests = 8
    submitted = 0
    step_budget = 400
    while (submitted < n_requests or eng._active() or eng._flushing()
           or not eng._queue.empty()) and step_budget > 0:
        step_budget -= 1
        if submitted < n_requests and rng.rand() < 0.5:
            s = int(rng.randint(3, 12))
            mf = int(rng.randint(1, 10))
            p, m = _prompt(model.args, s, seed=1000 + submitted + 31 * seed)
            res = eng.submit_prompt(p, m, max_frames=mf)
            reqs.append((res, p, m, mf))
            submitted += 1
            if rng.rand() < 0.2:
                res.cancel()  # sometimes before it is even admitted
        if not eng._drive_once() and eng._queue.empty() \
                and submitted >= n_requests:
            break
        # random mid-flight cancel of a live request
        if rng.rand() < 0.15 and reqs:
            reqs[int(rng.randint(len(reqs)))][0].cancel()
    eng.run_until_idle()
    assert step_budget > 0, "engine failed to drain within the step budget"
    completed = 0
    for res, p, m, mf in reqs:
        got = res.wait(0)
        if res.finish_reason == "cancel":
            # tokens up to the cancel point must be an exact solo prefix
            np.testing.assert_array_equal(
                got, _solo(model, p, m, mf)[:got.shape[0]])
            continue
        completed += 1
        np.testing.assert_array_equal(got, _solo(model, p, m, mf))
    assert completed >= 1  # the schedule must exercise real completions


def test_result_never_delivers_chunks_after_sentinel():
    """The documented chunk-callback contract is 'chunks, then one final
    None'; a chunk pushed after completion (whatever in-flight scheduler
    arithmetic produced it) must be dropped, not delivered after None."""
    from csm_mlx_tpu.continuous import ContinuousResult

    res = ContinuousResult(max_frames=8)
    events = []
    res.set_chunk_callback(lambda c: events.append(
        "none" if c is None else "chunk"))
    res._push_chunk(np.zeros(16, np.float32))
    res._finish()
    res._push_chunk(np.zeros(16, np.float32))   # late in-flight block
    res._finish()                               # idempotent
    assert events == ["chunk", "none"]
    # queue mode too: a late push must not strand an item after the sentinel
    res2 = ContinuousResult(max_frames=8)
    res2._push_chunk(np.zeros(16, np.float32))
    res2._finish()
    res2._push_chunk(np.zeros(16, np.float32))
    assert len(list(res2.chunks())) == 1


def test_result_replay_callback_exception_does_not_strand_chunks():
    """A consumer callback that raises during set_chunk_callback's replay
    must not abort the drain: remaining queued chunks (and the sentinel)
    still go through the callback, matching _push_chunk/_finish policy."""
    from csm_mlx_tpu.continuous import ContinuousResult

    res = ContinuousResult(max_frames=8)
    res._push_chunk(np.zeros(16, np.float32))
    res._push_chunk(np.zeros(16, np.float32))

    events = []

    def bad_cb(c):
        events.append("none" if c is None else "chunk")
        raise RuntimeError("consumer bug")

    res.set_chunk_callback(bad_cb)              # must not raise
    assert events == ["chunk", "chunk"]
    assert res._chunks.empty()                  # nothing stranded
    res._finish()
    assert events == ["chunk", "chunk", "none"]


def test_int16_transfer_matches_float32_within_grid(model):
    """transfer="int16" (device-side PCM16 chunk fetch) must deliver the
    same float32 audio as transfer="float32" up to the 16-bit grid, with
    identical tokens."""
    import csm_mlx_tpu.tokenizers as tok_mod

    tok_mod.get_audio_tokenizer.cache_clear()
    p, m = _prompt(model.args, 5, seed=9)
    outs = {}
    for transfer in ("float32", "int16"):
        eng = _engine(model, n_slots=1, codec=True, transfer=transfer)
        res = eng.submit_prompt(p, m, max_frames=4)
        eng.run_until_idle()
        outs[transfer] = (res.token_matrix(), res.audio())
    tok_mod.get_audio_tokenizer.cache_clear()
    np.testing.assert_array_equal(outs["float32"][0], outs["int16"][0])
    a, b = outs["float32"][1], outs["int16"][1]
    assert a.shape == b.shape and b.dtype == np.float32
    assert np.abs(np.clip(a, -1.0, 1.0) - b).max() <= 1.0 / 32767.0 + 1e-7


def _bucketed_engine(model, monkeypatch, **kw):
    """Engine with KV-bucket machinery scaled to the tiny model's 512
    context window (production floor is 1024+): buckets every 64 from 64,
    eager-rebase shift 48, shrink hysteresis 16."""
    import functools

    import csm_mlx_tpu.continuous as cont
    from csm_mlx_tpu.ops.attention import kv_prefix_buckets

    monkeypatch.setattr(
        cont, "kv_prefix_buckets",
        functools.partial(kv_prefix_buckets, min_capacity=0,
                          start=64, step=64))
    kw.setdefault("n_slots", 2)
    kw.setdefault("max_frames", 200)
    kw.setdefault("capacity_slack", 16)
    kw.setdefault("frames_per_step", 3)
    eng = _engine(model, **kw)
    eng._EAGER_REBASE_SHIFT = 48
    eng._SHRINK_HYSTERESIS = 16
    return eng


def test_kv_bucketed_cache_grow_and_parity(model, monkeypatch):
    """KV-bucketed cache buffers: one long stream pushes the index across
    bucket edges (grow copies), and the tokens still match the solo run
    exactly — the buffer size is invisible to the math (growth only
    appends masked zero positions)."""
    eng = _bucketed_engine(model, monkeypatch)
    assert eng.capacity == 32 + 200 + 16
    assert eng._kv_buckets and eng._kv_buckets[-1] == eng.capacity
    assert eng._cache.capacity == 64  # smallest bucket over bootstrap + K
    p, m = _prompt(model.args, 6, seed=31)
    res = eng.submit_prompt(p, m, max_frames=150)
    eng.run_until_idle()
    np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, 150))
    # 150 frames from bootstrap 32 crosses the 64 and 128 bucket edges
    assert eng._cache.capacity >= 192
    assert eng.stats.cache_resizes >= 2


def test_kv_bucketed_cache_eager_rebase_shrinks(model, monkeypatch):
    """After long streams finish, the next admissions open a large shift:
    the engine rebases eagerly (without hitting max capacity) and shrinks
    the buffer back to the floor bucket, with exact parity throughout."""
    eng = _bucketed_engine(model, monkeypatch)
    pa, ma = _prompt(model.args, 6, seed=32)
    ra = eng.submit_prompt(pa, ma, max_frames=150)
    eng.run_until_idle()
    assert eng._cache.capacity >= 192
    rebases0 = eng.stats.rebases
    # Short follow-ups: the dead long stream frees the whole window, so
    # the next drives rebase eagerly (shift >= 48) and shrink the buffer.
    reqs = []
    for i in range(3):
        p, m = _prompt(model.args, 5 + i, seed=40 + i)
        reqs.append((eng.submit_prompt(p, m, max_frames=6), p, m))
    eng.run_until_idle()
    for res, p, m in reqs:
        np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, 6))
    np.testing.assert_array_equal(ra.wait(0), _solo(model, pa, ma, 150))
    assert eng.stats.rebases > rebases0          # eager, not forced at max
    assert eng._idx + eng.frames_per_step < eng.capacity
    assert eng._cache.capacity == 64             # shrunk back to the floor


def test_tiered_kv_engine_parity(model, monkeypatch):
    """The tiered block-decode step (forced on; TPU default) produces the
    same streams as solo runs — deterministic on a fixed platform (the
    tiered softmax differs from the classic path only in reduction
    order)."""
    monkeypatch.setenv("CSM_TPU_TIERED_KV", "force")
    eng = _engine(model, frames_per_step=3)
    reqs = []
    for i, mf in enumerate([5, 8, 3, 7]):
        p, m = _prompt(model.args, 4 + i, seed=50 + i)
        reqs.append((eng.submit_prompt(p, m, max_frames=mf), p, m, mf))
    eng.run_until_idle()
    for res, p, m, mf in reqs:
        np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, mf))
    assert eng.stats.completed == 4


# ---------------------------------------------------------------------------
# Multi-chip (virtual 8-device mesh)
# ---------------------------------------------------------------------------


def test_mesh_engine_matches_solo(model):
    """ContinuousEngine(mesh=): TP x DP continuous batching produces the
    same greedy streams as single-device solo runs. Solo references are
    generated BEFORE shard_model so they run unsharded."""
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    reqs = []
    for i, mf in enumerate([6, 9, 4]):
        p, m = _prompt(model.args, 4 + i, seed=70 + i)
        reqs.append((p, m, mf, _solo(model, p, m, mf)))

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    eng = _engine(model, n_slots=4, mesh=mesh)
    handles = [(eng.submit_prompt(p, m, max_frames=mf), want)
               for p, m, mf, want in reqs]
    eng.run_until_idle()
    for res, want in handles:
        np.testing.assert_array_equal(res.wait(0), want)
    assert eng.stats.completed == 3


def test_mesh_engine_composes_with_quantized_codec(model):
    """mesh= + quantize_codec=True: the int8 Mimi decode convs are plain
    XLA ops, so they must partition under GSPMD like the f32 ones (batch
    axis over "data"). Greedy tokens match an unsharded quantized-codec
    engine exactly. Audio is NOT bit-equal: the f32 stages (layernorms,
    softmax, RVQ) pick up partition reduction-order noise, and the next
    stage's dynamic int8 activation quant ROUNDS that noise into ±1 code
    steps that cascade through the streaming codec state — the same
    amplification mechanism PERFORMANCE.md documents for the resident
    kernel. The gate is therefore quant-noise-scale closeness, not
    allclose."""
    import csm_mlx_tpu.tokenizers as tok_mod
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    tok_mod.get_audio_tokenizer.cache_clear()
    p, m = _prompt(model.args, 5, seed=77)
    solo = _engine(model, n_slots=2, codec=True, quantize_codec=True)
    r0 = solo.submit_prompt(p, m, max_frames=4)
    solo.run_until_idle()
    want_tokens, want_audio = r0.wait(0), r0.audio()

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    eng = _engine(model, n_slots=2, codec=True, quantize_codec=True,
                  mesh=mesh)
    assert "weight_q" in eng._mimi_params["decoder"]["init"]
    res = eng.submit_prompt(p, m, max_frames=4)
    eng.run_until_idle()
    np.testing.assert_array_equal(res.wait(0), want_tokens)
    got_audio = res.audio()
    assert got_audio.shape == want_audio.shape
    rel = float(np.sqrt(np.mean((got_audio - want_audio) ** 2))
                / (np.sqrt(np.mean(want_audio ** 2)) + 1e-12))
    assert rel < 0.06, rel
    tok_mod.get_audio_tokenizer.cache_clear()


def test_mesh_engine_carry_is_sharded(model):
    """The slot carry actually lands sharded over the "data" axis (not
    silently replicated): the cache batch axis and the per-slot vectors
    carry a 2-way "data" sharding on the {data:2, model:4} mesh."""
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    eng = _engine(model, n_slots=4, mesh=mesh)

    def row_axis(x):
        spec = tuple(x.sharding.spec) + (None,) * x.ndim
        return [i for i, s in enumerate(spec[:x.ndim]) if s == "data"]

    assert row_axis(eng._cache.k) == [1]
    assert row_axis(eng._pad) == [0]
    assert row_axis(eng._frame) == [0]


def test_mesh_engine_indivisible_slots_replicate(model):
    """n_slots not divisible by the data axis must replicate rows rather
    than fail device_put's divisibility check (same contract as
    generation._place_inputs for a single prompt)."""
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    eng = _engine(model, n_slots=3, mesh=mesh)
    p, m = _prompt(model.args, 5, seed=80)
    res = eng.submit_prompt(p, m, max_frames=5)
    eng.run_until_idle()
    np.testing.assert_array_equal(res.wait(0), _solo(model, p, m, 5))


def test_mesh_engine_rejects_resident_tables(model):
    from csm_mlx_tpu.parallel import create_mesh

    mesh = create_mesh({"data": 2, "model": 4})
    model.params["_resident"] = {"layers": []}
    try:
        with pytest.raises(ValueError, match="resident"):
            ContinuousEngine(model, n_slots=4, codec=False, mesh=mesh)
    finally:
        model.params.pop("_resident", None)


def test_mesh_engine_quantized_matches_solo():
    """W8A8 + mesh (VERDICT r3 item 2): a quantized engine on the TP x DP
    mesh must produce the same greedy streams as the quantized solo run —
    the decode matvecs route through the shard_map TP path
    (ops/quant.py::_quant_linear_tp), whose int32 all-reduce keeps the
    arithmetic bit-identical to the single-device mirror."""
    from conftest import tiny_args
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    qmodel = CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
                 rng=jax.random.PRNGKey(0))
    quantize_model(qmodel, mode="w8a8", min_size=1)
    reqs = []
    for i, mf in enumerate([6, 4]):
        p, m = _prompt(qmodel.args, 4 + i, seed=90 + i)
        reqs.append((p, m, mf, _solo(qmodel, p, m, mf)))

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(qmodel, mesh)
    eng = _engine(qmodel, n_slots=2, mesh=mesh)
    handles = [(eng.submit_prompt(p, m, max_frames=mf), want)
               for p, m, mf, want in reqs]
    eng.run_until_idle()
    for res, want in handles:
        np.testing.assert_array_equal(res.wait(0), want)
    assert eng.stats.completed == 2


def test_server_rejects_engine_plus_mesh(model):
    """ContinuousTTSServer(engine=<existing>, mesh=...) must not silently
    ignore the mesh (it is only forwarded to an internal engine)."""
    from csm_mlx_tpu.parallel import create_mesh
    from csm_mlx_tpu.serve import ContinuousTTSServer

    mesh = create_mesh({"data": 2, "model": 4})

    class _FakeEngine:
        has_codec = True

    with pytest.raises(ValueError, match="mesh"):
        ContinuousTTSServer(model, engine=_FakeEngine(), mesh=mesh)


def test_mesh_engine_codec_state_shard_probe(model):
    """The Mimi decode-state probe placement finds each leaf's slot axis:
    the per-row stream starts shard over "data" while the shared position
    counter replicates."""
    import csm_mlx_tpu.tokenizers as tok_mod
    from jax.sharding import PartitionSpec as P
    from csm_mlx_tpu.parallel import create_mesh, shard_model

    tok_mod.get_audio_tokenizer.cache_clear()
    try:
        mesh = create_mesh({"data": 2, "model": 4})
        shard_model(model, mesh)
        eng = _engine(model, n_slots=4, codec=True, mesh=mesh)
        tr = eng._dec_state.transformer
        assert tr.start.sharding.spec == P("data")
        assert tr.index.sharding.spec == P()
    finally:
        tok_mod.get_audio_tokenizer.cache_clear()
