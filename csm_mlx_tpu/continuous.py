"""Continuous batching: per-slot admission into a running generation batch.

The lockstep batch path (`generation.generate_batch`) holds every row until
the WHOLE batch finishes — under mixed utterance lengths most slots idle out
the tail of the longest row, and new requests wait for the next batch. This
engine keeps a fixed batch of B slots stepping frame-by-frame forever and
recycles each row the moment its stream ends, vLLM-style, but built for
XLA's trace-once model: the hot per-frame program is compiled once and never
sees admission logic.

The reference has nothing like this (its loop is B=1 Python,
`/root/reference/csm_mlx/generation.py:127-178`); this is new TPU-native
serving capability on top of the same model semantics.

Design (why this is exact, not approximate):

- The backbone attention already masks per-row via `pad_len` (left-padded
  prompts): positions are `slot - pad_len[row]`, keys below `pad_len[row]`
  are invisible (`generation._prefill` / `_backbone_step`). So a NEW request
  can be spliced into a shared cache mid-flight by writing its prompt's K/V
  at slots `[index - P, index)` of its row and setting
  `pad_len[row] = index - P + inner_pad`: its positions then start at 0 and
  it can never see its dead predecessor's keys. The shared scalar cache
  index — and therefore the hot `step` program — is untouched.
- `step` decodes the codec audio of its INPUT frame ("decode-behind"), so
  an admitted row's first frame flows through the next shared step's fused
  Mimi decode; admission itself never touches other rows' codec state. The
  Mimi ring cache gets a per-row `start` (`models/mimi/transformer.py`)
  masking the predecessor's sliding window; rotary attention is relative,
  so sharing the absolute position counter is numerically a fresh stream.
- The cache is compacted in place (`rebase`) by rolling the slot axis down
  by the minimum live left-pad, keeping a bounded buffer over an unbounded
  serving lifetime. Positions are pad-relative, so a rebase is exact.

Multi-chip: `ContinuousEngine(..., mesh=...)` (after
`parallel.shard_model(model, mesh)`) commits the slot carry over the
mesh — slot axes shard across "data", params shard across "model" — and
the SAME jitted step/admit/rebase programs run SPMD with XLA-inserted
collectives (tensor-parallel frame steps, data-parallel slots). The
resident Pallas kernel is mutually exclusive with a mesh (it does not
partition under GSPMD); construction fails loudly if both are present.

Pipelining: the host dispatches step k+1 before reading step k's outputs
(the remote-TPU tunnel costs ~10-25 ms per synchronous round trip, the
step itself ~2-5 ms). Frames EOS-discovered late are simply discarded —
dead rows keep computing garbage until re-admission, which is the lockstep
cost model already measured in PERFORMANCE.md.

Token parity with the one-shot path is exact at temperature 0 and is
asserted by tests/test_continuous.py (a row admitted mid-flight produces
the same tokens as `generate_tokens` run alone).
"""

from __future__ import annotations

import copy as _copy
import dataclasses
import time
import logging
import queue
import threading
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.generation import (
    FRAME_MS,
    HISTORY_SIZE,
    _assemble_prompt,
    _backbone_step,
    _decode_frame,
    _dtype_name,
    _frame_to_next_input,
    _pad_prompt,
    _prefill,
    _resolve_sampler,
)
from csm_mlx_tpu.models.csm import CSM
from csm_mlx_tpu.ops.act_sharding import sharding_ctx
from csm_mlx_tpu.ops.attention import kv_bucket_for, kv_prefix_buckets
from csm_mlx_tpu.ops.kv_cache import (KVCache, TieredKVCache,
                                      use_tiered_kv)
from csm_mlx_tpu.ops.rope import rope_cache_for

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Jitted programs
# ---------------------------------------------------------------------------


def _build_continuous_fns(args, sampler, processors, cache_dtype, capacity,
                          mimi_cfg, frames_per_step, transfer="float32"):
    """(step, admit, rebase, mimi_rebase) jitted programs for a slot batch.

    All thread the same device carry: (frame, pad_len, cache, key,
    history[, dec_state]). `step` is the hot program — it runs
    `frames_per_step` frames in one dispatch (a `lax.scan`), because
    through the remote-TPU tunnel each dispatched program costs ~10-25 ms
    of latency and short standalone programs additionally run at a worse
    duty cycle on the shared chip (PERFORMANCE.md): per-frame host stepping
    measured ~33 ms/frame at B=16 where the K-frame block amortizes to
    near the fused-loop cost. Admissions/EOS land at block granularity —
    at most K-1 wasted frames per finished row.
    """
    bcfg = args.backbone_config
    dtype = jnp.dtype(cache_dtype)
    cos_b, sin_b = rope_cache_for(
        bcfg, max(capacity, bcfg.max_position_embeddings))
    cos_d, sin_d = rope_cache_for(args.decoder_config,
                                  args.n_audio_codebooks + 1)

    tiered = use_tiered_kv(frames_per_step)

    def step(params, frame, pad_len, cache, key, history, mimi_params,
             dec_state):
        frame_in = frame

        if tiered:
            # Big cache buffers stay OUT of the scan carry (closed over →
            # invariant for the whole block program); only the K-position
            # recent tier threads through. Merged back once below.
            t0 = TieredKVCache.wrap(cache, frames_per_step)

            def body(carry, _):
                frame, rk, rv, idx, key, history = carry
                tokens, mask = _frame_to_next_input(frame)
                t = dataclasses.replace(t0, rk=rk, rv=rv, index=idx)
                last_hidden, t = _backbone_step(
                    params, args, tokens, mask, pad_len, t, cos_b, sin_b)
                new_frame, key, history = _decode_frame(
                    params, args, last_hidden, key, history, sampler,
                    processors, cos_d, sin_d)
                eos = jnp.all(new_frame == 0, axis=1)
                return ((new_frame, t.rk, t.rv, t.index, key, history),
                        (new_frame, eos))

            carry = (frame, t0.rk, t0.rv, t0.index, key, history)
            carry, (frames, eoses) = jax.lax.scan(
                body, carry, None, length=frames_per_step)
            frame, rk, rv, idx, key, history = carry
            cache = dataclasses.replace(t0, rk=rk, rv=rv, index=idx).merge()
        else:
            def body(carry, _):
                frame, cache, key, history = carry
                tokens, mask = _frame_to_next_input(frame)
                last_hidden, cache = _backbone_step(
                    params, args, tokens, mask, pad_len, cache, cos_b, sin_b)
                new_frame, key, history = _decode_frame(
                    params, args, last_hidden, key, history, sampler,
                    processors, cos_d, sin_d)
                eos = jnp.all(new_frame == 0, axis=1)
                return ((new_frame, cache, key, history), (new_frame, eos))

            carry = (frame, cache, key, history)
            carry, (frames, eoses) = jax.lax.scan(
                body, carry, None, length=frames_per_step)
            frame, cache, key, history = carry

        chunks = ()
        if mimi_cfg is not None:
            from csm_mlx_tpu.models.mimi.mimi import mimi_decode_step_fn

            # Decode-behind, batched: this block owes the audio of the
            # carry frame that ENTERED it (generated by the previous
            # block's last iteration, or spliced in by admit) plus this
            # block's first K-1 frames — exactly the frames the old
            # per-iteration loop decoded, but in ONE Mimi call over K
            # frames (2K codec-transformer tokens, K*1920 samples):
            # measured 25.2 -> ~8 ms per 48-slot block, the largest term
            # of the serving-vs-compute gap (benchmarks/
            # continuous_decompose.py). The generated frame of the block's
            # LAST iteration decodes at the start of the next block.
            owed = jnp.concatenate([frame_in[None], frames[:-1]], axis=0)
            codes = owed.transpose(1, 2, 0).astype(jnp.int32)  # (B, n_cb, K)
            audio, dec_state = mimi_decode_step_fn(
                mimi_params, mimi_cfg, codes, dec_state)  # (B, 1, K*fs)
            fs = audio.shape[-1] // frames_per_step
            chunks = audio.reshape(-1, frames_per_step, fs).transpose(1, 0, 2)
            if transfer == "int16":
                # Device-side PCM16: halves the per-block chunk fetch
                # through the tunnel (same trick as serve.py lockstep);
                # the host converts back so the float32 chunk contract
                # holds (values land on the 16-bit grid — lossless for
                # the PCM-emitting HTTP endpoints).
                chunks = (jnp.clip(chunks, -1.0, 1.0)
                          * 32767.0).astype(jnp.int16)
        # frames: (K, B, n_cb); chunks: (K, B, frame_size) | (); eoses: (K, B)
        return (frame, cache, key, history, dec_state,
                frames, chunks, eoses)

    def admit(params, tokens, mask, inner_pad, rows, frame, pad_len, cache,
              key, history, dec_state):
        """Splice N (left-padded, same-bucket) prompts into rows of the
        carry in ONE program — admissions arrive in bursts (server start,
        a big batch draining) and each dispatched program costs ~15-25 ms
        through the tunnel, so single-row admits dominated the engine's
        overhead (measured: ~1 admit/block ≈ +20 ms on a ~50 ms block).
        tokens: (N, P, 33); rows: (N,) slot indices (duplicates allowed —
        later writes win, used to pad N to a compiled size)."""
        n, p = tokens.shape[0], tokens.shape[1]
        row_cache = KVCache.init(bcfg, n, p, dtype=dtype)
        last_hidden, row_cache = _prefill(
            params, args, tokens, mask, inner_pad, row_cache, cos_b, sin_b)
        at = cache.index - p
        k5, v5 = cache.k, cache.v
        for t in range(n):  # static tiny loop; each DUS is one row's splice
            k5 = jax.lax.dynamic_update_slice(
                k5, row_cache.k[:, t:t + 1].astype(k5.dtype),
                (0, rows[t], 0, at, 0))
            v5 = jax.lax.dynamic_update_slice(
                v5, row_cache.v[:, t:t + 1].astype(v5.dtype),
                (0, rows[t], 0, at, 0))
        cache = dataclasses.replace(cache, k=k5, v=v5)  # index unchanged
        pad_len = pad_len.at[rows].set(at + inner_pad)
        hist_n = jnp.full((n, HISTORY_SIZE), -1, jnp.int32)
        f_n, key, hist_n = _decode_frame(
            params, args, last_hidden, key, hist_n, sampler, processors,
            cos_d, sin_d)
        # Sequential per-row writes, NOT one scatter: padded batches repeat
        # the last real row, and duplicate-index scatter order is undefined
        # in XLA while sampled frames can differ per batch position at
        # temperature > 0. Sequential .set is last-write-wins — the host
        # reads the same (last) copy back (_fetch_one maps it to n-1).
        for t in range(n):
            frame = frame.at[rows[t]].set(f_n[t])
            history = history.at[rows[t]].set(hist_n[t])
        if mimi_cfg is not None:
            from csm_mlx_tpu.models.mimi.mimi import reset_decode_row

            for t in range(n):
                dec_state = reset_decode_row(dec_state, rows[t])
        eos_n = jnp.all(f_n == 0, axis=1)
        return frame, pad_len, cache, key, history, dec_state, f_n + 0, eos_n

    def mimi_rebase(dec_state, shift):
        """Shift the Mimi ring's absolute position counter down by a
        multiple of the ring window (slot = pos % window is invariant) so
        rotary phases stay small over an unbounded serving lifetime."""
        tr = dec_state.transformer
        tr = dataclasses.replace(
            tr, index=tr.index - shift,
            start=jnp.maximum(tr.start - shift, 0))
        return dataclasses.replace(dec_state, transformer=tr)

    def rebase(cache, pad_len, shift):
        """Roll live cache content `shift` slots left; positions are
        pad-relative so this is exact. Rolled-around garbage at the tail
        sits above `index` and stays masked. Dead rows' stale pads are
        clamped so their (discarded) attention keeps >=1 valid key."""
        k = jnp.roll(cache.k, -shift, axis=3)
        v = jnp.roll(cache.v, -shift, axis=3)
        index = cache.index - shift
        pad_len = jnp.minimum(pad_len - shift, index - 1)
        return dataclasses.replace(cache, k=k, v=v, index=index), pad_len

    # Every program here is shape-polymorphic over the cache capacity: the
    # engine sizes the cache BUFFER to a KV bucket and jit re-specializes
    # per bucket (ops/attention.py::kv_prefix_buckets — at B=48 the full
    # 1890-capacity buffer cost ~3 GB/step of dead-tail attention reads).
    step_j = jax.jit(step, donate_argnums=(1, 3, 4, 5, 7))
    admit_j = jax.jit(admit, donate_argnums=(5, 6, 7, 8, 9, 10))
    rebase_j = jax.jit(rebase, donate_argnums=(0, 1))
    mimi_rebase_j = jax.jit(mimi_rebase, donate_argnums=(0,))
    return step_j, admit_j, rebase_j, mimi_rebase_j


# ---------------------------------------------------------------------------
# Host-side request/slot bookkeeping
# ---------------------------------------------------------------------------


class ContinuousResult:
    """Handle for one submitted request.

    `chunks` yields 80 ms audio chunks (np.float32, only when the engine
    runs with a codec); `wait()` blocks until the stream is complete and
    returns the (F, 32) token matrix. Audio/tokens may also be read after
    `done` is set via `.audio()` / `.tokens`.
    """

    def __init__(self, max_frames: int, n_codebooks: int = 32):
        self.max_frames = max_frames
        self.n_codebooks = n_codebooks
        # serving-latency timestamps (host perf_counter; None until set):
        # submit -> admitted (queue wait) -> first audio chunk delivered
        self.t_submit: Optional[float] = None
        self.t_admitted: Optional[float] = None
        self.t_first_chunk: Optional[float] = None
        self.tokens: List[np.ndarray] = []
        self._chunks: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        self.done = threading.Event()
        self.error: Optional[BaseException] = None
        self.audio_frames = 0
        self.finished = False  # no more token frames will be accepted
        self.finish_reason: Optional[str] = None  # eos | cap | cancel | error
        self.cancelled = False
        self._cb_lock = threading.Lock()
        self._on_chunk: Optional[Callable] = None
        self._on_done: Optional[Callable] = None

    def cancel(self) -> None:
        """Ask the engine to stop this stream at the next fetched frame
        (or drop it from the queue if not yet admitted). Tokens/audio
        already emitted remain readable."""
        self.cancelled = True

    # -- engine side ----------------------------------------------------
    def _push_chunk(self, chunk: np.ndarray) -> None:
        with self._cb_lock:
            if self.done.is_set():
                # Hard guarantee of the "chunks, then one final None"
                # contract: nothing is ever delivered after the sentinel,
                # whatever the scheduler's in-flight arithmetic does.
                return
            if self.t_first_chunk is None:
                self.t_first_chunk = time.perf_counter()
            self.audio_frames += 1
            if self._on_chunk is not None:
                try:
                    self._on_chunk(chunk)
                except Exception:  # a consumer bug must not kill the engine
                    logger.exception("chunk callback raised")
            else:
                self._chunks.put(chunk)

    def _finish(self, error: Optional[BaseException] = None) -> None:
        with self._cb_lock:
            if self.done.is_set():
                return  # idempotent: callbacks fire exactly once
            self.error = error
            self.finished = True
            if self.finish_reason is None:
                # Paths that finish without going through _finish_request
                # (queue-dropped cancels, engine failure) still honor the
                # documented eos|cap|cancel|error contract.
                self.finish_reason = ("error" if error is not None
                                      else "cancel" if self.cancelled
                                      else None)
            if self._on_chunk is not None:
                try:
                    self._on_chunk(None)
                except Exception:
                    logger.exception("chunk callback raised")
            else:
                self._chunks.put(None)
            self.done.set()
            cb = self._on_done
        if cb is not None:
            try:
                cb()
            except Exception:
                logger.exception("done callback raised")

    # -- caller-side callback registration (no waiter threads) -----------
    def add_done_callback(self, cb: Callable) -> None:
        """Invoke cb() once when the stream completes — on the ENGINE
        thread, so keep it O(schedule) (e.g. loop.call_soon_threadsafe).
        Fires immediately if already complete. One callback max."""
        with self._cb_lock:
            self._on_done = cb
            fire = self.done.is_set()
        if fire:
            cb()

    def set_chunk_callback(self, cb: Callable) -> None:
        """Deliver audio chunks (and the final None sentinel) through cb
        instead of the internal queue; already-queued chunks are replayed
        in order first. Runs on the engine thread — keep it O(schedule).
        After this, `chunks()`/`audio()` must not be used."""
        with self._cb_lock:
            self._on_chunk = cb
            while True:
                try:
                    item = self._chunks.get_nowait()
                except queue.Empty:
                    break
                try:
                    cb(item)
                except Exception:
                    # Same policy as _push_chunk/_finish: a consumer bug must
                    # not strand the remaining queued chunks (or the caller)
                    # half-replayed — log and keep draining.
                    logger.exception("chunk callback raised")

    # -- caller side ----------------------------------------------------
    def chunks(self):
        while True:
            c = self._chunks.get()
            if c is None:
                # Re-enqueue the end sentinel: a second consumer (e.g.
                # `audio()` after a streaming loop) must terminate too, not
                # block forever on an empty queue.
                self._chunks.put(None)
                if self.error is not None:
                    raise self.error
                return
            yield c

    def wait(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.done.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if self.error is not None:
            raise self.error
        return self.token_matrix()

    def token_matrix(self) -> np.ndarray:
        if self.tokens:
            return np.stack(self.tokens, axis=0)
        return np.zeros((0, self.n_codebooks), dtype=np.int32)

    def audio(self) -> np.ndarray:
        parts = list(self.chunks())
        if not parts:
            return np.zeros((0,), dtype=np.float32)
        return np.concatenate(parts, axis=0)


@dataclasses.dataclass
class _Slot:
    req: Optional[ContinuousResult] = None
    # Provenance of the frame currently in the device carry for this row:
    # which request produced it and that request's 0-based frame number.
    prov_req: Optional[ContinuousResult] = None
    prov_seq: int = -1
    # Cap-finished rows whose last frame's decode-behind chunk is still in
    # flight: the step numbered `flush_step` must have been dispatched
    # before this slot's carry frame may be overwritten by an admit.
    flush_step: Optional[int] = None


@dataclasses.dataclass
class ContinuousStats:
    steps: int = 0
    admissions: int = 0
    rebases: int = 0
    cache_resizes: int = 0  # KV-bucket grow/shrink copies
    completed: int = 0
    frames_emitted: int = 0
    frames_wasted: int = 0  # dead-slot frames computed and discarded
    # rolling reservoirs (last 1024) of per-request serving latency, sec:
    # admission -> first audio chunk, and submit -> first chunk (includes
    # queue wait). Populated by the engine when a codec stream delivers
    # its first chunk; summarized by first_chunk_latency_ms().
    admit_to_first_chunk: deque = dataclasses.field(
        default_factory=lambda: deque(maxlen=1024))
    submit_to_first_chunk: deque = dataclasses.field(
        default_factory=lambda: deque(maxlen=1024))

    def first_chunk_latency_ms(self) -> Dict[str, Optional[float]]:
        """p50/p99 of the rolling first-chunk latencies (ms), or Nones
        before any codec stream has delivered audio."""
        out: Dict[str, Optional[float]] = {}
        for name, d in (("admit", self.admit_to_first_chunk),
                        ("submit", self.submit_to_first_chunk)):
            # .copy() is a single C-level op (atomic under the GIL for a
            # deque of floats) — /stats reads from the HTTP thread while
            # the engine thread appends; iterating the live deque could
            # raise "deque mutated during iteration"
            arr = np.asarray(d.copy(), np.float64)
            out[f"{name}_p50_ms"] = (
                round(float(np.percentile(arr, 50)) * 1e3, 1)
                if arr.size else None)
            out[f"{name}_p99_ms"] = (
                round(float(np.percentile(arr, 99)) * 1e3, 1)
                if arr.size else None)
        return out


class ContinuousEngine:
    """Fixed-B slot scheduler over the jitted step/admit/rebase programs.

    Thread-safety: `submit` may be called from any thread; the device is
    driven either by an owned background thread (`start`/`stop`) or by the
    caller via `run_until_idle` (tests, benchmarks) — not both at once.
    """

    def __init__(
        self,
        model: CSM,
        n_slots: int = 8,
        *,
        max_frames: int = 1250,          # 100 s — per-request hard cap
        max_prompt_bucket: int = 512,
        capacity_slack: int = 128,
        temperature: float = 0.0,
        sampler: Optional[Any] = None,
        logits_processors: Optional[Sequence] = None,
        codec: bool = True,
        quantize_codec: bool = False,
        frames_per_step: int = 8,
        pipeline_depth: int = 2,
        transfer: str = "float32",  # "int16": device-side PCM16 chunk
                                    # fetch (half the bytes; values land on
                                    # the 16-bit grid)
        mesh: Optional[Any] = None,
        key: Optional[jax.Array] = None,
    ):
        args = model.args
        self.model = model
        self.args = args
        self.n_slots = n_slots
        self.mesh = mesh
        if mesh is not None and "_resident" in model.params:
            # The VMEM-resident frame kernel is a Pallas program — it does
            # not partition under GSPMD, and _decode_frame would trace it
            # because the prepared tables are present. Fail loudly instead
            # of compiling a program that aborts on the first step.
            raise ValueError(
                "ContinuousEngine(mesh=...) uses the dispatched decode path; "
                "drop the prepared resident-decoder tables "
                "(model.params.pop('_resident')) or the mesh")
        # W8A8-quantized params compose with the mesh: the engine installs
        # the activation-sharding context around every program dispatch, so
        # quantized decode matvecs route through the shard_map TP path
        # (ops/quant.py::_quant_linear_tp) instead of the single-device
        # Pallas kernel that GSPMD cannot partition.
        self.max_frames = max_frames
        self.max_prompt_bucket = max_prompt_bucket
        self.frames_per_step = max(1, frames_per_step)
        self.pipeline_depth = max(1, pipeline_depth)
        ctx = args.backbone_config.max_position_embeddings or 2048
        if max_prompt_bucket + max_frames > ctx:
            raise ValueError(
                f"max_prompt_bucket+max_frames ({max_prompt_bucket}+"
                f"{max_frames}) exceeds the backbone context window {ctx}")
        if capacity_slack < self.frames_per_step:
            raise ValueError(
                f"capacity_slack ({capacity_slack}) must cover at least one "
                f"step block (frames_per_step={self.frames_per_step}) so a "
                f"rebase always frees room for the next block")
        self.capacity = max_prompt_bucket + max_frames + capacity_slack
        self._bootstrap = max_prompt_bucket

        smp = _resolve_sampler(temperature, sampler)
        procs = tuple(logits_processors or ())
        self._mimi = None
        self._mimi_params = None
        mimi_cfg = None
        if codec:
            from csm_mlx_tpu.tokenizers import get_audio_tokenizer

            self._mimi = get_audio_tokenizer(args.n_audio_codebooks)
            mimi_cfg = self._mimi.cfg
            self._mimi_params = self._mimi.params
            if quantize_codec:
                # W8A8 decode path (models/mimi/quant.py) on a PRIVATE copy
                # of the param tree: get_audio_tokenizer is a process-wide
                # cached instance, and its encode path (prompt/context
                # encodes, parity gates) must stay exact f32.
                from csm_mlx_tpu.models.mimi.quant import (
                    quantize_mimi_decoder,
                )

                holder = _copy.copy(self._mimi)
                holder.params = jax.tree_util.tree_map(
                    lambda a: a, self._mimi.params)
                quantize_mimi_decoder(holder)
                self._mimi_params = holder.params
        if transfer not in ("float32", "int16"):
            raise ValueError(f"transfer must be 'float32' or 'int16', "
                             f"got {transfer!r}")
        self.transfer = transfer
        (self._step, self._admit, self._rebase,
         self._mimi_rebase) = _build_continuous_fns(
            args, smp, procs, _dtype_name(model.dtype), self.capacity,
            mimi_cfg, self.frames_per_step, transfer)

        # Device carry -------------------------------------------------
        # The cache BUFFER is sized to a KV bucket, not to self.capacity:
        # every step reads the whole static buffer (attention over all
        # slots), so at B=48 a full 1890-capacity cache costs ~3 GB/step
        # of dead-tail HBM reads. The buffer grows bucket-by-bucket as the
        # index climbs (jit re-specializes per shape) and eager rebases
        # shrink it back (ops/attention.py::kv_prefix_buckets;
        # benchmarks/kv_buckets_ab.py for why in-program prefix slicing
        # loses instead).
        dtype = jnp.dtype(_dtype_name(model.dtype))
        self._kv_buckets = kv_prefix_buckets(self.capacity)
        cap0 = (kv_bucket_for(self._bootstrap + self.frames_per_step,
                              self._kv_buckets) or self.capacity)
        cache = KVCache.init(args.backbone_config, n_slots, cap0,
                             dtype=dtype)
        self._cache = dataclasses.replace(
            cache, index=jnp.asarray(self._bootstrap, jnp.int32))
        self._pad = jnp.full((n_slots,), self._bootstrap - 1, jnp.int32)
        self._frame = jnp.zeros((n_slots, args.n_audio_codebooks), jnp.int32)
        self._history = jnp.full((n_slots, HISTORY_SIZE), -1, jnp.int32)
        self._key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(0, 2**31 - 1))
        # chunk_frames: the batched block decode feeds frames_per_step
        # frames (2x tokens) per mimi_decode_step_fn call — the ring needs
        # that much slack over the attention window.
        self._dec_state = (
            self._mimi.init_decode_state(
                n_slots, chunk_frames=self.frames_per_step)
            if self._mimi is not None else None)
        if mesh is not None:
            self._place_carry_on_mesh()

        # Host mirrors + scheduler state -------------------------------
        self._idx = self._bootstrap          # mirror of cache.index
        self._pads: List[int] = [self._bootstrap - 1] * n_slots
        self._slots = [_Slot() for _ in range(n_slots)]
        self._queue: "queue.Queue[Tuple]" = queue.Queue()
        self._inflight: deque = deque()      # (kind, payload, outputs)
        self._step_no = 0                    # number of step BLOCKS dispatched
        self._frames_total = 0               # frames stepped (blocks * K)
        self._mimi_rebased = 0               # total Mimi index shift (TOKENS)
        self.stats = ContinuousStats()
        self._wake = threading.Event()
        self._stop_evt = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # Set when the drive loop dies on a device error: the carry may be
        # donated/corrupt, so further submits must fail fast, not hang.
        self._dead: Optional[BaseException] = None

    def _place_carry_on_mesh(self) -> None:
        """Commit the device carry to `self.mesh`: slot (batch) axes shard
        over the mesh's "data" axis when the slot count divides it
        (replicated otherwise), everything else replicates. Params carry
        their own shardings (`parallel.shard_model`) and jit propagates
        both — XLA inserts the TP/DP collectives (the same contract as
        `generation._place_inputs`, so `mesh=` here composes with the same
        `shard_model(model, mesh)` call the lockstep paths use)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        data_size = dict(mesh.shape).get("data", 1)
        row = ("data" if data_size > 1 and self.n_slots % data_size == 0
               else None)

        def put(x, axis=None):
            spec = [None] * np.ndim(x)
            if row is not None and axis is not None:
                spec[axis] = row
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

        self._frame = put(self._frame, 0)
        self._history = put(self._history, 0)
        self._pad = put(self._pad, 0)
        self._key = put(self._key)
        self._cache = dataclasses.replace(
            self._cache, k=put(self._cache.k, 1), v=put(self._cache.v, 1),
            index=put(self._cache.index))
        if self._dec_state is not None:
            # The Mimi decode state is a nested pytree whose batch axes sit
            # at different positions per leaf (ring KV, conv tails, stream
            # starts). Identify each leaf's batch axis EXACTLY by diffing
            # the shapes of two SMALL probe states (batch 1 vs batch 2 —
            # never a second full-size state, which would transiently
            # double decode-state memory at 48-slot construction): the
            # first axis that grew is the slot axis; leaves with no batch
            # axis (position counters, filled flags) replicate. Only one
            # batch axis per leaf is assumed (true of every Mimi state
            # leaf: batch never appears twice in a shape).
            probe1 = self._mimi.init_decode_state(
                1, chunk_frames=self.frames_per_step)
            probe2 = self._mimi.init_decode_state(
                2, chunk_frames=self.frames_per_step)

            def put_leaf(x, pa, pb):
                ax = next((i for i, (a, b) in enumerate(
                    zip(np.shape(pa), np.shape(pb))) if a != b), None)
                return put(x, ax)

            self._dec_state = jax.tree.map(
                put_leaf, self._dec_state, probe1, probe2)
            del probe1, probe2

    # -- submission ------------------------------------------------------

    @property
    def has_codec(self) -> bool:
        """True when the engine decodes audio (constructed with codec=True);
        a codec-less engine emits token frames only."""
        return self._mimi is not None

    def pending(self) -> int:
        """Requests waiting for a slot (admission backlog; approximate —
        the drive thread drains concurrently)."""
        return self._queue.qsize()

    def submit(self, text: str, speaker: int = 0, context: Sequence = (),
               max_frames: Optional[int] = None) -> ContinuousResult:
        prompt, mask = _assemble_prompt(self.model, text, speaker, context)
        return self.submit_prompt(prompt, mask, max_frames=max_frames)

    def submit_prompt(self, prompt: np.ndarray, mask: np.ndarray,
                      max_frames: Optional[int] = None) -> ContinuousResult:
        if self._dead is not None:
            raise RuntimeError(
                "continuous engine died; restart a new engine") \
                from self._dead
        mf = (self.max_frames if max_frames is None
              else min(max_frames, self.max_frames))
        if mf < 1:
            raise ValueError(f"max_frames must be >= 1, got {max_frames}")
        tokens, m, pad_arr, bucket = _pad_prompt(prompt, mask)
        if bucket > self.max_prompt_bucket:
            raise ValueError(
                f"prompt of {prompt.shape[0]} tokens exceeds the engine's "
                f"max_prompt_bucket={self.max_prompt_bucket}")
        res = ContinuousResult(mf, self.args.n_audio_codebooks)
        res.t_submit = time.perf_counter()
        self._queue.put((res, tokens, m, int(pad_arr[0]), bucket))
        self._wake.set()
        return res

    # -- scheduling core -------------------------------------------------

    def _free_slot(self, exclude: Optional[set] = None) -> Optional[int]:
        for i, s in enumerate(self._slots):
            if exclude is not None and i in exclude:
                continue
            if s.req is None and (
                s.flush_step is None or self._step_no >= s.flush_step
            ):
                return i
        return None

    def _active(self) -> bool:
        return any(s.req is not None for s in self._slots)

    def _flushing(self) -> bool:
        return any(s.flush_step is not None for s in self._slots)

    # Compiled admit batch sizes: pending admissions pad up to the next of
    # these (by repeating the last row — later DUS writes win, so the
    # duplicate is idempotent) instead of compiling every N.
    _ADMIT_SIZES = (1, 2, 4, 8, 16)

    def _dispatch_admit(self, assignments: List[Tuple[int, Tuple]]) -> None:
        """Splice a same-bucket group of (slot, queue-item) in one program."""
        n_real = len(assignments)
        n = next(s for s in self._ADMIT_SIZES if s >= n_real)
        bucket = assignments[0][1][4]
        width = assignments[0][1][1].shape[2]
        tokens = np.zeros((n, bucket, width), np.int32)
        mask = np.zeros((n, bucket, width), np.int32)
        pads = np.zeros((n,), np.int32)
        rows = np.zeros((n,), np.int32)
        for t in range(n):
            slot_i, (res, tk, m, pad, _b) = assignments[min(t, n_real - 1)]
            tokens[t], mask[t], pads[t], rows[t] = tk[0], m[0], pad, slot_i
        with sharding_ctx(self.mesh):
            outs = self._admit(
                self.model.params, jnp.asarray(tokens), jnp.asarray(mask),
                jnp.asarray(pads), jnp.asarray(rows),
                self._frame, self._pad, self._cache, self._key,
                self._history, self._dec_state)
        (self._frame, self._pad, self._cache, self._key, self._history,
         self._dec_state, f0, eos0) = outs
        t_adm = time.perf_counter()
        for slot_i, (res, _tk, _m, pad, _b) in assignments:
            res.t_admitted = t_adm
            self._pads[slot_i] = self._idx - bucket + pad
            s = self._slots[slot_i]
            s.req = res
            s.prov_req, s.prov_seq = res, 0
            s.flush_step = None
        # The step block dispatched right after this admit (number
        # _step_no + 1) decodes the admitted frame's audio in its first
        # iteration — recorded for cap-at-admission flushes below.
        self._inflight.append(
            ("admit",
             ([(slot_i, res) for slot_i, (res, *_r) in assignments],
              self._step_no + 1),
             (f0, eos0)))
        self.stats.admissions += n_real

    def _resize_cache(self, new_cap: int) -> None:
        """Re-buffer the KV cache at `new_cap` positions (grow: zero-pad the
        tail; shrink: drop the dead tail — callers guarantee every valid
        key lives below new_cap). One device copy per bucket crossing;
        every jitted program re-specializes on the new shape."""
        old = self._cache
        delta = new_cap - old.capacity
        if delta == 0:
            return
        if delta > 0:
            pad = ((0, 0), (0, 0), (0, 0), (0, delta), (0, 0))
            k5, v5 = jnp.pad(old.k, pad), jnp.pad(old.v, pad)
        else:
            k5, v5 = old.k[:, :, :, :new_cap], old.v[:, :, :, :new_cap]
        self._cache = dataclasses.replace(old, k=k5, v=v5)
        self.stats.cache_resizes += 1

    def _dispatch_step(self) -> None:
        k = self.frames_per_step
        # Grow the cache buffer to the bucket covering this block's last
        # write (one pad copy per crossing; jit re-specializes per shape).
        if self._idx + k > self._cache.capacity:
            self._resize_cache(kv_bucket_for(self._idx + k,
                                             self._kv_buckets)
                               or self.capacity)
        prov = [(s.prov_req, s.prov_seq) for s in self._slots]
        with sharding_ctx(self.mesh):
            outs = self._step(
                self.model.params, self._frame, self._pad, self._cache,
                self._key, self._history,
                self._mimi_params,
                self._dec_state)
        (self._frame, self._cache, self._key, self._history,
         self._dec_state, frames_h, chunks_h, eos_h) = outs
        self._idx += k
        self._step_no += 1
        self._frames_total += k
        for s in self._slots:
            if s.prov_req is not None:
                s.prov_seq += k
        self._inflight.append(
            ("step", (prov, self._step_no), (frames_h, chunks_h, eos_h)))
        self.stats.steps += 1

    # Mimi ring positions grow 1/step forever; rebase them (by a multiple
    # of the ring window, so slots are invariant) long before rotary-phase
    # precision could matter. 2^18 frames ≈ 5.8 h of audio per trigger.
    _MIMI_REBASE_AT = 1 << 18
    # Bucketed-cache policy: rebase once >=256 positions of shift are
    # available (amortizes the roll over >=32 blocks at K=8) and keep
    # half a bucket step of slack before shrinking the buffer.
    _EAGER_REBASE_SHIFT = 256
    _SHRINK_HYSTERESIS = 128

    def _maybe_rebase(self) -> None:
        if self._mimi is not None:
            # The decode transformer sees `downsample_stride` latent tokens
            # per frame (the upsample convtr widens each frame's latent), so
            # its `index` advances stride× faster than _frames_total — work
            # in TOKEN units throughout or the shift undercounts and the
            # index still grows without bound.
            tok_per_frame = self._mimi.cfg.downsample_stride
            tok_idx = tok_per_frame * self._frames_total - self._mimi_rebased
            if tok_idx >= tok_per_frame * self._MIMI_REBASE_AT:
                w = self._dec_state.transformer.window
                # Keep >= 2 windows of live positions above zero after the
                # shift; multiples of w keep ring slots (pos % w) invariant.
                shift = ((tok_idx - 2 * w) // w) * w
                if shift > 0:  # tiny thresholds can make it <= 0
                    with sharding_ctx(self.mesh):
                        self._dec_state = self._mimi_rebase(
                            self._dec_state, jnp.asarray(shift, jnp.int32))
                    self._mimi_rebased += shift
        at_max = self._idx + self.frames_per_step >= self.capacity
        live = [self._pads[i] for i, s in enumerate(self._slots)
                if s.req is not None]
        low = min(live) if live else self._idx
        shift = min(low, self._idx - self._bootstrap)
        # Eager rebase (bucketed-cache mode): compact as soon as a useful
        # shift opens up, so the index — and with it the bucket every step
        # block pays attention reads over — stays near the live window
        # instead of climbing to max capacity between rare forced rebases.
        # The roll costs one pass over the (small) current bucket, amortized
        # over the >= EAGER_SHIFT/frames_per_step blocks that accrued it.
        eager = (bool(self._kv_buckets)
                 and shift >= self._EAGER_REBASE_SHIFT)
        if not (at_max or eager):
            return
        if at_max and (shift <= 0 or self._idx - shift +
                       self.frames_per_step >= self.capacity):
            # An insufficient shift must raise, not proceed: cache writes at
            # index >= capacity clamp to the last slot and silently corrupt
            # every live row's newest KV.
            raise RuntimeError(
                "cache full with an unrebaseable row — max_frames/"
                "capacity_slack misconfigured")
        with sharding_ctx(self.mesh):
            self._cache, self._pad = self._rebase(
                self._cache, self._pad, jnp.asarray(shift, jnp.int32))
        self._idx -= shift
        self._pads = [max(p - shift, 0) for p in self._pads]
        self.stats.rebases += 1
        if self._kv_buckets:
            # Shrink the buffer back to the covering bucket, with one
            # bucket-step of hysteresis so an index oscillating around an
            # edge doesn't thrash grow/shrink copies.
            want = (kv_bucket_for(
                self._idx + self.frames_per_step + self._SHRINK_HYSTERESIS,
                self._kv_buckets) or self.capacity)
            if want < self._cache.capacity:
                self._resize_cache(want)

    def _fetch_one(self) -> None:
        kind, payload, outputs = self._inflight.popleft()
        if kind == "admit":
            rows, flush = payload
            f0, eos0 = jax.device_get(outputs)
            n, n_real = f0.shape[0], len(rows)
            for t, (slot_i, res) in enumerate(rows):
                # The last real row is repeated to pad the compiled batch
                # size; the LAST copy's write wins in the carry, so read
                # that copy back for it.
                td = t if (t < n_real - 1 or n == n_real) else n - 1
                if bool(eos0[td]):
                    # Zero-frame stream: finished before its first step.
                    self._finish_request(slot_i, n_chunks_pending=False,
                                         reason="eos")
                else:
                    res.tokens.append(np.asarray(f0[td], np.int32))
                    self.stats.frames_emitted += 1
                    if len(res.tokens) >= res.max_frames:
                        # max_frames=1: capped at admission. The frame's
                        # decode-behind chunk arrives in the first iteration
                        # of the block dispatched right after the admit.
                        self._finish_request(slot_i, n_chunks_pending=True,
                                             reason="cap", flush_step=flush)
            return
        prov, step_no = payload
        frames, chunks, eoses = jax.device_get(outputs)
        k = self.frames_per_step
        has_chunks = self._mimi is not None
        for i, (req, seq_in) in enumerate(prov):
            slot = self._slots[i]
            if req is None:
                self.stats.frames_wasted += k
                continue
            for j in range(k):
                # Audio of frame seq_in + j (decode-behind): a frame's
                # tokens are always fetched one iteration before its audio
                # (same block or the previous one), so len(req.tokens) is
                # authoritative for which frames are real.
                s_audio = seq_in + j
                if has_chunks and 0 <= s_audio < len(req.tokens):
                    c = np.asarray(chunks[j][i])
                    if c.dtype == np.int16:  # transfer="int16": rescale back
                        c = c.astype(np.float32) / 32767.0
                    req._push_chunk(np.asarray(c, np.float32))
                    if (req.t_first_chunk is not None
                            and not getattr(req, "_lat_recorded", False)):
                        req._lat_recorded = True
                        if req.t_admitted is not None:
                            self.stats.admit_to_first_chunk.append(
                                req.t_first_chunk - req.t_admitted)
                        if req.t_submit is not None:
                            self.stats.submit_to_first_chunk.append(
                                req.t_first_chunk - req.t_submit)
                    if req.finished and s_audio == len(req.tokens) - 1:
                        # Last pending chunk of a cap-finished stream.
                        req._finish()
                        if slot.req is None and slot.flush_step == step_no:
                            slot.flush_step = None
                # Token frame generated by iteration j (seq_in + j + 1).
                if req is not slot.req or req.finished:
                    self.stats.frames_wasted += 1
                    continue
                if req.cancelled:
                    self._finish_request(i, n_chunks_pending=False,
                                         reason="cancel")
                    continue
                if bool(eoses[j][i]):
                    # EOS frame is not audio; the last real frame's chunk
                    # arrived at THIS iteration's chunk branch above.
                    self._finish_request(i, n_chunks_pending=False,
                                         reason="eos")
                    continue
                req.tokens.append(np.asarray(frames[j][i], np.int32))
                self.stats.frames_emitted += 1
                if len(req.tokens) >= req.max_frames:
                    # Cap-finished: the final frame's chunk arrives at the
                    # NEXT iteration — within this same block unless the
                    # cap landed on the block's last frame.
                    self._finish_request(
                        i, n_chunks_pending=True, reason="cap",
                        flush_step=step_no if j < k - 1 else step_no + 1)

    def _finish_request(self, slot_i: int, *, n_chunks_pending: bool,
                        flush_step: Optional[int] = None,
                        reason: str = "cap") -> None:
        slot = self._slots[slot_i]
        req = slot.req
        if req is None:
            return
        slot.req = None
        self._pads[slot_i] = self._idx  # free rows don't constrain rebase
        self.stats.completed += 1
        req.finished = True
        req.finish_reason = reason
        if self._mimi is None or not n_chunks_pending:
            req._finish()
        else:
            slot.flush_step = flush_step

    # -- drive loops -----------------------------------------------------

    def _drive_once(self) -> bool:
        """One scheduler iteration; returns False when fully idle."""
        # Admissions: fill free slots from the queue, grouped by prompt
        # bucket so a burst splices in a handful of programs, not one per
        # request.
        assigned: set = set()
        groups: Dict[int, List[Tuple[int, Tuple]]] = {}
        while True:
            slot = self._free_slot(exclude=assigned)
            if slot is None or self._queue.empty():
                break
            item = self._queue.get()
            if item[0].cancelled:
                item[0]._finish()
                continue
            bucket = item[4]
            if self._idx < bucket:
                # Unreachable under current invariants (_idx never drops
                # below _bootstrap == max_prompt_bucket >= every bucket, see
                # _maybe_rebase's shift bound) — but if a future change
                # broke that, requeueing would LIVELOCK with no active
                # slots: nothing grows _idx while the item cycles the
                # queue. Fail the one request loudly instead.
                item[0]._finish(RuntimeError(
                    f"admission bucket {bucket} exceeds cache depth "
                    f"{self._idx} — engine invariant violated"))
                continue
            assigned.add(slot)
            groups.setdefault(bucket, []).append((slot, item))
        for group in groups.values():
            top = self._ADMIT_SIZES[-1]
            for s0 in range(0, len(group), top):
                self._dispatch_admit(group[s0:s0 + top])
        if not self._active() and not self._flushing():
            self._drain()
            return False
        self._maybe_rebase()
        self._dispatch_step()
        while len(self._inflight) > self.pipeline_depth:
            self._fetch_one()
        return True

    def _drain(self) -> None:
        while self._inflight:
            self._fetch_one()

    def run_until_idle(self) -> None:
        """Drive synchronously until queue and slots are empty (tests/bench)."""
        while self._drive_once() or not self._queue.empty():
            pass
        self._drain()

    # -- background thread ------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop_evt.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="continuous-engine")
        self._thread.start()

    def stop(self) -> None:
        self._stop_evt.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def _loop(self) -> None:
        while not self._stop_evt.is_set():
            try:
                busy = self._drive_once()
            except BaseException as e:  # surface device errors to callers
                # Latch first: the device carry may be donated/corrupt, so
                # submits racing this failure must fail fast, not enqueue
                # work nobody will ever drive.
                self._dead = e
                self._fail_all(e)
                raise
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
        self._drain()
        self._fail_all(RuntimeError("engine stopped"))

    def _fail_all(self, err: BaseException) -> None:
        def _kill(req) -> None:
            if req is not None and not req.done.is_set():
                req._finish(err)

        for s in self._slots:
            # Cover flush-pending rows too: their request already left
            # `s.req` (cap-finished) but its final chunk never arrived, so
            # its consumer is still blocked on the end sentinel.
            for req in (s.req, s.prov_req):
                _kill(req)
            s.req = None
            s.flush_step = None
        # A cap-finished request whose slot was already RE-ADMITTED (admit
        # replaces prov_req) exists only in the unfetched in-flight payloads
        # at this point — scan those too, or its consumer hangs forever.
        while self._inflight:
            kind, payload, _outs = self._inflight.popleft()
            if kind == "admit":
                for _slot_i, res in payload[0]:
                    _kill(res)
            else:
                for req, _seq in payload[0]:
                    _kill(req)
        while not self._queue.empty():
            try:
                self._queue.get_nowait()[0]._finish(err)
            except queue.Empty:
                break
