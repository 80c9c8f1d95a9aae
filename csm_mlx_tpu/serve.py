"""Dynamic-batching TTS server — the TPU-native serving layer.

The reference is a single-user library (one `generate()` at a time on a
Mac); it has no serving story. On TPU the economics invert: batch-8
generation delivers ~6.6x the aggregate throughput of a single stream on
one v5e chip (72x vs 11x real-time, PERFORMANCE.md), because all rows share
every weight read. This module turns that into a service: concurrent
requests are coalesced into one compiled batched generation
(`generate_batch`, one fused XLA program per (bucket, batch) shape), so a
chip serves many callers at a fraction of the per-request cost.

Design:
- `TTSServer` owns an asyncio queue and a single batcher task. The batcher
  takes the first waiting request, keeps admitting until `max_batch` or
  `max_wait_ms` elapses, then runs ONE `generate_batch` in a worker thread
  (the jitted program releases the GIL on device execution) and resolves
  each caller's future.
- Sampling parameters are server-level (the sampler is baked into the
  compiled program); text / speaker / context vary per request. Prompt
  lengths may differ — rows left-pad into the same bucket, and each row
  stops at its own EOS (generation.py here, not the reference's B=1 loop).
- `serve_http` is a dependency-free HTTP/1.1 front-end over asyncio
  streams: POST /tts {"text": ..., "speaker": 0} -> audio/wav, GET /healthz.
- `POST /tts-stream` serves the latency path instead of the throughput
  path: `stream_generate` chunks (80 ms each) leave as raw PCM over
  chunked transfer encoding as soon as each frame is decoded (p50 first
  chunk ≈ 60–100 ms on a v5e, PERFORMANCE.md). Streaming requests share
  the chip with the batcher under a device lock — streams preempt by
  arriving first; batches are not split.

No counterpart exists in the reference (cited scope:
/root/reference/run_streaming_csm_mlx.py is a local mic demo, and
/root/reference/csm_mlx/generation.py:95-178 is batch-1).
"""

from __future__ import annotations

import asyncio
import collections
import io
import json
import struct
import threading
import time
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from csm_mlx_tpu.segment import SAMPLING_RATE


class ServerOverloaded(RuntimeError):
    """Raised by synthesize() when the pending queue is at max_pending —
    the HTTP layer maps it to 503 so clients back off instead of piling
    unbounded latency onto the queue."""


@dataclass
class _Pending:
    text: str
    speaker: int
    context: Sequence
    future: asyncio.Future


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    # bounded: a long-running server must not grow (or ship via /stats) an
    # unbounded history
    batch_sizes: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=256))
    generate_seconds: float = 0.0
    audio_seconds: float = 0.0

    @property
    def aggregate_rtf(self) -> float:
        return self.audio_seconds / self.generate_seconds if self.generate_seconds else 0.0


class TTSServer:
    """Coalesces concurrent TTS requests into batched TPU generation."""

    def __init__(
        self,
        model,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 30.0,
        max_audio_length_ms: float = 30_000,
        temperature: float = 0.8,
        sampler: Optional[Any] = None,
        watermark_key: Optional[int] = None,
        mesh: Optional[Any] = None,
        transfer: str = "float32",
        max_pending: Optional[int] = None,
    ):
        """`max_batch` defaults to the resident decoder kernel's per-call
        VMEM cap (64 since round 5; bench.py lockstep aggregate measured
        +11.4% at B=64 over 48, PERFORMANCE.md round-5). Past the cap a
        batch chunks into multiple kernel calls and stays at the aggregate
        plateau (the round-2 sweep read 79x at 96 vs 150x at 48 end-to-end,
        where one huge batch loses the 2-deep compute/transfer pipeline).
        It only binds under load: light traffic still runs small batches
        after `max_wait_ms`.

        `transfer="int16"` converts waveforms to 16-bit PCM ON DEVICE and
        transfers that (half the device->host bytes — significant through
        a remote-TPU tunnel); callers still receive float32, and the HTTP
        endpoints emit 16-bit PCM anyway so the roundtrip is lossless for
        them. Default float32 keeps library results bit-exact with
        `generate_batch`.

        `max_pending` bounds the admission queue: past it, synthesize()
        raises ServerOverloaded (HTTP 503) instead of growing unbounded
        latency. None = unbounded (library default)."""
        if transfer not in ("float32", "int16"):
            raise ValueError(f"transfer must be float32|int16, got {transfer}")
        self.model = model
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.max_audio_length_ms = max_audio_length_ms
        self.temperature = temperature
        self.sampler = sampler
        self.watermark_key = watermark_key
        self.mesh = mesh
        self.transfer = transfer
        self.max_pending = max_pending
        self.stats = ServerStats()
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        # One device program at a time: batches and streams interleave at
        # request granularity instead of contending for the chip.
        self._device_lock = asyncio.Lock()
        # Up to two batches in flight: one on the device while the
        # previous one's waveforms stream back to the host (the ~8 MB/batch
        # device->host transfer rides the DMA/tunnel, not the compute units,
        # so the chip never idles waiting on it).
        self._inflight: set = set()
        self.max_inflight = 2
        # Streams waiting for the device lock (backpressure accounting:
        # max_pending bounds batch-queue depth AND lock-waiter depth).
        self._streams_pending = 0

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._batcher())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # Drain in-flight batches (their callers get results or errors).
        if self._inflight:
            await asyncio.gather(*list(self._inflight),
                                 return_exceptions=True)
        # Resolve requests still waiting in the queue — callers blocked on
        # `await fut` must never hang past a server stop.
        while not self._queue.empty():
            p = self._queue.get_nowait()
            if not p.future.done():
                p.future.set_exception(RuntimeError("TTS server stopped"))

    async def synthesize(self, text: str, speaker: int = 0,
                         context: Sequence = ()) -> np.ndarray:
        """Enqueue one utterance; resolves to a float32 24 kHz waveform.

        Raises ServerOverloaded when max_pending requests already wait."""
        if self._task is None:
            await self.start()
        if self.max_pending is not None and \
                self._queue.qsize() >= self.max_pending:
            raise ServerOverloaded(
                f"{self._queue.qsize()} requests pending (max_pending="
                f"{self.max_pending})")
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put(_Pending(text, speaker, tuple(context), fut))
        return await fut

    async def synthesize_stream(self, text: str, speaker: int = 0,
                                context: Sequence = ()):
        """Async iterator of 1,920-sample float32 chunks (80 ms each) from
        `stream_generate` — the latency path (first chunk in ~1.5 frame
        times) as opposed to `synthesize`'s throughput path. Watermarking
        is not applied here (the mark needs whole-utterance STFT framing);
        callers who need it can embed on the concatenated result.

        Raises ServerOverloaded when max_pending streams already wait for
        the device — streams queue on the device lock, so without this
        check they would bypass the backpressure bound `synthesize` has.
        """
        from csm_mlx_tpu.generation import stream_generate

        if self.max_pending is not None and \
                self._streams_pending >= self.max_pending:
            raise ServerOverloaded(
                f"{self._streams_pending} streams pending (max_pending="
                f"{self.max_pending})")

        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        done = object()
        stop = threading.Event()  # set when the consumer goes away

        def run() -> float:
            t0 = time.monotonic()
            try:
                for chunk in stream_generate(
                        self.model, text, speaker, context,
                        max_audio_length_ms=self.max_audio_length_ms,
                        temperature=self.temperature, sampler=self.sampler):
                    if stop.is_set():
                        break  # client disconnected: stop dispatching frames
                    loop.call_soon_threadsafe(
                        q.put_nowait, np.asarray(chunk, dtype=np.float32))
            except BaseException as exc:
                # BaseException too (matching the consumer's check below):
                # a non-Exception escaping here would enqueue neither the
                # error nor the sentinel and the consumer would hang forever.
                loop.call_soon_threadsafe(q.put_nowait, exc)
            else:
                loop.call_soon_threadsafe(q.put_nowait, done)
            return time.monotonic() - t0

        # The device lock covers *generation* (the executor future), not
        # consumption: chunks buffer in `q`, so a slow or stalled HTTP
        # reader must not keep the chip idle-but-locked. The lock releases
        # from fut's done-callback even if this generator is finalized
        # early (client disconnect -> GeneratorExit -> stop.set()).
        self._streams_pending += 1
        try:
            await self._device_lock.acquire()
        finally:
            self._streams_pending -= 1
        released = False

        def _release(_fut) -> None:
            nonlocal released
            if not released:
                released = True
                self._device_lock.release()

        try:
            fut = loop.run_in_executor(None, run)
        except BaseException:
            _release(None)
            raise
        fut.add_done_callback(_release)

        try:
            n_samples = 0
            while True:
                item = await q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    await fut
                    raise item
                n_samples += item.shape[-1]
                yield item
            wall = await fut
            self.stats.requests += 1
            self.stats.generate_seconds += wall
            self.stats.audio_seconds += n_samples / SAMPLING_RATE
        finally:
            stop.set()

    async def _batcher(self) -> None:
        # `batch` lives outside the try: a stop() may cancel this task at
        # any await while requests are already dequeued but not yet handed
        # to a _run_batch task — those futures must be failed here or their
        # callers hang forever (stop()'s queue drain can no longer see them).
        batch: List[_Pending] = []
        try:
            while True:
                first = await self._queue.get()
                batch = [first]
                deadline = time.monotonic() + self.max_wait_ms / 1000.0
                while len(batch) < self.max_batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        batch.append(await asyncio.wait_for(
                            self._queue.get(), timeout=remaining))
                    except asyncio.TimeoutError:
                        break
                # Pipeline: hand the batch to its own task and go back to
                # admitting requests — batch N+1 generates on the device while
                # batch N's host transfers drain (the device lock inside
                # _run_batch still serializes device programs).
                while len(self._inflight) >= self.max_inflight:
                    await asyncio.wait(self._inflight,
                                       return_when=asyncio.FIRST_COMPLETED)
                task = asyncio.create_task(self._run_batch(batch))
                batch = []
                self._inflight.add(task)
                task.add_done_callback(self._inflight.discard)
        except asyncio.CancelledError:
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(RuntimeError("TTS server stopped"))
            raise

    async def _run_batch(self, batch: List[_Pending]) -> None:
        from csm_mlx_tpu.generation import generate_batch

        texts = [p.text for p in batch]
        speakers = [p.speaker for p in batch]
        contexts = [p.context for p in batch]

        # Pad ragged batches up to a power-of-two bucket (repeating the last
        # request; extra rows are sliced off) so a server only ever compiles
        # one generation program per (prompt-bucket, batch-bucket) instead
        # of one per observed batch size.
        target = 1
        while target < len(texts):
            target *= 2
        # Clamp to max_batch. Batches past the resident decoder kernel's
        # per-call VMEM cap (64) chunk into multiple kernel calls and stay
        # at the ~500x aggregate plateau (PERFORMANCE.md), so max_batch is
        # purely a latency/HBM admission bound, not a kernel cliff.
        target = min(target, self.max_batch)
        # Sharded generation additionally requires the batch to divide
        # evenly over the mesh "data" axis.
        if self.mesh is not None:
            data_size = dict(self.mesh.shape).get("data", 1)
            while target % data_size:
                target += 1
        while len(texts) < target:
            texts.append(texts[-1])
            speakers.append(speakers[-1])
            contexts.append(contexts[-1])

        def run_device() -> Tuple[List[Any], float]:
            import jax
            import jax.numpy as jnp

            t0 = time.monotonic()
            rows = generate_batch(
                self.model, texts, speakers, contexts,
                max_audio_length_ms=self.max_audio_length_ms,
                temperature=self.temperature, sampler=self.sampler,
                watermark_key=self.watermark_key, mesh=self.mesh,
            )[:len(batch)]
            if self.transfer == "int16":
                # Quantize to 16-bit PCM on device (after watermarking):
                # the device->host fetch then moves half the bytes.
                rows = [jnp.clip(jnp.round(r * 32767.0), -32768.0,
                                 32767.0).astype(jnp.int16) for r in rows]
            # Wait for the compute, but keep the rows on the device: the
            # host transfer happens outside the device lock so the next
            # batch's programs dispatch while these bytes cross the tunnel.
            rows = jax.block_until_ready(rows)
            return rows, time.monotonic() - t0

        def fetch(rows_dev) -> List[np.ndarray]:
            out = []
            for r in rows_dev:
                a = np.asarray(r)
                if a.dtype == np.int16:
                    a = a.astype(np.float32) / 32767.0
                out.append(a.astype(np.float32, copy=False))
            return out

        try:
            async with self._device_lock:
                rows_dev, wall = await asyncio.get_running_loop() \
                    .run_in_executor(None, run_device)
            rows = await asyncio.get_running_loop().run_in_executor(
                None, fetch, rows_dev)
        except BaseException as exc:  # resolve every caller, never deadlock
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(
                        exc if isinstance(exc, Exception)
                        else RuntimeError("TTS server stopped"))
            if not isinstance(exc, Exception):
                raise  # propagate CancelledError to actually cancel
            return
        self.stats.requests += len(batch)
        self.stats.batches += 1
        self.stats.batch_sizes.append(len(batch))
        self.stats.generate_seconds += wall
        self.stats.audio_seconds += sum(r.shape[-1] for r in rows) / SAMPLING_RATE
        for p, row in zip(batch, rows):
            if not p.future.done():
                p.future.set_result(row)


class ContinuousTTSServer:
    """Serving front-end over the continuous-batching engine.

    Same public surface as `TTSServer` (synthesize / synthesize_stream /
    start / stop / stats — `serve_http` accepts either), but every request
    is a slot in ONE always-running batched frame loop
    (`csm_mlx_tpu.continuous.ContinuousEngine`): a finished row is recycled
    immediately instead of waiting for the whole batch, streaming and
    batch-style requests share the device without a lock, and audio chunks
    leave per-frame for every caller (decode-behind fused Mimi step).

    Stats semantics differ from `TTSServer`: with one always-running shared
    frame loop there is no per-request device wall, so `generate_seconds`
    accrues request LATENCY (admission wait + generation + consumption) and
    `aggregate_rtf` is a concurrency-inclusive figure, not a device-time
    RTF. The scheduler's own counters (steps, admissions, frames emitted/
    wasted) ride `self.engine.stats` and the HTTP `/stats` payload.
    """

    def __init__(
        self,
        model,
        *,
        n_slots: int = 64,  # interleaved A/Bs: 48 = 1.48x over 16 (fewer,
                            # wider step blocks amortize dispatch); 64 =
                            # 1.13x per-row over 48 at the step-block
                            # level (round 5 — the round-4 kernel variants
                            # freed the VMEM for a 64-row call; 80+ fails
                            # Mosaic compile). benchmarks/slots_ab.py +
                            # PERFORMANCE.md round-5 section.
        max_audio_length_ms: float = 30_000,
        max_prompt_bucket: int = 512,
        temperature: float = 0.8,
        sampler: Optional[Any] = None,
        watermark_key: Optional[int] = None,
        engine: Optional[Any] = None,
        max_pending: Optional[int] = None,
        transfer: str = "int16",  # measured 1.39x over float32
                                  # (benchmarks/slots_ab.py TRANSFER_A/B);
                                  # lossless for the PCM16 HTTP endpoints
        quantize_codec: bool = False,  # W8A8 Mimi decode path
                                       # (models/mimi/quant.py)
        mesh: Optional[Any] = None,  # TP/DP serving: pass after
                                     # parallel.shard_model(model, mesh)
    ):
        from csm_mlx_tpu.continuous import ContinuousEngine
        from csm_mlx_tpu.generation import FRAME_MS

        max_frames = int(max_audio_length_ms / FRAME_MS)
        self.model = model
        self.max_audio_length_ms = max_audio_length_ms
        self.watermark_key = watermark_key
        self.max_pending = max_pending
        if engine is not None and mesh is not None:
            # mesh is only forwarded into an internally constructed engine;
            # silently ignoring it for a caller-supplied engine would serve
            # unsharded while claiming multi-chip.
            raise ValueError(
                "pass mesh= to the ContinuousEngine constructor, not to "
                "ContinuousTTSServer(engine=<existing>, mesh=...)")
        self.engine = engine or ContinuousEngine(
            model, n_slots=n_slots, max_frames=max_frames,
            max_prompt_bucket=max_prompt_bucket, temperature=temperature,
            sampler=sampler, codec=True, transfer=transfer,
            quantize_codec=quantize_codec, mesh=mesh)
        if not getattr(self.engine, "has_codec", False):
            # A codec-less engine completes every request "successfully"
            # with zero-length audio — fail construction loudly instead.
            raise ValueError(
                "ContinuousTTSServer needs an engine running with a codec "
                "(ContinuousEngine(..., codec=True))")
        self.stats = ServerStats()
        self._started = False

    async def start(self) -> None:
        self.engine.start()
        self._started = True

    async def stop(self) -> None:
        self.engine.stop()
        self._started = False

    async def synthesize(self, text: str, speaker: int = 0,
                         context: Sequence = ()) -> np.ndarray:
        """One utterance -> float32 24 kHz waveform (a recycled engine slot).

        Raises ServerOverloaded when max_pending requests already queue for
        a slot."""
        if not self._started:
            await self.start()
        if self.max_pending is not None and \
                self.engine.pending() >= self.max_pending:
            raise ServerOverloaded(
                f"{self.engine.pending()} requests pending (max_pending="
                f"{self.max_pending})")
        loop = asyncio.get_running_loop()
        t0 = time.monotonic()
        res = self.engine.submit(text, speaker, tuple(context))
        fut: asyncio.Future = loop.create_future()

        def finalize() -> np.ndarray:
            # Runs on the (bounded) default executor AFTER completion: the
            # chunk drain is non-blocking by then, and watermarking (a
            # whole-utterance STFT, tens of ms) must not stall the event
            # loop. No thread ever parks on an unfinished request — done
            # callbacks replaced the old thread-per-request waiters.
            audio = res.audio()
            if self.watermark_key is not None:
                from csm_mlx_tpu.watermark import embed_watermark

                audio = np.asarray(embed_watermark(audio, self.watermark_key))
            return audio

        def schedule() -> None:
            if fut.done():
                return
            t = loop.run_in_executor(None, finalize)

            def copy(f) -> None:
                if fut.done():
                    return
                exc = f.exception()
                fut.set_exception(exc) if exc else fut.set_result(f.result())

            t.add_done_callback(copy)

        def on_done() -> None:
            try:
                loop.call_soon_threadsafe(schedule)
            except RuntimeError:
                pass  # loop closed: the awaiting task is gone anyway

        res.add_done_callback(on_done)
        try:
            audio = await fut
        except BaseException:
            res.cancel()
            raise
        self.stats.requests += 1
        self.stats.generate_seconds += time.monotonic() - t0
        self.stats.audio_seconds += audio.shape[-1] / SAMPLING_RATE
        return audio

    async def synthesize_stream(self, text: str, speaker: int = 0,
                                context: Sequence = ()):
        """Async iterator of 1,920-sample float32 chunks. Unlike the
        lockstep server there is no device lock: any number of streams
        ride the same batched frame loop concurrently.

        Raises ServerOverloaded when max_pending requests already queue for
        a slot (same bound as `synthesize` — streams are slots too)."""
        if not self._started:
            await self.start()
        if self.max_pending is not None and \
                self.engine.pending() >= self.max_pending:
            raise ServerOverloaded(
                f"{self.engine.pending()} requests pending (max_pending="
                f"{self.max_pending})")
        loop = asyncio.get_running_loop()
        res = self.engine.submit(text, speaker, tuple(context))
        q: asyncio.Queue = asyncio.Queue()
        done = object()

        def deliver(chunk) -> None:
            # Engine-thread chunk callback (replaces the old pump thread —
            # no per-stream OS thread). None is the end sentinel; the error,
            # if any, is latched on res before the sentinel is delivered.
            if chunk is None:
                chunk = res.error if res.error is not None else done
            try:
                loop.call_soon_threadsafe(q.put_nowait, chunk)
            except RuntimeError:
                pass  # loop closed mid-stream (client gone)

        res.set_chunk_callback(deliver)
        t0 = time.monotonic()
        n_samples = 0
        try:
            while True:
                item = await q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    # engine drive-loop errors are latched as BaseException
                    raise item
                n_samples += item.shape[-1]
                yield item
            self.stats.requests += 1
            self.stats.generate_seconds += time.monotonic() - t0
            self.stats.audio_seconds += n_samples / SAMPLING_RATE
        finally:
            res.cancel()  # no-op when already complete; frees the slot else


def wav_bytes(audio: np.ndarray, sample_rate: int = SAMPLING_RATE) -> bytes:
    """16-bit PCM RIFF/WAVE encoding of a float waveform (in-memory)."""
    pcm = (np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
           * 32767.0).astype("<i2").tobytes()
    buf = io.BytesIO()
    buf.write(b"RIFF")
    buf.write(struct.pack("<I", 36 + len(pcm)))
    buf.write(b"WAVEfmt ")
    buf.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16))
    buf.write(b"data")
    buf.write(struct.pack("<I", len(pcm)))
    buf.write(pcm)
    return buf.getvalue()


class _HttpError(Exception):
    """Client-input error carrying the HTTP status to answer with."""

    def __init__(self, status: str, message: str):
        super().__init__(message)
        self.status = status


# Request bodies are tiny JSON; anything beyond this is abuse. The cap is
# enforced BEFORE buffering (readexactly would happily hold gigabytes in
# RAM from a single connection otherwise).
MAX_BODY_BYTES = 1 << 20


async def _read_http_request(reader: asyncio.StreamReader):
    request_line = await reader.readline()
    if not request_line:
        return None, None, b""
    try:
        method, path, _ = request_line.decode("latin-1").split(" ", 2)
    except ValueError:
        return None, None, b""
    content_length = 0
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        name, _, value = line.decode("latin-1").partition(":")
        if name.strip().lower() == "content-length":
            try:
                content_length = int(value.strip())
            except ValueError:
                raise _HttpError("400 Bad Request",
                                 "malformed Content-Length")
    if content_length < 0:
        raise _HttpError("400 Bad Request", "malformed Content-Length")
    if content_length > MAX_BODY_BYTES:
        raise _HttpError("413 Payload Too Large",
                         f"body exceeds {MAX_BODY_BYTES} bytes")
    body = await reader.readexactly(content_length) if content_length else b""
    return method, path, body


def _parse_tts_body(body: bytes):
    """(text, speaker) from a request body; client errors -> 400."""
    try:
        req = json.loads(body or b"{}")
        text = req["text"]
        speaker = int(req.get("speaker", 0))
    except (ValueError, KeyError, TypeError):
        raise _HttpError(
            "400 Bad Request",
            'body must be JSON with a "text" field (and optional '
            'integer "speaker")')
    if not isinstance(text, str):
        raise _HttpError("400 Bad Request", '"text" must be a string')
    return text, speaker


def _http_response(status: str, content_type: str, body: bytes) -> bytes:
    head = (f"HTTP/1.1 {status}\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n")
    return head.encode("latin-1") + body


async def serve_http(server: TTSServer, host: str = "127.0.0.1",
                     port: int = 8080):
    """Start the HTTP front-end; returns the asyncio.Server (ephemeral port
    readable from `.sockets[0].getsockname()`)."""

    async def handle(reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        streamed = False  # chunked 200 header already on the wire
        try:
            method, path, body = await _read_http_request(reader)
            if method is None:
                return
            if method == "GET" and path == "/healthz":
                writer.write(_http_response("200 OK", "text/plain", b"ok"))
            elif method == "GET" and path == "/stats":
                s = server.stats
                stats = {
                    "requests": s.requests, "batches": s.batches,
                    "batch_sizes": list(s.batch_sizes),
                    "aggregate_rtf": s.aggregate_rtf,
                }
                engine = getattr(server, "engine", None)
                if engine is not None:  # continuous server: scheduler view
                    es = engine.stats
                    stats["engine"] = {
                        "steps": es.steps, "admissions": es.admissions,
                        "completed": es.completed, "rebases": es.rebases,
                        "frames_emitted": es.frames_emitted,
                        "frames_wasted": es.frames_wasted,
                        # rolling p50/p99 of admission->first-chunk and
                        # submit->first-chunk (the serving SLO metrics)
                        **es.first_chunk_latency_ms(),
                    }
                payload = json.dumps(stats).encode()
                writer.write(_http_response("200 OK", "application/json", payload))
            elif method == "POST" and path == "/tts-stream":
                text, speaker = _parse_tts_body(body)
                # Raw 24 kHz s16le PCM over chunked transfer encoding:
                # one HTTP chunk per 80 ms generation chunk. The 200
                # header is deferred until the FIRST chunk arrives so
                # pre-stream failures (overload, generation errors) can
                # still answer with a real status code instead of a
                # truncated chunked body.
                gen = server.synthesize_stream(text, speaker)
                first = None
                overloaded: Optional[ServerOverloaded] = None
                try:
                    first = await gen.__anext__()
                except StopAsyncIteration:
                    pass  # empty stream: still a valid 200
                except ServerOverloaded as exc:
                    overloaded = exc
                if overloaded is not None:
                    writer.write(_http_response(
                        "503 Service Unavailable", "application/json",
                        json.dumps({"error": str(overloaded)}).encode()))
                else:
                    writer.write(
                        b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: audio/L16; rate=24000\r\n"
                        b"Transfer-Encoding: chunked\r\n"
                        b"Connection: close\r\n\r\n")
                    streamed = True

                    async def _rest():
                        if first is not None:
                            yield first
                        async for c in gen:
                            yield c

                    async for chunk in _rest():
                        pcm = (np.clip(chunk, -1.0, 1.0)
                               * 32767.0).astype("<i2").tobytes()
                        writer.write(f"{len(pcm):x}\r\n".encode())
                        writer.write(pcm + b"\r\n")
                        await writer.drain()
                    writer.write(b"0\r\n\r\n")
            elif method == "POST" and path == "/tts":
                text, speaker = _parse_tts_body(body)
                try:
                    audio = await server.synthesize(text, speaker)
                except ServerOverloaded as exc:
                    writer.write(_http_response(
                        "503 Service Unavailable", "application/json",
                        json.dumps({"error": str(exc)}).encode()))
                else:
                    writer.write(_http_response("200 OK", "audio/wav",
                                                wav_bytes(audio)))
            else:
                writer.write(_http_response("404 Not Found", "text/plain",
                                            b"not found"))
            await writer.drain()
        except _HttpError as exc:
            try:
                writer.write(_http_response(
                    exc.status, "application/json",
                    json.dumps({"error": str(exc)}).encode()))
                await writer.drain()
            except Exception:
                pass
        except BaseException as exc:
            # BaseException: the continuous stream path re-raises engine
            # errors latched as BaseException — those must still terminate
            # the chunked framing cleanly rather than kill the connection
            # with no terminator.
            try:
                if streamed:
                    # The chunked 200 is already on the wire: a 500 body
                    # would corrupt the framing — terminate the stream.
                    writer.write(b"0\r\n\r\n")
                else:
                    writer.write(_http_response(
                        "500 Internal Server Error", "application/json",
                        json.dumps({"error": str(exc)}).encode()))
                await writer.drain()
            except Exception:
                pass
            if not isinstance(exc, Exception):
                raise  # CancelledError/KeyboardInterrupt: propagate
        finally:
            writer.close()

    await server.start()
    return await asyncio.start_server(handle, host, port)
