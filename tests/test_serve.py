"""Dynamic-batching TTS server: coalescing, HTTP front-end, error paths.

Runs fully offline: tiny random model, fake text tokenizer, random-weight
Mimi (same pattern as test_integration.py)."""

import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import csm_mlx_tpu.tokenizers as tok_mod
from conftest import tiny_args
from csm_mlx_tpu.models.csm import CSM
from csm_mlx_tpu.serve import TTSServer, serve_http, wav_bytes


class FakeTextTokenizer:
    bos_token = "<b>"
    eos_token = "<e>"
    bos_token_id = 1
    eos_token_id = 2

    def encode(self, text: str):
        return [1] + [3 + (ord(c) % 50) for c in text[:10]] + [2]


@pytest.fixture()
def offline_tokenizers(monkeypatch):
    monkeypatch.setattr(tok_mod, "get_text_tokenizer",
                        lambda path=None: FakeTextTokenizer())
    tok_mod.get_audio_tokenizer.cache_clear()
    yield
    tok_mod.get_audio_tokenizer.cache_clear()


@pytest.fixture(scope="module")
def model():
    return CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
               rng=jax.random.PRNGKey(0))


def test_concurrent_requests_batch_together(offline_tokenizers, model):
    async def main():
        server = TTSServer(model, max_batch=4, max_wait_ms=200,
                           max_audio_length_ms=400, temperature=0.0)
        rows = await asyncio.gather(*[
            server.synthesize(f"hello {i}", speaker=i % 2) for i in range(4)
        ])
        await server.stop()
        return server, rows

    server, rows = asyncio.run(main())
    assert len(rows) == 4
    for r in rows:
        assert isinstance(r, np.ndarray) and r.ndim == 1 and r.size > 0
    assert server.stats.requests == 4
    # All four arrived inside the wait window -> fewer batches than requests.
    assert server.stats.batches < 4
    assert max(server.stats.batch_sizes) >= 2
    assert server.stats.aggregate_rtf > 0


def test_max_pending_backpressure(offline_tokenizers, model):
    """Past max_pending queued requests, synthesize raises ServerOverloaded
    (the HTTP layer maps it to 503) instead of growing unbounded latency."""
    from csm_mlx_tpu.serve import ServerOverloaded

    async def main():
        server = TTSServer(model, max_batch=2, max_wait_ms=50,
                           max_audio_length_ms=400, temperature=0.0,
                           max_pending=1)
        # Simulate a saturated admission queue with the batcher not yet
        # draining (deterministic: no real batcher task is running).
        server._task = asyncio.create_task(asyncio.sleep(3600))
        fut = asyncio.get_running_loop().create_future()
        from csm_mlx_tpu.serve import _Pending

        await server._queue.put(_Pending("queued", 0, (), fut))
        with pytest.raises(ServerOverloaded, match="max_pending"):
            await server.synthesize("too much")
        server._queue.get_nowait()
        fut.cancel()
        server._task.cancel()
        server._task = None
        # below the limit the server works normally
        audio = await server.synthesize("ok now")
        await server.stop()
        return audio

    audio = asyncio.run(main())
    assert audio.size > 0


def test_stop_fails_batch_held_by_batcher(offline_tokenizers, model):
    """stop() may cancel the batcher while it holds an already-dequeued
    batch (waiting out max_wait_ms for more requests). Those futures are
    invisible to stop()'s queue drain — the batcher itself must fail them
    on cancellation, or the callers hang forever."""
    async def main():
        server = TTSServer(model, max_batch=4, max_wait_ms=60_000,
                           max_audio_length_ms=400, temperature=0.0)
        task = asyncio.create_task(server.synthesize("held"))
        # Let the batcher dequeue the request and park in its wait window.
        for _ in range(20):
            await asyncio.sleep(0.01)
            if server._queue.empty():
                break
        assert server._queue.empty(), "batcher never picked up the request"
        await asyncio.wait_for(server.stop(), timeout=5)
        with pytest.raises(RuntimeError, match="stopped"):
            await asyncio.wait_for(task, timeout=5)

    asyncio.run(main())


def test_int16_transfer_matches_float32(offline_tokenizers, model):
    """transfer="int16" quantizes on device and dequantizes on fetch:
    callers still get float32 within one PCM16 step of the float path."""
    async def run(transfer):
        server = TTSServer(model, max_batch=2, max_wait_ms=100,
                           max_audio_length_ms=400, temperature=0.0,
                           transfer=transfer)
        rows = await asyncio.gather(server.synthesize("hello a"),
                                    server.synthesize("hello b"))
        await server.stop()
        return rows

    f32 = asyncio.run(run("float32"))
    i16 = asyncio.run(run("int16"))
    for a, b in zip(f32, i16):
        assert b.dtype == np.float32 and a.shape == b.shape
        # int16 clips to [-1, 1] (random tiny-model audio can exceed it)
        np.testing.assert_allclose(np.clip(a, -1.0, 1.0), b,
                                   atol=1.01 / 32767.0)
    with pytest.raises(ValueError, match="transfer"):
        TTSServer(model, transfer="int8")


def test_same_text_is_deterministic_at_temp0(offline_tokenizers, model):
    async def main():
        server = TTSServer(model, max_batch=2, max_wait_ms=100,
                           max_audio_length_ms=400, temperature=0.0)
        a, b = await asyncio.gather(server.synthesize("same"),
                                    server.synthesize("same"))
        await server.stop()
        return a, b

    a, b = asyncio.run(main())
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generation_error_propagates_to_caller(model):
    # No tokenizer fake installed and no HF access -> generate_batch raises;
    # the future must carry the exception instead of hanging.
    async def main():
        server = TTSServer(model, max_wait_ms=10, max_audio_length_ms=400)
        try:
            with pytest.raises(Exception):
                await asyncio.wait_for(server.synthesize("boom"), timeout=30)
        finally:
            await server.stop()

    asyncio.run(main())


def test_http_front_end(offline_tokenizers, model):
    async def main():
        server = TTSServer(model, max_batch=4, max_wait_ms=100,
                           max_audio_length_ms=400, temperature=0.0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]

        async def post(path, payload):
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            body = json.dumps(payload).encode()
            writer.write(
                f"POST {path} HTTP/1.1\r\nHost: x\r\nContent-Length: "
                f"{len(body)}\r\n\r\n".encode() + body)
            await writer.drain()
            data = await reader.read()
            writer.close()
            return data

        async def get(path):
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
            await writer.drain()
            data = await reader.read()
            writer.close()
            return data

        health = await get("/healthz")
        wavs = await asyncio.gather(post("/tts", {"text": "a"}),
                                    post("/tts", {"text": "b", "speaker": 1}))
        bad = await post("/tts", {"nope": 1})
        missing = await get("/nope")
        stats_raw = await get("/stats")
        http.close()
        await http.wait_closed()
        await server.stop()
        return health, wavs, bad, missing, stats_raw, server

    health, wavs, bad, missing, stats_raw, server = asyncio.run(main())
    assert health.startswith(b"HTTP/1.1 200") and health.endswith(b"ok")
    for w in wavs:
        assert w.startswith(b"HTTP/1.1 200")
        assert b"audio/wav" in w
        body = w.split(b"\r\n\r\n", 1)[1]
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert bad.startswith(b"HTTP/1.1 400")
    assert missing.startswith(b"HTTP/1.1 404")
    stats = json.loads(stats_raw.split(b"\r\n\r\n", 1)[1])
    assert stats["requests"] == 2


def test_stream_and_batch_share_device_without_deadlock(offline_tokenizers, model):
    async def main():
        server = TTSServer(model, max_batch=2, max_wait_ms=50,
                           max_audio_length_ms=400, temperature=0.0)

        async def collect_stream():
            chunks = []
            async for c in server.synthesize_stream("stream me"):
                chunks.append(c)
            return chunks

        chunks, row = await asyncio.gather(collect_stream(),
                                           server.synthesize("batch me"))
        await server.stop()
        return server, chunks, row

    server, chunks, row = asyncio.run(main())
    assert len(chunks) >= 2
    for c in chunks:
        assert c.dtype == np.float32 and c.shape == (1920,)
    assert row.size > 0
    assert server.stats.requests == 2  # one streamed + one batched


def test_http_stream_endpoint(offline_tokenizers, model):
    async def main():
        server = TTSServer(model, max_wait_ms=10, max_audio_length_ms=400,
                           temperature=0.0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"text": "chunked"}).encode()
        writer.write(
            f"POST /tts-stream HTTP/1.1\r\nHost: x\r\nContent-Length: "
            f"{len(body)}\r\n\r\n".encode() + body)
        await writer.drain()
        raw = await reader.read()
        writer.close()
        http.close()
        await http.wait_closed()
        await server.stop()
        return raw

    raw = asyncio.run(main())
    head, _, payload = raw.partition(b"\r\n\r\n")
    assert head.startswith(b"HTTP/1.1 200")
    assert b"Transfer-Encoding: chunked" in head
    assert b"audio/L16" in head
    # Decode chunked transfer encoding; every chunk is one 80 ms frame.
    sizes = []
    while payload:
        size_hex, _, payload = payload.partition(b"\r\n")
        size = int(size_hex, 16)
        if size == 0:
            break
        sizes.append(size)
        payload = payload[size + 2:]  # chunk data + trailing CRLF
    assert len(sizes) >= 2
    assert all(s == 1920 * 2 for s in sizes)  # s16le, 1920 samples


def test_padded_bucket_clamps_to_max_batch(offline_tokenizers, model,
                                           monkeypatch):
    """A non-power-of-two max_batch (e.g. 48, the resident kernel's VMEM
    cap) must bucket a full batch to max_batch, not the next power of two —
    past the cap the batch would silently fall off the resident kernel."""
    import csm_mlx_tpu.generation as gen_mod

    seen = []
    real = gen_mod.generate_batch

    def spy(model_, texts, *a, **kw):
        seen.append(len(texts))
        return real(model_, texts, *a, **kw)

    monkeypatch.setattr(gen_mod, "generate_batch", spy)

    async def main():
        server = TTSServer(model, max_batch=3, max_wait_ms=300,
                           max_audio_length_ms=400, temperature=0.0)
        rows = await asyncio.gather(*[
            server.synthesize(f"clamp {i}") for i in range(3)
        ])
        await server.stop()
        return rows

    rows = asyncio.run(main())
    assert len(rows) == 3 and all(r.size > 0 for r in rows)
    # One 3-row batch, padded to 3 (clamped) — never 4.
    assert 3 in seen and all(s <= 3 for s in seen)


def test_continuous_server_mixed_requests(offline_tokenizers, model):
    """ContinuousTTSServer: batch-style and streaming callers share the
    always-running slot loop; more requests than slots recycle rows."""
    from csm_mlx_tpu.serve import ContinuousTTSServer

    async def main():
        server = ContinuousTTSServer(model, n_slots=2, max_prompt_bucket=32,
                                     max_audio_length_ms=400, temperature=0.0)

        async def one_stream():
            chunks = []
            async for c in server.synthesize_stream("stream req"):
                chunks.append(c)
            return chunks

        results = await asyncio.gather(
            *[server.synthesize(f"cont {i}") for i in range(4)],
            one_stream(),
        )
        await server.stop()
        return server, results

    server, results = asyncio.run(main())
    waves, chunks = results[:4], results[4]
    for w in waves:
        assert isinstance(w, np.ndarray) and w.ndim == 1
        assert w.size > 0 and w.size % 1920 == 0
    assert len(chunks) >= 1 and all(c.shape == (1920,) for c in chunks)
    assert server.stats.requests == 5
    assert server.engine.stats.completed == 5
    # 5 requests through 2 slots -> rows were recycled.
    assert server.engine.stats.admissions == 5


def test_continuous_server_http_front_end(offline_tokenizers, model):
    """serve_http accepts the continuous server (same duck-typed surface)."""
    from csm_mlx_tpu.serve import ContinuousTTSServer

    async def main():
        server = ContinuousTTSServer(model, n_slots=2, max_prompt_bucket=32,
                                     max_audio_length_ms=400, temperature=0.0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"text": "over http"}).encode()
        writer.write(
            f"POST /tts HTTP/1.1\r\nContent-Length: {len(body)}\r\n\r\n"
            .encode() + body)
        await writer.drain()
        payload = await reader.read()
        writer.close()
        http.close()
        await http.wait_closed()
        await server.stop()
        return payload

    payload = asyncio.run(main())
    head, _, wav = payload.partition(b"\r\n\r\n")
    assert b"200 OK" in head and wav[:4] == b"RIFF"


def test_wav_bytes_layout():
    audio = np.sin(np.linspace(0, 10, 2400)).astype(np.float32)
    data = wav_bytes(audio, 24000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) == 44 + 2 * audio.size
    import struct

    assert struct.unpack("<I", data[24:28])[0] == 24000


def test_soak_concurrent_streams_and_batches(offline_tokenizers, model):
    """Soak the device-lock logic: interleaved streaming and batched
    requests, plus one stream abandoned mid-flight (disconnect), must all
    complete — the lock releases when *generation* finishes, never held
    hostage by a consumer (the round-2 hardening's contract)."""
    async def main():
        server = TTSServer(model, max_batch=4, max_wait_ms=20,
                           max_audio_length_ms=400, temperature=0.0)

        async def one_stream(abandon=False):
            chunks = 0
            agen = server.synthesize_stream("soak stream", speaker=0)
            async for chunk in agen:
                chunks += 1
                if abandon:
                    await agen.aclose()  # simulated client disconnect
                    return -1
            return chunks

        results = await asyncio.gather(
            one_stream(abandon=True),
            *[server.synthesize(f"soak batch {i}") for i in range(6)],
            one_stream(),
            *[server.synthesize(f"soak batch {i + 6}") for i in range(3)],
            one_stream(),
        )
        await server.stop()
        assert not server._device_lock.locked()
        return server, results

    server, results = asyncio.run(main())
    streams = [r for r in results if isinstance(r, int)]
    waves = [r for r in results if isinstance(r, np.ndarray)]
    assert -1 in streams                      # the abandoned stream exited
    assert sum(1 for s in streams if s > 0) == 2  # full streams got chunks
    assert len(waves) == 9 and all(w.size > 0 for w in waves)
    assert server.stats.requests >= 11


def test_stream_backpressure(offline_tokenizers, model):
    """Streams queue on the device lock; past max_pending waiting streams
    synthesize_stream raises ServerOverloaded instead of piling latency."""
    from csm_mlx_tpu.serve import ServerOverloaded

    async def main():
        server = TTSServer(model, max_wait_ms=10, max_audio_length_ms=400,
                           temperature=0.0, max_pending=1)
        # Hold the device so the first stream parks as a lock waiter.
        await server._device_lock.acquire()
        gen1 = server.synthesize_stream("waits for device")
        t1 = asyncio.ensure_future(gen1.__anext__())
        for _ in range(20):
            await asyncio.sleep(0)
            if server._streams_pending >= 1:
                break
        assert server._streams_pending == 1
        gen2 = server.synthesize_stream("too many")
        with pytest.raises(ServerOverloaded, match="max_pending"):
            await gen2.__anext__()
        # Unblock stream 1: it must still run to completion.
        server._device_lock.release()
        chunks = [await t1]
        async for c in gen1:
            chunks.append(c)
        await server.stop()
        return chunks

    chunks = asyncio.run(main())
    assert len(chunks) >= 2 and all(c.shape == (1920,) for c in chunks)


def test_continuous_stream_backpressure(offline_tokenizers, model):
    """ContinuousTTSServer streams respect max_pending (same slot-queue
    bound as synthesize)."""
    from csm_mlx_tpu.serve import ContinuousTTSServer, ServerOverloaded

    async def main():
        server = ContinuousTTSServer(model, n_slots=2, max_prompt_bucket=32,
                                     max_audio_length_ms=400,
                                     temperature=0.0, max_pending=1)
        server._started = True  # engine deliberately NOT driving
        server.engine.submit("parked in queue")
        assert server.engine.pending() == 1
        gen = server.synthesize_stream("too many")
        with pytest.raises(ServerOverloaded, match="max_pending"):
            await gen.__anext__()

    asyncio.run(main())


def test_http_stream_overload_returns_503(offline_tokenizers, model):
    """/tts-stream defers the chunked 200 header until the first chunk, so
    an overloaded stream answers with a real 503 status."""
    from csm_mlx_tpu.serve import ContinuousTTSServer

    async def main():
        server = ContinuousTTSServer(model, n_slots=2, max_prompt_bucket=32,
                                     max_audio_length_ms=400,
                                     temperature=0.0, max_pending=0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"text": "overloaded"}).encode()
        writer.write(
            f"POST /tts-stream HTTP/1.1\r\nContent-Length: {len(body)}"
            f"\r\n\r\n".encode() + body)
        await writer.drain()
        raw = await reader.read()
        writer.close()
        http.close()
        await http.wait_closed()
        await server.stop()
        return raw

    raw = asyncio.run(main())
    assert raw.startswith(b"HTTP/1.1 503")
    assert b"Transfer-Encoding: chunked" not in raw


def test_http_stream_prestream_error_returns_500(model):
    """A generation failure BEFORE the first chunk yields a proper 500, not
    a truncated chunked 200 (no tokenizer fake installed -> stream_generate
    raises at its first step)."""
    async def main():
        server = TTSServer(model, max_wait_ms=10, max_audio_length_ms=400,
                           temperature=0.0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        body = json.dumps({"text": "boom"}).encode()
        writer.write(
            f"POST /tts-stream HTTP/1.1\r\nContent-Length: {len(body)}"
            f"\r\n\r\n".encode() + body)
        await writer.drain()
        raw = await asyncio.wait_for(reader.read(), timeout=60)
        writer.close()
        http.close()
        await http.wait_closed()
        await server.stop()
        return raw

    raw = asyncio.run(main())
    assert raw.startswith(b"HTTP/1.1 500")

def test_http_client_errors_get_4xx_not_500(offline_tokenizers, model):
    """Client-input mistakes must map to 4xx: non-integer speaker,
    non-string text, oversized and malformed Content-Length — none of
    these are server errors."""
    async def main():
        from csm_mlx_tpu.serve import serve_http

        server = TTSServer(model, max_batch=2, max_wait_ms=50,
                           max_audio_length_ms=400, temperature=0.0)
        http = await serve_http(server, host="127.0.0.1", port=0)
        port = http.sockets[0].getsockname()[1]

        async def raw(request: bytes) -> bytes:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(request)
            await writer.drain()
            data = await reader.read()
            writer.close()
            return data

        def post(path, payload) -> bytes:
            body = json.dumps(payload).encode()
            return (f"POST {path} HTTP/1.1\r\nHost: x\r\nContent-Length: "
                    f"{len(body)}\r\n\r\n".encode() + body)

        bad_speaker = await raw(post("/tts", {"text": "hi", "speaker": "loud"}))
        bad_text = await raw(post("/tts", {"text": 123}))
        bad_stream = await raw(post("/tts-stream", {"text": "x",
                                                    "speaker": [1]}))
        huge = await raw(b"POST /tts HTTP/1.1\r\nHost: x\r\n"
                         b"Content-Length: 10000000000\r\n\r\n")
        negative = await raw(b"POST /tts HTTP/1.1\r\nHost: x\r\n"
                             b"Content-Length: -5\r\n\r\n")
        garbled = await raw(b"POST /tts HTTP/1.1\r\nHost: x\r\n"
                            b"Content-Length: banana\r\n\r\n")
        ok = await raw(post("/tts", {"text": "hi", "speaker": 1}))
        http.close()
        await http.wait_closed()
        await server.stop()
        return bad_speaker, bad_text, bad_stream, huge, negative, garbled, ok

    (bad_speaker, bad_text, bad_stream, huge, negative, garbled,
     ok) = asyncio.run(main())
    for resp in (bad_speaker, bad_text, bad_stream):
        assert resp.startswith(b"HTTP/1.1 400"), resp[:60]
    assert huge.startswith(b"HTTP/1.1 413"), huge[:60]
    assert negative.startswith(b"HTTP/1.1 400"), negative[:60]
    assert garbled.startswith(b"HTTP/1.1 400"), garbled[:60]
    assert ok.startswith(b"HTTP/1.1 200"), ok[:60]


def test_continuous_server_rejects_codecless_engine(model):
    """An injected engine without a codec would serve empty audio with
    status 200 forever — construction must fail loudly."""
    from csm_mlx_tpu.continuous import ContinuousEngine
    from csm_mlx_tpu.serve import ContinuousTTSServer

    eng = ContinuousEngine(model, n_slots=2, max_frames=4,
                           max_prompt_bucket=32, capacity_slack=8,
                           codec=False)
    with pytest.raises(ValueError, match="codec"):
        ContinuousTTSServer(model, engine=eng)


def test_stream_producer_base_exception_does_not_hang(model, monkeypatch):
    """A non-Exception BaseException out of stream_generate used to escape
    the producer's `except Exception`, enqueueing neither the error nor the
    done sentinel — the consumer awaited the queue forever (with the stream
    slot accounted and the HTTP connection wedged)."""
    import csm_mlx_tpu.generation as gen_mod

    class Boom(BaseException):
        pass

    def bad_stream(*a, **k):
        raise Boom("device gave up")

    monkeypatch.setattr(gen_mod, "stream_generate", bad_stream)

    async def main():
        server = TTSServer(model, max_audio_length_ms=400)
        try:
            agen = server.synthesize_stream("x")
            with pytest.raises(Boom):
                await asyncio.wait_for(agen.__anext__(), timeout=30)
            # the device lock must free up for the next caller (release
            # lands on the executor future's done-callback, one loop tick
            # later — so acquire with a timeout rather than poll .locked())
            await asyncio.wait_for(server._device_lock.acquire(), timeout=10)
            server._device_lock.release()
        finally:
            await server.stop()

    asyncio.run(main())
