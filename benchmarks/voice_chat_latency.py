"""End-to-end voice-chat turn latency on TPU (VERDICT r2 #7).

Drives the real `VoiceChatPipeline` — the production asyncio workers, queues,
barge-in/cooldown gating — with fakes only at the edges the environment
can't provide (mic audio, Whisper STT weights, LLM weights):

  mic      loud numpy bursts fed through NullAudioIO (the test transport)
  STT      scripted: commits the turn's utterance once >=1 s of speech
           arrives (timestamped — this is "mic-text")
  LLM      selectable (see LLM below)
  TTS      REAL CSM-1B on-chip: W8A8 + resident decoder kernel, streaming
           chunks through generation.stream_generate, with the rolling
           voice-chat context triples (real per-turn Mimi encodes + growing
           prompts, exactly what the app does)

LLM arms (VERDICT r3 item 7 — the 329 ms round-3 number used the instant
echo LLM, so LLM streaming overlap was never in the measured path):
  LLM=echo   instant echo (round-3 configuration; pipeline+TTS floor)
  LLM=tiny   REAL `transformers` generate through `TransformersLLM`'s
             TextIteratorStreamer (worker thread, token-by-token streaming,
             sentence split -> TTS pipelining) on a tiny deterministic HF
             Llama whose greedy tokens each decode to a full sentence —
             the full production LLM *machinery* at near-zero compute
  LLM=tiny40 same, with 40 ms/token injected into the stream — the token
             cadence of a realistic local chat LLM (~25 tok/s), so first
             audio waits for a real first-sentence decode

Reports p50/p90 mic-text -> first-audio-chunk-played over N timed turns
vs the reference's 7 s first-audio threshold
(/root/reference/run_streaming_csm_mlx.py:77).

Run: python benchmarks/voice_chat_latency.py
Env: TURNS=10 WARM_TURNS=6 RESP_FRAMES=25 LLM=echo|tiny|tiny40
"""

import asyncio
import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TURNS = int(os.environ.get("TURNS", "10"))
WARM_TURNS = int(os.environ.get("WARM_TURNS", "6"))
RESP_FRAMES = int(os.environ.get("RESP_FRAMES", "25"))  # 2 s of audio
LLM = os.environ.get("LLM", "echo")          # echo | tiny | tiny40
LLM_SENTENCES = int(os.environ.get("LLM_SENTENCES", "2"))


def _tiny_hf_llm():
    """Tiny deterministic HF Llama, built offline: zero lm_head => greedy
    always picks token 0, whose vocab entry is a full sentence — every
    generated token streams one sentence through the REAL TransformersLLM
    machinery (same construction as tests/test_voice_chat.py)."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)

    sentence = "Nice to meet you friend."
    vocab = {sentence: 0, "<unk>": 1, "</s>": 2, "<pad>": 3}
    for i, w in enumerate(["hello", "benchmark", "turn", "user",
                           "assistant", ":"] + [str(n) for n in range(30)],
                          start=4):
        vocab[w] = i
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    hf_tok = PreTrainedTokenizerFast(tokenizer_object=tok,
                                     unk_token="<unk>", eos_token="</s>",
                                     pad_token="<pad>")
    cfg = LlamaConfig(vocab_size=len(vocab), hidden_size=32,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, intermediate_size=64,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        model.lm_head.weight.zero_()
    return model, hf_tok


def _make_llm():
    from csm_mlx_tpu.apps.voice_chat import TransformersLLM, echo_llm

    if LLM == "echo":
        return echo_llm
    model, tok = _tiny_hf_llm()
    base = TransformersLLM(model, tok, max_tokens=LLM_SENTENCES,
                           temperature=0.0)
    if LLM == "tiny":
        return base
    delay_ms = float(LLM.replace("tiny", "") or "40")

    def paced(messages):
        # inject a realistic local-LLM token cadence into the real stream
        for chunk in base(messages):
            time.sleep(delay_ms / 1e3)
            yield chunk

    return paced


class TimedSTT:
    """Commits one scripted utterance per speech burst; records the commit
    wall-clock (the "mic-text" instant the latency is measured from)."""

    def __init__(self):
        self.turn = 0
        self.fresh = 0
        self.commit_times = []

    def insert_audio_chunk(self, chunk):
        self.fresh += len(chunk)

    def process_iter(self):
        if self.fresh >= 16000:  # 1 s of speech committed
            self.fresh = -10**9  # one commit per burst; reset() re-arms
            self.turn += 1
            self.commit_times.append(time.monotonic())
            return f"benchmark turn {self.turn}."
        return ""

    def finish(self):
        return ""

    def reset(self):
        self.fresh = 0


class TimedAudioIO:
    """NullAudioIO + timestamps of every played chunk."""

    def __init__(self):
        self.on_input = None
        self.play_times = []
        self.played = 0

    def start(self, on_input):
        self.on_input = on_input

    def feed(self, chunk):
        if self.on_input is not None:
            self.on_input(chunk)

    def play(self, chunk):
        self.play_times.append(time.monotonic())
        self.played += 1

    def flush_output(self):
        pass

    def output_backlog(self):
        return 0.0

    def stop(self):
        pass


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    import csm_mlx_tpu.tokenizers as tok_mod
    from csm_mlx_tpu.apps import voice_chat as vc
    from csm_mlx_tpu.apps.voice_chat import (VoiceChatPipeline,
                                             build_tts_stream_fn, echo_llm)

    # Warm-turn compiles (every growing context-prompt bucket is a fresh
    # program through the remote Mosaic compiler) far exceed the production
    # 30 s per-segment timeout; the pipeline would abandon those segments
    # and the bench would never see its chunks. Timed turns reuse warmed
    # programs, so the production timeout semantics aren't what's measured
    # here anyway.
    vc.TTS_TIMEOUT_S = 1800.0
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model

    class _FakeTok:  # zero-egress: no HF Llama tokenizer download
        bos_token = "<b>"; eos_token = "<e>"
        bos_token_id = 1; eos_token_id = 2

        def encode(self, t):
            return [1] + [3 + (ord(c) % 50) for c in t[:24]] + [2]

    tok_mod.get_text_tokenizer = lambda path=None: _FakeTok()

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    # Random audio_head: zero-init would coin-flip EOS per frame (bench.py)
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02
    quantize_model(model, mode="w8a8")

    stt = TimedSTT()
    audio_io = TimedAudioIO()
    tts = build_tts_stream_fn(
        model, temperature=0.0,
        max_audio_length_ms=RESP_FRAMES * 80.0)
    llm = _make_llm()
    pipe = VoiceChatPipeline(stt, llm, tts, audio_io)
    # each LLM sentence becomes its own TTS segment of RESP_FRAMES chunks
    n_sentences = 1 if LLM == "echo" else LLM_SENTENCES
    turn_chunks = RESP_FRAMES * n_sentences

    total_turns = WARM_TURNS + TURNS

    async def scenario():
        run = asyncio.create_task(pipe.run_async())
        await asyncio.sleep(0.3)
        for turn in range(total_turns):
            stt.reset()
            played_before = audio_io.played
            commits_before = len(stt.commit_times)
            # speak loud mic-sized chunks, stopping the instant the STT
            # commits — feeding past TTS onset would read as a barge-in
            for _ in range(40):
                audio_io.feed(np.full(2000, 0.2, np.float32))
                await asyncio.sleep(0.01)
                if len(stt.commit_times) > commits_before:
                    break
            else:
                raise RuntimeError(f"turn {turn}: STT never committed")
            # wait for the response to finish playing (RESP_FRAMES chunks;
            # EOS never fires on random weights so length is deterministic)
            deadline = time.monotonic() + 600.0
            while (audio_io.played < played_before + turn_chunks
                   and time.monotonic() < deadline):
                await asyncio.sleep(0.05)
            if audio_io.played < played_before + turn_chunks:
                raise RuntimeError(
                    f"turn {turn}: TTS never produced its "
                    f"{turn_chunks} chunks (got "
                    f"{audio_io.played - played_before})")
            # let cooldown expire so the next burst isn't gated
            await asyncio.sleep(1.2)
        pipe.state.shutdown.set()
        await run

    t_all = time.monotonic()
    asyncio.run(scenario())
    wall = time.monotonic() - t_all

    # pair commit k with the first play after it
    lat = []
    for tc in stt.commit_times:
        nxt = [tp for tp in audio_io.play_times if tp > tc]
        lat.append(nxt[0] - tc if nxt else float("nan"))
    lat = np.asarray(lat, np.float64)
    timed = lat[WARM_TURNS:]
    print(json.dumps({
        "metric": "voice_chat_first_audio_p50",
        "value": round(float(np.percentile(timed, 50)) * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(7000.0 / (float(np.percentile(timed, 50))
                                       * 1e3), 1),
        "p90_ms": round(float(np.percentile(timed, 90)) * 1e3, 1),
        "max_ms": round(float(timed.max()) * 1e3, 1),
        "warm_turn_ms": [round(x * 1e3) for x in lat[:WARM_TURNS]],
        "timed_turn_ms": [round(x * 1e3) for x in timed],
        "turns": TURNS,
        "llm": LLM,
        "llm_sentences": n_sentences,
        "resp_frames": RESP_FRAMES,
        "context_segments": len(pipe.state.context_segments),
        "wall_s": round(wall, 1),
        "reference_threshold_ms": 7000,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
