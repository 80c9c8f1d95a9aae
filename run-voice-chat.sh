#!/bin/bash
# Launcher for the real-time voice chat pipeline (parity with the
# reference's run-streaming-csm.sh). Requires sounddevice + an STT backend
# (faster-whisper) on the host; the TTS path runs on TPU.

set -e

WEIGHT="${WEIGHT:-senstella/csm-1b-mlx}"
SPEAKER="${SPEAKER:-0}"
TEMPERATURE="${TEMPERATURE:-0.8}"
WHISPER_MODEL="${WHISPER_MODEL:-large-v3}"
STT_LANGUAGE="${STT_LANGUAGE:-en}"
MAX_AUDIO_MS="${MAX_AUDIO_MS:-10000}"
QUANTIZE="${QUANTIZE:-}"            # set to 1 to enable int4 quantization
QUANTIZE_BITS="${QUANTIZE_BITS:-4}"
QUANTIZE_GROUP="${QUANTIZE_GROUP:-64}"
ADAPTER="${ADAPTER:-}"

ARGS=(
  --weight "$WEIGHT"
  --speaker "$SPEAKER"
  --temperature "$TEMPERATURE"
  --whisper-model "$WHISPER_MODEL"
  --stt-language "$STT_LANGUAGE"
  --max-audio-length-ms "$MAX_AUDIO_MS"
)
[ -n "$QUANTIZE" ] && ARGS+=(--quantize --quantize-bits "$QUANTIZE_BITS" \
                             --quantize-group-size "$QUANTIZE_GROUP")
[ -n "$ADAPTER" ] && ARGS+=(--adapter-file "$ADAPTER")

exec python -m csm_mlx_tpu.apps.voice_chat "${ARGS[@]}" "$@"
