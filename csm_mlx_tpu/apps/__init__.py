"""Applications: real-time voice-to-voice chat pipeline + streaming STT."""
