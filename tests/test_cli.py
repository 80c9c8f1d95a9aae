"""CLI wiring tests (no model downloads; parser-level + convert command)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from csm_mlx_tpu.cli.application import build_parser


def test_parser_structure():
    parser = build_parser()
    # generate flags parse
    args = parser.parse_args([
        "generate", "hello world", "-o", "/tmp/x.wav", "--temperature", "0.5",
        "--top-k", "10", "--speaker", "1",
    ])
    assert args.command == "generate"
    assert args.temperature == 0.5
    assert args.top_k == 10

    args = parser.parse_args([
        "finetune", "full", "sft", "--data-path", "/tmp/d.json",
        "--output-dir", "/tmp/out", "--batch-size", "2", "--optimizer", "adam",
    ])
    assert args.mode == "sft"
    assert args.optimizer == "adam"

    args = parser.parse_args([
        "finetune", "lora", "kto", "--data-path", "/tmp/d.json",
        "--output-dir", "/tmp/out", "--lora-rank", "4", "--beta", "0.2",
        "--target-modules", "attn", "projection",
    ])
    assert args.lora_rank == 4
    assert args.target_modules == ["attn", "projection"]

    args = parser.parse_args([
        "serve", "--port", "9000", "--max-batch", "4", "--quantize",
        "--watermark-key", "7",
    ])
    assert args.command == "serve"
    assert args.port == 9000 and args.max_batch == 4
    assert args.quantize and args.watermark_key == 7


def test_convert_command(tmp_path):
    conv = tmp_path / "conv1"
    conv.mkdir()
    from csm_mlx_tpu.utils.audio import write_audio

    for i, who in enumerate(["speaker0_utt1", "speaker1_utt2"]):
        write_audio(np.zeros(2400, dtype=np.float32), conv / f"{who}.wav", 24000)
        (conv / f"{who}.txt").write_text(f"utterance {i}")
    # one orphan audio without text -> skipped
    write_audio(np.zeros(240, dtype=np.float32), conv / "speaker0_orphan.wav",
                24000)

    out = tmp_path / "data.json"
    parser = build_parser()
    args = parser.parse_args(["finetune", "convert", str(tmp_path), str(out)])
    args.func(args)

    data = json.loads(out.read_text())
    assert len(data) == 1
    assert len(data[0]) == 2
    assert data[0][0]["speaker"] == 0
    assert data[0][1]["speaker"] == 1
    assert data[0][0]["text"] == "utterance 0"


def test_natural_sort_and_speaker_id():
    from csm_mlx_tpu.cli.finetune.utils import find_speaker_id, natural_sort_key

    names = ["utt10", "utt2", "utt1"]
    assert sorted(names, key=natural_sort_key) == ["utt1", "utt2", "utt10"]
    assert find_speaker_id("speaker3_hello.wav") == 3
    assert find_speaker_id("SPEAKER12-x.wav") == 12
    assert find_speaker_id("nospeaker.wav") is None


def test_serve_mesh_argument_parsing():
    from csm_mlx_tpu.cli.serve import parse_mesh_argument

    assert parse_mesh_argument("data=2,model=4") == {"data": 2, "model": 4}
    assert list(parse_mesh_argument("model=4,data=2")) == ["model", "data"]
    assert parse_mesh_argument("data=8") == {"data": 8}
    for bad in ("data", "data=0", "data=2,", "=4", "data=x"):
        with pytest.raises(ValueError, match="mesh axis"):
            parse_mesh_argument(bad)
    # A duplicate axis name would silently keep only the last size.
    with pytest.raises(ValueError, match="duplicate"):
        parse_mesh_argument("data=2,data=2")


def test_serve_mesh_accepts_quantize():
    """--mesh + --quantize must parse: W8A8 under a mesh runs per-shard
    through shard_map (ops/quant.py::_quant_linear_tp) since round 4."""
    parser = build_parser()
    args = parser.parse_args(["serve", "--mesh", "data=2,model=4",
                              "--quantize"])
    assert args.mesh == "data=2,model=4" and args.quantize


def test_serve_bad_mesh_exits_cleanly(monkeypatch):
    """An invalid --mesh value must surface as a clean SystemExit (no raw
    ValueError traceback) before weights are touched."""
    from csm_mlx_tpu.cli import serve as serve_cli
    import csm_mlx_tpu.cli.generate as gen_cli

    monkeypatch.setattr(gen_cli, "parse_weight_argument",
                        lambda w: (_ for _ in ()).throw(
                            AssertionError("should fail before weights")))
    parser = build_parser()
    args = parser.parse_args(["serve", "--mesh", "data=oops"])
    with pytest.raises(SystemExit, match="mesh axis"):
        serve_cli.run(args)
