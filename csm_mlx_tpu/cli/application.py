"""CLI root (parity with /root/reference/csm_mlx/cli/application.py).

Usage:
  csm-tpu generate TEXT -o out.wav [...]
  csm-tpu serve --port 8080 [...]
  csm-tpu finetune full {sft,dpo,kto} [...]
  csm-tpu finetune lora {sft,dpo,kto} [...]
  csm-tpu finetune convert INPUT_DIR OUTPUT_JSON
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="csm-tpu",
        description="CSM(Conversational Speech Model) on TPU, with "
                    "generation and finetuning support.",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    from csm_mlx_tpu.cli import generate as generate_cli
    from csm_mlx_tpu.cli import serve as serve_cli

    generate_cli.add_parser(sub)
    serve_cli.add_parser(sub)

    ft = sub.add_parser("finetune", help="Finetune CSM models.")
    ft_sub = ft.add_subparsers(dest="finetune_command", required=True)

    from csm_mlx_tpu.cli.finetune import dataset as convert_cli
    from csm_mlx_tpu.cli.finetune import full_finetune, lora_finetune

    full_finetune.add_parser(ft_sub)
    lora_finetune.add_parser(ft_sub)
    convert_cli.add_parser(ft_sub)
    return parser


def app(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    app()
