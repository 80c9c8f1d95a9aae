"""Command-line interface (argparse-based; typer is not in this image)."""
