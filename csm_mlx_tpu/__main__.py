from csm_mlx_tpu.cli.application import app

if __name__ == "__main__":
    app()
