"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

This is the standard JAX substitute for multi-chip hardware in CI (SURVEY.md
§4): sharding/pjit tests run against 8 host-platform devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset 'axon' (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend in every interpreter and
# forces jax_platforms="axon,cpu", overriding the env var — override it back:
# unit tests must run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

import pytest  # noqa: E402

import csm_mlx_tpu.config as config_mod  # noqa: E402
from csm_mlx_tpu.config import LlamaConfig  # noqa: E402
from csm_mlx_tpu.models.csm import CSM, ModelArgs  # noqa: E402

# Register tiny test configurations so tests never build 1B-param models.
TINY_BACKBONE = LlamaConfig(
    vocab_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=128,
    hidden_size=64,
    max_position_embeddings=512,
)
TINY_DECODER = LlamaConfig(
    vocab_size=128,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=16,
    intermediate_size=64,
    hidden_size=32,
    max_position_embeddings=64,
)
config_mod.BACKBONE_CONFIGURATION["tiny"] = TINY_BACKBONE
config_mod.DECODER_CONFIGURATION["tiny"] = TINY_DECODER


def tiny_args(n_codebooks: int = 8) -> ModelArgs:
    return ModelArgs(
        backbone_name="tiny",
        decoder_name="tiny",
        n_text_vocab=256,
        n_audio_vocab=64,
        n_audio_codebooks=n_codebooks,
    )


@pytest.fixture(scope="session")
def tiny_model() -> CSM:
    import jax.numpy as jnp

    return CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(42))
