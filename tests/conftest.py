"""Test env: force JAX onto a virtual 8-device CPU platform (so sharding
tests run without TPUs) and keep HF fully offline. Must run before any jax
import, hence the env mutation at module import time."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (real TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The axon sitecustomize registers the remote-TPU plugin and force-updates
# jax_platforms to "axon,cpu" — override it back so tests run on the
# virtual 8-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
