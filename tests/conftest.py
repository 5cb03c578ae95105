import os

# Tests run on the CPU backend with 8 virtual devices so sharding and
# collectives are exercised without TPU hardware. The axon TPU plugin
# ignores JAX_PLATFORMS, so the config update below is what actually
# forces the CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/tests/data/models"


@pytest.fixture
def tiny_model_path():
    return os.path.join(REFERENCE_MODELS, "v2", "aren-transliteration")


@pytest.fixture(params=["v1/aren-transliteration", "v1/aren-transliteration-i16",
                        "v2/aren-transliteration", "v2/aren-transliteration-i8",
                        "v2/aren-transliteration-i16"])
def any_tiny_model_path(request):
    return os.path.join(REFERENCE_MODELS, request.param)
