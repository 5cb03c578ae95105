"""ctranslate2_tpu: a TPU-native inference engine with the capabilities of
CTranslate2 (JAX / XLA / Pallas), reading CTranslate2 model directories."""

__version__ = "0.1.0"

from .runtime.translator import Translator
from .runtime.generator import Generator
from .runtime.encoder import Encoder, EncoderForwardOutput
from .runtime.whisper import (
    Whisper,
    WhisperAlignmentResult,
    WhisperGenerationResult,
)
from .runtime.wav2vec2 import Wav2Vec2, Wav2Vec2Bert
from .runtime.continuous import (
    ContinuousBatcher,
    ContinuousTranslator,
    ContinuousWhisper,
)
from .runtime.scheduler import (
    BufferedTranslationWrapper,
    ServingScheduler,
    generation_scheduler,
    translation_scheduler,
)
from .runtime.results import (
    AsyncResult,
    ExecutionStats,
    GenerationResult,
    GenerationStepResult,
    ScoringResult,
    TranslationResult,
)
from .models.loader import LoadedModel, load_model
from .utils.logging import get_log_level, set_log_level
from . import converters, models, specs

# Reference exposes one async result class per task
# (python/cpp/translator.cc etc.); here a single future-backed wrapper
# plays all three roles.
AsyncTranslationResult = AsyncResult
AsyncGenerationResult = AsyncResult
AsyncScoringResult = AsyncResult

# Serialized dtype names, in wire-format id order (reference DataType enum,
# include/ctranslate2/types.h; ids match model.bin dtype ids).
from .formats.model_file import _DTYPE_IDS as _dtype_ids


class DataType:
    """Names of the serializable tensor dtypes (reference: ctranslate2.DataType)."""


for _name in _dtype_ids:
    setattr(DataType, _name, _name)
del _name


class Device:
    """Supported device kinds (reference: ctranslate2.Device, minus CUDA)."""
    cpu = "cpu"
    tpu = "tpu"


class MpiInfo:
    """Multi-process topology introspection (reference: python/cpp/mpi.cc).

    Ranks come from jax.distributed process indices instead of MPI."""

    @staticmethod
    def getNRanks() -> int:
        import jax

        return jax.process_count()

    @staticmethod
    def getCurRank() -> int:
        import jax

        return jax.process_index()

    @staticmethod
    def getLocalRank() -> int:
        """Node-local rank. Taken from the launcher's environment when
        available (the reference derives it from hostname grouping,
        src/devices.cc:162-186); falls back to the global index, which is
        correct for one process per host — the standard JAX topology."""
        import os

        for var in ("OMPI_COMM_WORLD_LOCAL_RANK", "SLURM_LOCALID",
                    "LOCAL_RANK", "MPI_LOCALRANKID"):
            value = os.environ.get(var)
            if value is not None:
                return int(value)
        import jax

        return jax.process_index()


def get_cuda_device_count() -> int:
    """Always 0: this runtime drives TPUs (reference: get_cuda_device_count)."""
    return 0


def get_tpu_device_count() -> int:
    import jax

    return len([d for d in jax.devices() if d.platform == "tpu"])

_RANDOM_SEED = 0


def set_random_seed(seed: int) -> None:
    """Set the seed used by sampling decoders (parity with the reference's
    global set_random_seed: src/random.cc)."""
    global _RANDOM_SEED
    _RANDOM_SEED = seed


def get_random_seed() -> int:
    return _RANDOM_SEED


def get_device_info() -> dict:
    """Topology introspection (analog of the reference MpiInfo binding)."""
    from .parallel.sharding import device_info

    return device_info()


def contains_model(path: str) -> bool:
    import os

    return os.path.isfile(os.path.join(path, "model.bin"))


def get_supported_compute_types(device: str = "auto") -> set:
    """Compute types executable on ``device`` (reference:
    ctranslate2.get_supported_compute_types, src/types.cc). Every
    accepted type loads and runs on both the TPU and CPU backends
    (float16 executes as bfloat16 on TPU, int16 dequantizes at load),
    matching the reference's "supported = runnable" semantics."""
    from .utils.dtypes import COMPUTE_TYPES

    device = (device or "auto").lower()
    if device not in ("auto", "cpu", "tpu"):
        raise ValueError(
            f"unsupported device {device!r} (this runtime supports "
            "'auto', 'cpu' and 'tpu')")
    return {t for t in COMPUTE_TYPES if t not in ("default", "auto")}
