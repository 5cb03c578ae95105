"""Model loading: artifact directory -> (spec, params, consts, vocabularies)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp

from ..formats.model_file import (ModelFile, load_model_file,
                                  load_model_file_from_files)
from ..formats.vocabulary import Vocabulary, VocabularyInfo
from ..utils.dtypes import DTypePolicy, resolve_compute_type
from .params import build_params
from .spec import ArchSpec, extract_arch
from . import transformer


def _weights_dtype(mf: ModelFile) -> str:
    """Dtype of the model's linear weights on disk."""
    for name, var in mf.variables.items():
        if name.endswith("/weight") and len(var.shape) == 2 and "embeddings" not in name:
            if var.dtype_name == "int32" and (name + "_zero") in mf.variables:
                # AWQ 4-bit packed weights stay quantized; the policy only
                # picks the activation float (reference forces float16:
                # src/models/model.cc quantization_type checks).
                return "float16"
            return var.dtype_name
    return "float32"


@dataclass
class LoadedModel:
    mf: ModelFile
    arch: ArchSpec
    params: dict
    policy: DTypePolicy
    consts: dict
    source_vocabularies: List[Vocabulary] = field(default_factory=list)
    target_vocabulary: Optional[Vocabulary] = None
    vmap_path: Optional[str] = None
    # vmap content for in-memory (files=) models.
    vmap_text: Optional[str] = None
    # Tensor-parallel mesh set by apply_tensor_parallel (one-flag TP);
    # params/consts carry committed NamedShardings over it.
    mesh: Optional[object] = None
    _consts_lock: object = field(default_factory=__import__("threading").Lock,
                                 repr=False, compare=False)

    @property
    def config(self) -> dict:
        return self.mf.config

    @property
    def is_sequence_to_sequence(self) -> bool:
        return self.arch.encoder is not None and self.arch.decoder is not None

    @property
    def is_decoder_only(self) -> bool:
        return self.arch.encoder is None and self.arch.decoder is not None

    @property
    def out_dtype(self):
        return self.policy.activation_jnp

    @property
    def scan_layers(self) -> bool:
        """True when decoder layer params are stacked for lax.scan."""
        dec = self.params.get("decoder")
        return dec is not None and isinstance(dec.get("layers"), dict)

    @property
    def kv_dtype(self):
        """Self-attention KV-cache dtype: jnp.int8 selects the quantized
        cache layout (CT2TPU_KV_CACHE=int8, SURVEY kernel #4); defaults to
        the activation dtype."""
        if os.environ.get("CT2TPU_KV_CACHE", "").lower() == "int8":
            return jnp.int8
        return self.policy.activation_jnp

    def ensure_consts(self, max_positions: int) -> dict:
        # Serialized: worker-pool threads may request growth concurrently.
        with self._consts_lock:
            if max_positions > self.consts.get("max_positions", 0):
                grown = 1 << max(11, (max_positions - 1).bit_length())
                consts = transformer.make_consts(
                    self.arch, self.params, grown)
                # Data-parallel replicas must keep their tables on their
                # own chip: a mixed-device jit input is an error.
                home = getattr(self, "_home_device", None)
                if home is not None:
                    consts = _consts_to_device(consts, home)
                elif self.mesh is not None:
                    from ..parallel.sharding import shard_consts

                    consts = shard_consts(consts, self.mesh)
                self.consts = consts
            return self.consts


def _map_v1_name(name: str) -> str:
    """Map spec-revision-1 (OpenNMT-tf style) variable names to the modern
    scheme (reference: src/models/transformer.cc:16-33). Each rule rewrites
    only the first occurrence."""
    rules = [
        ("transformer/", ""),
        (":0", ""),
        ("w_embs", "embeddings/weight"),
        ("kernel", "weight"),
        ("LayerNorm", "layer_norm"),
        ("dense", "projection"),
        ("conv1d_", "linear_"),
        ("conv1d", "linear_0"),
    ]
    for old, new in rules:
        name = name.replace(old, new, 1)
    if "encoder" in name:
        name = name.replace("multi_head", "self_attention", 1)
    else:
        name = name.replace("masked_multi_head", "self_attention", 1)
        name = name.replace("multi_head", "attention", 1)
    return name


_LEGACY_SPECS = ("", "TransformerBase", "TransformerBig")


def _apply_v1_mapping(mf: ModelFile) -> None:
    if mf.spec_name not in _LEGACY_SPECS or mf.spec_revision != 1:
        return
    renamed = {}
    for name, var in mf.variables.items():
        new_name = _map_v1_name(name)
        var.name = new_name
        renamed[new_name] = var
    mf.variables = renamed


def _legacy_config(mf: ModelFile) -> None:
    """Fill config defaults for pre-v6 binaries from attribute variables
    (reference: src/models/sequence_to_sequence.cc:60-77)."""

    def str_attr(name, default):
        var = mf.get(name)
        if var is None:
            return default
        return bytes(var.array.astype("int8").tobytes()).decode("utf-8")

    cfg = mf.config
    if mf.binary_version < 6:
        cfg.setdefault("unk_token", str_attr("unk_token", "<unk>"))
        cfg.setdefault("bos_token", str_attr("bos_token", "<s>"))
        cfg.setdefault("eos_token", str_attr("eos_token", "</s>"))
        cfg.setdefault("add_source_bos", bool(mf.attribute("with_source_bos", False)))
        cfg.setdefault("add_source_eos", bool(mf.attribute("with_source_eos", False)))
        if "decoder_start_token" not in cfg:
            if mf.attribute("user_decoder_start_tokens", False):
                cfg["decoder_start_token"] = None
            elif mf.attribute("with_target_bos", True):
                cfg["decoder_start_token"] = cfg["bos_token"]
            else:
                cfg["decoder_start_token"] = cfg["eos_token"]
    else:
        cfg.setdefault("unk_token", "<unk>")
        cfg.setdefault("bos_token", "<s>")
        cfg.setdefault("eos_token", "</s>")


def resolve_device(device: str, device_index=0):
    """Map a reference device string to a ``jax.Device``
    (reference: str_to_device, src/devices.cc:1-60).

    ``auto`` keeps JAX's default placement (returns None). ``cpu``/``tpu``
    select that backend explicitly; ``cuda`` is rejected — this framework
    targets TPU (plus the CPU backend for tests). ``device_index`` may be
    an int or a list of ints; replica-per-device data parallelism uses the
    mesh path instead (parallel/sharding.py), so a list selects its first
    entry for placement.
    """
    import jax

    device = (device or "auto").lower()
    if isinstance(device_index, (list, tuple)):
        if not device_index:
            raise ValueError("device index list is empty (pass at least "
                             "one device index)")
        device_index = device_index[0]
    if device == "auto":
        return None
    if device not in ("cpu", "tpu"):
        raise ValueError(
            f"unsupported device {device!r} (this runtime supports "
            "'auto', 'cpu' and 'tpu')")
    try:
        devices = jax.devices(device)
    except RuntimeError as e:
        raise ValueError(f"no {device} device is available: {e}") from None
    if device_index >= len(devices):
        raise ValueError(
            f"device index {device_index} is out of range "
            f"({len(devices)} {device} device(s) available)")
    return devices[device_index]


def resolve_devices(device: str, device_index=0) -> Optional[list]:
    """Resolve ``device_index`` (int or list of ints) to the list of
    ``jax.Device`` targets for replica-per-device data parallelism
    (reference: ``device_index=[0,1,..]`` creates one model replica per
    device, docs/parallel.md:17-40). Returns None for single default
    placement (``auto`` + scalar index 0)."""
    indices = (list(device_index)
               if isinstance(device_index, (list, tuple)) else [device_index])
    if not indices:
        raise ValueError("device index list is empty (pass at least one "
                         "device index)")
    devices = [resolve_device(device, i) for i in indices]
    if len(devices) == 1 and devices[0] is None:
        return None
    if any(d is None for d in devices):
        # auto + explicit non-zero indices: use the default backend order.
        import jax

        backend = jax.devices()
        for pos, i in enumerate(indices):
            if devices[pos] is None:
                if i >= len(backend):
                    raise ValueError(
                        f"device index {i} is out of range "
                        f"({len(backend)} device(s) available)")
                devices[pos] = backend[i]
    return devices


def _consts_to_device(consts: dict, device) -> dict:
    """device_put the array leaves of a consts pytree, keeping the
    ``max_positions`` bookkeeping int a plain int."""
    import jax

    consts = dict(consts)
    max_positions = consts.pop("max_positions", None)
    consts = jax.device_put(consts, device)
    if max_positions is not None:
        consts["max_positions"] = max_positions
    return consts


def replicate_model(model: LoadedModel, device) -> LoadedModel:
    """Shallow replica of a loaded model with its parameters copied onto
    ``device`` (reference: Model::copy_to per device,
    src/models/model.cc:786-811). The artifact reader, vocabulary and
    spec are shared; parameters and cached constants are per-device."""
    import copy
    import threading

    import jax

    replica = copy.copy(model)
    replica.params = jax.device_put(model.params, device)
    replica.consts = _consts_to_device(model.consts, device)
    replica._consts_lock = threading.Lock()
    replica._home_device = device
    return replica


def load_model(
    path: str,
    compute_type: str = "default",
    max_positions: int = 2048,
    fuse_qkv: Optional[bool] = None,
    stack_layers: Optional[bool] = None,
    device=None,
    files=None,
) -> LoadedModel:
    if isinstance(path, ModelFile):
        # In-memory artifacts (benchmarks, tests).
        mf = path
        path = ""
    elif files is not None:
        # In-memory model: ``path`` is just a display name, every artifact
        # comes from the mapping (reference: Translator(files=...) —
        # python/tests/test_translator.py test_load_model_from_memory).
        mf = load_model_file_from_files(path, files)
        path = ""
    else:
        mf = load_model_file(path)
    _apply_v1_mapping(mf)
    _legacy_config(mf)
    arch = extract_arch(mf)
    policy = resolve_compute_type(compute_type, _weights_dtype(mf))
    if fuse_qkv is None:
        fuse_qkv = os.environ.get("CT2TPU_FUSE_QKV", "1") != "0"
    if stack_layers is None:
        # Scan-over-layers cuts compile time and program size ~num_layers-
        # fold but measured ~35% slower per decode step than the unrolled
        # loop on v5e (XLA pipelines unrolled layers better); default off,
        # worth enabling for very deep models where compile dominates.
        stack_layers = os.environ.get("CT2TPU_SCAN_LAYERS", "0") == "1" \
            and fuse_qkv
    params = build_params(mf, arch, policy, fuse_qkv=fuse_qkv,
                          stack_layers=stack_layers)
    if device is not None:
        import jax

        params = jax.device_put(params, device)
    consts = transformer.make_consts(arch, params, max_positions)

    if mf.spec_name == "WhisperSpec":
        # Whisper's special tokens (reference: src/models/whisper.cc:25-29).
        info = VocabularyInfo(
            unk_token="<|endoftext|>",
            bos_token="<|startoftranscript|>",
            eos_token="<|endoftext|>",
        )
    else:
        info = VocabularyInfo(
            unk_token=mf.config.get("unk_token", "<unk>"),
            bos_token=mf.config.get("bos_token", "<s>"),
            eos_token=mf.config.get("eos_token", "</s>"),
        )

    if files is not None:
        def _load_vocab(name):
            return Vocabulary.load_from_files(files, name, info)
    elif path:
        def _load_vocab(name):
            return Vocabulary.load(path, name, info)
    else:
        def _load_vocab(name):
            return None

    shared = _load_vocab("shared_vocabulary")
    source_vocabularies = []
    target_vocabulary = None
    if shared is not None:
        source_vocabularies = [shared]
        target_vocabulary = shared
    else:
        target_vocabulary = _load_vocab("target_vocabulary")
        source = _load_vocab("source_vocabulary")
        if source is not None:
            source_vocabularies = [source]
        else:
            i = 1
            while True:
                v = _load_vocab(f"source_{i}_vocabulary")
                if v is None:
                    break
                source_vocabularies.append(v)
                i += 1
        if target_vocabulary is None:
            # Decoder-only (and converted encoder-only) models use
            # "vocabulary".
            target_vocabulary = _load_vocab("vocabulary")

    vmap = os.path.join(path, "vmap.txt") if path else ""
    vmap_text = None
    if files is not None and "vmap.txt" in files:
        from ..formats.model_file import file_content_bytes

        vmap_text = file_content_bytes(files["vmap.txt"]).decode("utf-8")

    return LoadedModel(
        mf=mf,
        arch=arch,
        params=params,
        policy=policy,
        consts=consts,
        source_vocabularies=source_vocabularies,
        target_vocabulary=target_vocabulary,
        vmap_path=vmap if (vmap and os.path.isfile(vmap)) else None,
        vmap_text=vmap_text,
    )
