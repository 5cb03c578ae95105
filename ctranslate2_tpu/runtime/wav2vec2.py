"""Wav2Vec2: encoder-only speech-to-logits API (CTC decoding happens
outside, as in the reference: src/models/wav2vec2.cc, src/layers/wav2vec2.cc).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import transformer as T
from ..models.loader import LoadedModel, load_model
from .base import TaskAPIMixin
from ..ops.activations import gelu
from ..ops.conv import conv1d
from ..ops.linear import linear
from ..ops.norms import apply_norm


def _norm(arch, p, x):
    if p is None:
        return x
    eps = arch.ln_epsilon
    if eps is None:
        eps = 1e-5 if "beta" in p else 1e-6
    return apply_norm(p, x, eps)


def wav2vec2_forward(arch, params: dict, consts: dict, features,
                     quantize_acts: bool = True, out_dtype=jnp.float32):
    """Wav2Vec2 forward: raw features [B, C, T] -> logits or hidden states
    (reference: src/layers/wav2vec2.cc:74-125)."""
    spec = arch.encoder
    ep = params["encoder"]

    x = features.astype(jnp.float32)

    def conv_ln_gelu(layer, x, stride):
        # conv -> LayerNorm over channels -> GELU
        # (reference: Wav2Vec2LayerNormConvLayer, wav2vec2.cc:18-28).
        x = conv1d(x, layer["conv"]["w"], layer["conv"].get("b"),
                   stride=stride, padding=0)
        xt = jnp.transpose(x, (0, 2, 1))
        xt = _norm(arch, layer["layer_norm"], xt)
        x = jnp.transpose(xt, (0, 2, 1))
        return gelu(x)

    x = conv_ln_gelu(ep["feat_layer0"], x, stride=5)
    for layer in ep["feat_layers"]:
        x = conv_ln_gelu(layer, x, stride=2)
    x = jnp.transpose(x, (0, 2, 1)).astype(out_dtype)  # [B, T', C]

    # Feature projection.
    x = _norm(arch, ep["fp_layer_norm"], x)
    x = linear(ep["fp_projection"], x, quantize_activations=quantize_acts)

    # Positional conv embedding: grouped conv (groups=16, pad=64), drop the
    # last timestep, GELU, residual (reference: wav2vec2.cc:30-46).
    pc = ep["pos_conv_embed"]["conv"]
    xt = jnp.transpose(x, (0, 2, 1))
    pos = conv1d(xt, pc["w"], pc.get("b"), stride=1, padding=64, groups=16)
    pos = pos[:, :, : xt.shape[2]]  # drop the extra frame
    pos = gelu(pos)
    x = x + jnp.transpose(pos, (0, 2, 1)).astype(x.dtype)

    # Transformer stack (pre-norm, GELU).
    from ..models.transformer import ffn_block, self_attention_block

    for i, layer in enumerate(spec.layers):
        lp = ep["layers"][i]
        x, _ = self_attention_block(
            arch, layer.self_attention, lp["self_attention"], x,
            bias=None, rot_consts=None, offset=0,
            pre_norm=spec.pre_norm, quantize_acts=quantize_acts)
        x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm,
                      quantize_acts)

    x = _norm(arch, ep.get("layer_norm"), x)
    if spec.has_lm_head:
        x = linear(ep["lm_head"], x, quantize_activations=quantize_acts)
    return x


wav2vec2_forward_jit = jax.jit(
    wav2vec2_forward, static_argnames=("arch", "quantize_acts", "out_dtype"))


class Wav2Vec2(TaskAPIMixin):
    def __init__(self, model_path: str, device: str = "auto",
                 compute_type: str = "default", device_index=0,
                 inter_threads: int = 1, intra_threads: int = 0,
                 max_queued_batches: int = 0, **kwargs):
        from ..models.loader import resolve_device
        from .pool import WorkerPool, resolve_max_queued_batches

        # tensor_parallel loads head-aligned (unfused) QKV shards
        # (reference ctor flag: include/ctranslate2/replica_pool.h).
        jax_device = resolve_device(device, device_index)
        self.model: LoadedModel = load_model(
            model_path, compute_type=compute_type,
            files=kwargs.get("files"),
            fuse_qkv=not kwargs.get("tensor_parallel", False),
            device=jax_device)
        self.device = device if device != "auto" else (
            jax_device.platform if jax_device is not None else "auto")
        self.device_index = device_index
        self.intra_threads = intra_threads
        n_dev = (len(device_index)
                 if isinstance(device_index, (list, tuple)) else 1)
        self._pool = WorkerPool(num_workers=max(1, inter_threads) * max(1, n_dev),
                                max_queued_batches=resolve_max_queued_batches(
                                    kwargs, max_queued_batches))
        self._tensor_parallel = bool(kwargs.get("tensor_parallel", False))
        self._setup_tensor_parallel(device, device_index)
        enc = self.model.arch.encoder
        if enc is None or not enc.is_wav2vec2:
            raise ValueError(
                f"The model at {model_path} is not a Wav2Vec2 model")
        self._apply_flash_flag(kwargs)
        self._init_replicas(device, device_index)

    def encode(self, features, to_cpu: bool = False):
        """[B, C, T] raw features -> CTC logits (or hidden states when the
        model has no LM head)."""
        model = self.model
        out = wav2vec2_forward_jit(
            model.arch, model.params, model.consts, jnp.asarray(features),
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype)
        if to_cpu:
            return np.asarray(out)
        return out


class Wav2Vec2Bert:
    """Conformer speech encoder (reference: src/models/wav2vec2bert.cc,
    python/cpp/wav2vec2bert.cc): features -> CTC logits / hidden states."""

    def __init__(self, model_path: str, device: str = "auto",
                 compute_type: str = "default", **kwargs):
        from ..formats.model_file import load_model_file
        from ..models import wav2vec2bert as W
        from ..utils.dtypes import resolve_compute_type

        self.mf = load_model_file(model_path)
        if not W.is_wav2vec2bert(self.mf):
            raise ValueError(
                f"The model at {model_path} is not a Wav2Vec2Bert model")
        self.spec = W.extract_wav2vec2bert(self.mf)
        self.policy = resolve_compute_type(compute_type, "float32")
        self.params = W.build_wav2vec2bert_params(self.mf, self.spec, self.policy)
        self._forward = W.wav2vec2bert_forward_jit
        self.device = device
        self.device_index = kwargs.get("device_index", 0)
        self._tensor_parallel = bool(kwargs.get("tensor_parallel", False))

    @property
    def compute_type(self) -> str:
        p = self.policy
        if p.weight_dtype == "int8":
            return ("int8_" + p.activation_dtype
                    if p.activation_dtype != "float32" else "int8")
        return p.weight_dtype

    @property
    def tensor_parallel(self) -> bool:
        return self._tensor_parallel

    def encode(self, features, to_cpu: bool = False):
        """[B, T, C_feat] input features -> logits [B, T', vocab] (or the
        hidden states when the model was converted with return_hidden)."""
        out = self._forward(
            self.spec, self.params, jnp.asarray(features),
            quantize_acts=self.policy.quantize_activations,
            out_dtype=self.policy.activation_jnp)
        if to_cpu:
            return np.asarray(out.astype(jnp.float32))
        return out
