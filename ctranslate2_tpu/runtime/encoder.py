"""Encoder: the encoder-only task API
(parity with reference: include/ctranslate2/encoder.h:9-25,
src/models/language_model.cc:340-403)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models import transformer as T
from ..models.loader import LoadedModel, load_model
from ..ops.activations import get_activation
from ..ops.linear import linear
from .batching import pad_batch


@dataclass
class EncoderForwardOutput:
    last_hidden_state: object
    pooler_output: Optional[object] = None


from .base import TaskAPIMixin


class Encoder(TaskAPIMixin):
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
        if self.model.arch.encoder is None:
            raise ValueError(
                f"The model at {model_path} does not have an encoder")
        self.device = device if device != "auto" else (
            jax_device.platform if jax_device is not None else "auto")
        self.device_index = device_index
        self.intra_threads = intra_threads
        n_dev = (len(device_index)
                 if isinstance(device_index, (list, tuple)) else 1)
        self._pool = WorkerPool(num_workers=max(1, inter_threads) * max(1, n_dev),
                                max_queued_batches=resolve_max_queued_batches(
                                    kwargs, max_queued_batches))
        self._tensor_parallel = bool(kwargs.get('tensor_parallel', False))
        self._setup_tensor_parallel(device, device_index)
        self._apply_flash_flag(kwargs)
        self._init_replicas(device, device_index)

    def forward_batch_async(self, inputs, lengths=None, token_type_ids=None):
        """Future-backed encoder forward (reference:
        include/ctranslate2/encoder.h:9-25 forward_batch_async)."""
        from .results import AsyncResult

        return AsyncResult(
            self._pool.submit(self.forward_batch, inputs, lengths=lengths,
                              token_type_ids=token_type_ids))

    def forward_batch(self, inputs,
                      lengths=None,
                      token_type_ids: Optional[Sequence[Sequence[int]]] = None
                      ) -> EncoderForwardOutput:
        """``inputs``: batch of token strings, batch of token ids, or an id
        array (the reference's BatchTokens/BatchIds/StorageView variants,
        python/cpp/encoder.cc:15-40); ``lengths`` gives the true row
        lengths for a padded dense array."""
        from .batching import normalize_input_ids

        model = self.model
        vocab = (model.source_vocabularies[0]
                 if model.source_vocabularies else model.target_vocabulary)
        ids = normalize_input_ids(inputs, vocab, lengths)
        padded, lengths = pad_batch(ids, length_multiple=8, min_length=8)
        ids_arr = jnp.asarray(padded, dtype=jnp.int32)
        lengths_arr = jnp.asarray(lengths, dtype=jnp.int32)
        # Multi-feature encoders (BERT-style token types) take the type
        # ids as a second embedding feature; absent ids default to zeros
        # (reference: src/models/language_model.cc:371-381).
        if model.arch.encoder.embeddings.num_features > 1:
            if token_type_ids is not None:
                tt = np.zeros_like(np.asarray(padded))
                for i, row in enumerate(token_type_ids):
                    tt[i, : len(row)] = row
                tt_arr = jnp.asarray(tt, dtype=jnp.int32)
            else:
                tt_arr = jnp.zeros_like(ids_arr)
            ids_arr = (ids_arr, tt_arr)
        out = T.encoder_forward_jit(
            model.arch, model.params, model.consts, ids_arr, lengths_arr,
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype)

        pooler_output = None
        # Reference scope name (transformer_spec.py:797 "pooler_dense");
        # "pooler" is kept for artifacts written by earlier versions of
        # this converter.
        scope = next((s for s in ("pooler_dense", "pooler")
                      if model.mf.get(s + "/weight") is not None), None)
        if scope is not None:
            # BERT-style pooler: dense+tanh on the first token.
            from ..models.params import ParamsBuilder, finalize_params

            builder = ParamsBuilder(model.mf, model.policy)
            pooler_params = finalize_params(builder.linear(scope))
            act_id = int(model.mf.attribute("pooler_activation", 5))
            pooler_output = linear(
                pooler_params, out[:, 0],
                activation=get_activation(act_id),
                quantize_activations=model.policy.quantize_activations)
        return EncoderForwardOutput(out, pooler_output)
