"""Mesh construction and parameter/activation sharding rules.

Replaces the reference's rank-indexed weight splitting + synchronous NCCL
collectives (reference: src/models/model.cc:639-744,
src/ops/nccl_ops_gpu.cu:52-92) with a ``jax.sharding.Mesh`` and
PartitionSpecs: GSPMD inserts and overlaps the collectives over ICI.

Sharding layout (Megatron-style, matching reference §2.6 semantics):
  - attention q/k/v projections: output axis on 'model' (head-aligned —
    projections are stored unfused, see models/params.py)
  - attention output proj: input axis on 'model' (row-parallel -> psum)
  - FFN linear_0 (+GLU gate): output axis on 'model'
  - FFN linear_1: input axis on 'model' (row-parallel -> psum)
  - embeddings + logits projection: vocab axis on 'model'
  - int8 scales follow their weight's output axis
  - KV cache: head axis on 'model' (replicated when heads don't divide)
  - activations / cache batch axis: 'data'
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.spec import ArchSpec


def make_mesh(num_data: int = 1, num_model: Optional[int] = None,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_model is None:
        num_model = len(devices) // num_data
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, ("data", "model"))


def _linear_spec(lin: dict, out_axis: Optional[str], in_axis: Optional[str]):
    """PartitionSpecs for one linear param dict {w|wq, scale?, b?}."""
    spec = {}
    w_key = "wq" if "wq" in lin else "w"
    spec[w_key] = P(in_axis, out_axis)
    if "scale" in lin:
        spec["scale"] = P(out_axis) if lin["scale"].ndim else P()
    if "b" in lin:
        spec["b"] = P(out_axis)
    return spec


def _norm_spec(p: dict):
    return {k: P() for k in p}


def _emb_spec(p: dict):
    # Shard the vocab axis; scales are per-row (vocab).
    spec = {}
    if "wq" in p:
        spec["wq"] = P("model", None)
        spec["scale"] = P("model")
    else:
        spec["w"] = P("model", None)
    return spec


def _attention_specs(spec_attn, ap: dict) -> dict:
    if "qkv" in ap:
        raise ValueError(
            "Tensor-parallel sharding requires unfused QKV projections; "
            "load the model with fuse_qkv=False (or CT2TPU_FUSE_QKV=0)")
    out = {}
    divisible = spec_attn.num_heads_kv % 1 == 0  # always true; kept for clarity
    for name in ("q", "k", "v"):
        if name in ap:
            out[name] = _linear_spec(ap[name], "model", None)
    if "o" in ap:
        out["o"] = _linear_spec(ap["o"], None, "model")
    if "memory_kv" in ap:
        out["memory_kv"] = _linear_spec(ap["memory_kv"], "model", None)
    for name in ("layer_norm", "q_norm", "k_norm", "v_norm"):
        if name in ap:
            out[name] = _norm_spec(ap[name])
    for name in ("relative_attention_bias", "relative_position_keys",
                 "relative_asymmetric_position_keys", "relative_position_values",
                 "rotary_long_factor", "rotary_short_factor"):
        if name in ap:
            out[name] = P()
    return out


def _ffn_specs(fp: dict) -> dict:
    out = {
        "linear_0": _linear_spec(fp["linear_0"], "model", None),
        "linear_1": _linear_spec(fp["linear_1"], None, "model"),
    }
    if "linear_0_noact" in fp:
        out["linear_0_noact"] = _linear_spec(fp["linear_0_noact"], "model", None)
    if "layer_norm" in fp:
        out["layer_norm"] = _norm_spec(fp["layer_norm"])
    return out


def param_specs(arch: ArchSpec, params: dict) -> dict:
    """Build a PartitionSpec pytree mirroring the params pytree."""
    specs: dict = {}
    for side_name, side_spec in (("encoder", arch.encoder),
                                 ("decoder", arch.decoder)):
        if side_spec is None or side_name not in params:
            continue
        sp = params[side_name]
        # Speech encoders have a conv frontend instead of token embeddings;
        # unknown keys fall back to replicated placement (lookup_spec).
        side: dict = {"embeddings": [_emb_spec(e)
                                     for e in sp.get("embeddings", [])],
                      "layers": []}
        if "position_encodings" in sp:
            side["position_encodings"] = P()
        for name in ("layernorm_embedding", "layer_norm"):
            if name in sp:
                side[name] = _norm_spec(sp[name])
        for name in ("project_in", "project_out"):
            if name in sp:
                side[name] = _linear_spec(sp[name], None, None)
        if "projection" in sp:
            side["projection"] = _linear_spec(sp["projection"], "model", None)
        if "scale_outputs" in sp:
            side["scale_outputs"] = P()
        for i, layer_spec in enumerate(side_spec.layers):
            lp = sp["layers"][i]
            layer: dict = {
                "self_attention": _attention_specs(
                    layer_spec.self_attention, lp["self_attention"]),
                "ffn": _ffn_specs(lp["ffn"]),
            }
            if "attention" in lp:
                layer["attention"] = _attention_specs(
                    layer_spec.cross_attention, lp["attention"])
            for name in (
                "shared_layer_norm", "input_layer_norm",
                "post_attention_layer_norm", "pre_feedforward_layer_norm",
                "post_feedforward_layer_norm",
                "external_pre_encoder_attention_layer_norm",
                "external_post_encoder_attention_layer_norm",
            ):
                if name in lp:
                    layer[name] = _norm_spec(lp[name])
            side["layers"].append(layer)
        specs[side_name] = side
    return specs


def cache_specs(arch: ArchSpec, mesh: Mesh, int8: bool = False,
                stacked: bool = False):
    """PartitionSpecs for the self-attention KV cache
    ([N, Hkv, C, D]: batch on 'data', heads on 'model' when divisible).
    INT8 caches add per-vector scale arrays [N, Hkv, 1, C] sharded the
    same way; ``stacked`` prepends the layer axis (scan layout)."""
    num_model = mesh.shape["model"]

    def layer_spec(aspec, lead=()):
        head_axis = ("model"
                     if aspec.num_heads_kv % num_model == 0 else None)
        s = P(*lead, "data", head_axis, None, None)
        d = {"k": s, "v": s}
        if int8:
            d["k_scale"] = s
            d["v_scale"] = s
        return d

    if stacked:
        return layer_spec(arch.decoder.layers[0].self_attention,
                          lead=(None,))
    return [layer_spec(layer.self_attention)
            for layer in arch.decoder.layers]


def shard_cache(cache, arch: ArchSpec, mesh: Mesh):
    """Place a KV cache pytree on the mesh (batch on 'data', KV heads on
    'model'); sharded counterpart of the reference's per-rank replica
    state. Uses cache_specs and drops axes that don't divide."""
    from ..models.transformer import cache_is_stacked

    stacked = cache_is_stacked(cache)
    int8 = ("k_scale" in cache) if stacked else ("k_scale" in cache[0])
    specs = cache_specs(arch, mesh, int8=int8, stacked=stacked)

    def place(path, leaf):
        spec = fit_spec(lookup_spec(specs, path), leaf.shape, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, cache)


def fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharded axes that do not divide evenly (e.g. tiny test vocab)."""
    fixed = []
    for d, axis in enumerate(spec):
        if axis is not None and d < len(shape) and shape[d] % mesh.shape[axis] == 0:
            fixed.append(axis)
        else:
            fixed.append(None)
    return P(*fixed) if fixed else P()


def lookup_spec(specs, path) -> P:
    """Navigate a spec tree (dicts/lists with PartitionSpec leaves) by a
    jax tree path."""
    node = specs
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "idx", None)
        if isinstance(node, dict):
            if key not in node:
                return P()
            node = node[key]
        elif isinstance(node, list):
            node = node[key]
        else:
            break
    return node if isinstance(node, P) else P()


def shard_params(params: dict, arch: ArchSpec, mesh: Mesh) -> dict:
    """Place the parameter pytree on the mesh with TP shardings."""
    specs = param_specs(arch, params)

    def place(path, leaf):
        spec = fit_spec(lookup_spec(specs, path), leaf.shape, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_consts(consts: dict, mesh: Mesh) -> dict:
    """Replicate precomputed tables across the mesh."""

    def place(leaf):
        if hasattr(leaf, "shape"):
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    return jax.tree.map(place, consts)


def apply_tensor_parallel(model, device: str = "auto",
                          device_index=0) -> Mesh:
    """One-flag tensor parallelism: build a mesh over the visible devices
    and place the loaded model's params/consts with TP shardings — the
    load-time analog of the reference's ``tensor_parallel=True`` weight
    split (reference: src/models/model.cc:827-899). No manual
    ``make_mesh``/``shard_params`` is needed afterwards: the committed
    NamedShardings propagate through every jitted compute path (GSPMD),
    so task APIs, device loops and the continuous engines all run
    tensor-parallel automatically.

    ``device_index``: a scalar keeps a pure-TP 1-D layout over all
    visible devices; a list of N indices adds a data axis of size N (one
    replica group per entry), with the model axis spanning the remaining
    factor — the mesh analog of the reference's replica-per-device list.
    """
    import jax

    backend = None if device in (None, "auto") else device
    devices = jax.devices(backend) if backend else jax.devices()
    num_data = (len(device_index)
                if isinstance(device_index, (list, tuple)) else 1)
    if num_data < 1 or len(devices) % num_data:
        raise ValueError(
            f"cannot build a tensor-parallel mesh: {len(devices)} visible "
            f"device(s) do not divide into {num_data} replica group(s)")
    mesh = make_mesh(num_data=num_data, devices=devices)
    model.params = shard_params(model.params, model.arch, mesh)
    model.consts = shard_consts(model.consts, mesh)
    model.mesh = mesh
    # Long-prompt prefill may additionally shard the SEQUENCE over the
    # data axis (ring attention; parallel/context.py) — registered here
    # so the attention dispatch can see the mesh.
    from .context import enable_context_parallel

    enable_context_parallel(mesh, axis="data")
    return mesh


def initialize_distributed(coordinator_address: str = None,
                           num_processes: int = None,
                           process_id: int = None):
    """Multi-host initialization (replaces the reference's MPI bootstrap,
    reference: src/devices.cc:141-230 ScopedMPISetter): wires
    ``jax.distributed.initialize`` so a mesh can span hosts; collectives
    ride ICI within a slice and DCN across slices."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def device_info() -> dict:
    """Runtime topology introspection (the analog of the reference's
    MpiInfo binding, reference: python/cpp/mpi.cc)."""
    import jax

    return {
        "platform": jax.default_backend(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "device_count": jax.device_count(),
    }
