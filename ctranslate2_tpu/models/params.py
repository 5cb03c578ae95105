"""Parameter pytree construction from a model artifact.

Maps the artifact's scope-named variables into a nested-dict pytree of
``jnp`` arrays laid out for TPU compute:

- linear weights are transposed to ``(in, out)`` (reference stores
  ``(out, in)``: reference src/layers/common.cc:266-312) so matmuls hit the
  MXU without a transpose;
- quantized weights keep int8 payload + per-output-channel scales when the
  dtype policy asks for int8 compute, otherwise they are dequantized at
  load (the reference's quantize/dequantize-on-load ``ensure_dtype``,
  reference: src/models/model.cc:304-369);
- embeddings stay in gather layout ``(vocab, dim)``; int8/int16 embeddings
  keep payload + scales and dequantize after gather (reference:
  src/layers/common.cc:66-81).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..formats.model_file import ModelFile, Variable
from ..utils.dtypes import DTypePolicy
from .spec import ArchSpec, AttentionSpec, DecoderSpec, EncoderSpec


def _to_np_float(var: Variable) -> np.ndarray:
    return var.as_float32()


def _dequantize(var: Variable, scale: Optional[Variable]) -> np.ndarray:
    q = var.array.astype(np.float32)
    if scale is None:
        if var.dtype_name == "int16":
            # Legacy int16 models carry no scale; the global scale is 1000
            # (reference: src/models/model.cc:310-316, src/ops/quantize.cc:8).
            return q / 1000.0
        return q
    s = scale.as_float32()
    if s.ndim == 0 or s.size == 1:
        return q / float(s.reshape(()))
    # Per-row scales align with the leading axis.
    return q / s.reshape(s.shape + (1,) * (q.ndim - s.ndim))


def _quantize_per_row(w: np.ndarray):
    """Symmetric int8 row-wise quantization (rows = output channels),
    matching the converter's behavior (reference:
    python/ctranslate2/specs/model_spec.py:228-244)."""
    amax = np.max(np.abs(w), axis=tuple(range(1, w.ndim)))
    amax = np.where(amax > 0, amax, 1.0)
    scale = 127.0 / amax
    q = np.clip(np.rint(w * scale.reshape((-1,) + (1,) * (w.ndim - 1))), -127, 127)
    return q.astype(np.int8), scale.astype(np.float32)


from ..utils.lazy import Pending as _Pending
from ..utils.lazy import pending_transpose as _PendingT  # noqa: N816


def finalize_params(tree):
    """Resolve Pending leaves with one batched device dispatch
    (see utils/lazy.py)."""
    import jax

    is_leaf = lambda x: isinstance(x, _Pending)  # noqa: E731
    flat, treedef = jax.tree.flatten(tree, is_leaf=is_leaf)
    idx = [i for i, l in enumerate(flat) if isinstance(l, _Pending)]
    if not idx:
        return tree
    pend = [flat[i] for i in idx]

    def run(arg_lists):
        return [p.fn(*args) for p, args in zip(pend, arg_lists)]

    outs = jax.jit(run)([list(p.args) for p in pend])
    for i, o in zip(idx, outs):
        flat[i] = o
    return jax.tree.unflatten(treedef, flat)


class ParamsBuilder:
    def __init__(self, mf: ModelFile, policy: DTypePolicy,
                 fuse_qkv: bool = False, stack_layers: bool = False):
        self.mf = mf
        self.policy = policy
        # Keep the artifact's fused QKV as ONE matmul for single-device
        # decode (3x fewer projection dispatches per step); tensor-parallel
        # loading needs the head-aligned split instead (see
        # parallel/sharding.py).
        self.fuse_qkv = fuse_qkv
        # Stack uniform decoder layers along a leading axis so the forward
        # can lax.scan over them (see models/transformer.py).
        self.stack_layers = stack_layers
        self.float_dtype = jnp.bfloat16 if policy.weight_dtype == "bfloat16" else jnp.float32

    # ---- leaf builders ----

    def array(self, name: str, dtype=None) -> Optional[jnp.ndarray]:
        var = self.mf.get(name)
        if var is None:
            return None
        return jnp.asarray(var.as_float32(), dtype=dtype or self.float_dtype)

    def linear(self, scope: str) -> Optional[dict]:
        """Build a linear param dict {w|wq+scale|w4+g_scale, b} from a CT2
        scope."""
        var = self.mf.get(scope + "/weight")
        if var is None:
            return None
        scale = self.mf.get(scope + "/weight_scale")
        zero = self.mf.get(scope + "/weight_zero")
        out: dict = {}

        if zero is not None:
            # AWQ 4-bit group quantization (reference:
            # python/ctranslate2/converters/transformers.py:237-248;
            # layouts: src/ops/awq/*). Kept quantized regardless of the
            # requested compute type, as in the reference. On TPU the
            # payload stays truly 4-bit (two nibbles per byte, see
            # ops/awq.py build_awq_linear_packed); CT2TPU_W4_PACKED
            # overrides.
            import os

            import jax

            from ..ops.awq import AWQ_GEMM, build_awq_linear_lazy

            quant_type = int(self.mf.config.get("quantization_type", AWQ_GEMM))
            packed_env = os.environ.get("CT2TPU_W4_PACKED")
            use_packed = (packed_env == "1" if packed_env is not None
                          else jax.default_backend() == "tpu")
            # GEMM packed layout: in-dim rows must split evenly in half.
            if quant_type == AWQ_GEMM:
                payload_in = var.shape[0]
            else:
                payload_in = var.shape[1] * 8
            out = build_awq_linear_lazy(
                var.array, scale.as_float32(), zero.array, quant_type,
                packed=use_packed and payload_in % 2 == 0)
        elif var.dtype_name in ("int8", "int16"):
            if self.policy.weight_dtype == "int8" and var.dtype_name == "int8":
                out["wq"] = _PendingT(var.array)
                s = scale.as_float32()
                out["scale"] = jnp.asarray(
                    np.broadcast_to(s.reshape(-1), (var.shape[0],))
                    if s.size in (1, var.shape[0])
                    else s
                )
            else:
                w = _dequantize(var, scale)
                if self.policy.weight_dtype == "int8":
                    q, s = _quantize_per_row(w)
                    out["wq"] = _PendingT(q)
                    out["scale"] = jnp.asarray(s)
                else:
                    out["w"] = _PendingT(w, self.float_dtype)
        else:
            w = _to_np_float(var)
            if self.policy.weight_dtype == "int8":
                q, s = _quantize_per_row(w)
                out["wq"] = _PendingT(q)
                out["scale"] = jnp.asarray(s)
            else:
                out["w"] = _PendingT(w, self.float_dtype)

        bias = self.mf.get(scope + "/bias")
        if bias is not None:
            out["b"] = jnp.asarray(bias.as_float32(), dtype=jnp.float32)
        return out

    def norm(self, scope: str) -> Optional[dict]:
        gamma = self.mf.get(scope + "/gamma")
        if gamma is None:
            return None
        g = gamma.as_float32()
        if self.mf.flag(scope + "/layer_norm_use_residual", False):
            # Gemma RMSNorm variant: x * rms * (1 + gamma); baking the +1
            # into gamma is numerically identical
            # (reference: src/ops/rms_norm_gpu.cu:44).
            g = g + 1.0
        out = {"gamma": jnp.asarray(g, dtype=jnp.float32)}
        beta = self.mf.get(scope + "/beta")
        if beta is not None:
            out["beta"] = jnp.asarray(beta.as_float32(), dtype=jnp.float32)
        return out

    def embeddings(self, scope: str) -> Optional[dict]:
        var = self.mf.get(scope + "/weight")
        if var is None:
            return None
        scale = self.mf.get(scope + "/weight_scale")
        if var.dtype_name in ("int8", "int16"):
            # Keep quantized payload; dequantize after gather.
            if var.dtype_name == "int8":
                out = {"wq": jnp.asarray(var.array)}
            else:
                return {"w": jnp.asarray(_dequantize(var, scale), dtype=self.float_dtype)}
            s = scale.as_float32()
            out["scale"] = jnp.asarray(
                s if s.ndim else np.full((var.shape[0],), float(s), np.float32)
            )
            return out
        return {"w": jnp.asarray(_to_np_float(var), dtype=self.float_dtype)}

    # ---- composite builders ----

    def _split_linear(self, lin: dict, sizes) -> list:
        """Split a (fused) linear param dict along the output axis.

        The artifact fuses QKV into one matrix (reference:
        src/layers/attention.cc:479-519); TPU tensor parallelism wants
        head-aligned shards, so projections are stored unfused — the
        mesh-native equivalent of the reference's interleaved TP split
        (reference: src/models/model.cc:662-744).
        """
        outs = []
        offset = 0
        w_key = next(k for k in ("w4p", "w4", "wq", "w") if k in lin)
        if isinstance(lin.get(w_key), _Pending) \
                and lin[w_key].meta.get("kind") != "transpose":
            # Deferred non-transpose payloads (AWQ) slice layout-
            # specifically; materialize host-side for this rare path
            # (fused-QKV AWQ split under tensor parallelism).
            lin = {k: (v.host() if isinstance(v, _Pending) else v)
                   for k, v in lin.items()}
        for size in sizes:
            w = lin[w_key]
            if isinstance(w, _Pending):
                # Pending transposes hold the raw (out, in) layout: the
                # output axis is axis 0 (a contiguous row slice).
                part = {w_key: _PendingT(w.args[0][offset:offset + size],
                                         w.meta.get("dtype"))}
            else:
                part = {w_key: w[:, offset:offset + size]}
            if "scale" in lin:
                s = lin["scale"]
                part["scale"] = s[offset:offset + size] if s.ndim else s
            if "g_scale" in lin:
                part["g_scale"] = lin["g_scale"][:, offset:offset + size]
            if "g_zs" in lin:
                part["g_zs"] = lin["g_zs"][:, offset:offset + size]
            if "b" in lin:
                part["b"] = lin["b"][offset:offset + size]
            outs.append(part)
            offset += size
        return outs

    def attention(self, scope: str, spec: AttentionSpec) -> dict:
        H, Hkv, D = spec.num_heads, spec.num_heads_kv, spec.head_dim
        out: dict = {}
        if spec.self_attention:
            fused = self.linear(f"{scope}/linear_0")
            if self.fuse_qkv:
                out["qkv"] = fused
            else:
                out["q"], out["k"], out["v"] = self._split_linear(
                    fused, [H * D, Hkv * D, Hkv * D])
            out["o"] = self.linear(f"{scope}/linear_1")
        else:
            out["q"] = self.linear(f"{scope}/linear_0")
            fused_kv = self.linear(f"{scope}/linear_1")
            if fused_kv is not None:
                out["k"], out["v"] = self._split_linear(
                    fused_kv, [Hkv * D, Hkv * D])
            out["o"] = self.linear(f"{scope}/linear_2")
        for name in ("layer_norm", "q_norm", "k_norm", "v_norm"):
            n = self.norm(f"{scope}/{name}")
            if n is not None:
                out[name] = n
        for name in (
            "relative_attention_bias",
            "relative_position_keys",
            "relative_asymmetric_position_keys",
            "relative_position_values",
        ):
            arr = self.array(f"{scope}/{name}", dtype=jnp.float32)
            if arr is not None:
                out[name] = arr
        if spec.rotary is not None and spec.rotary.has_long_short_factors:
            out["rotary_long_factor"] = self.array(
                f"{scope}/rotary_scaling_long_factor", dtype=jnp.float32
            )
            out["rotary_short_factor"] = self.array(
                f"{scope}/rotary_scaling_short_factor", dtype=jnp.float32
            )
        if spec.has_memory_kv:
            out["memory_kv"] = self.linear(f"{scope}/memory_kv")
        return out

    def ffn(self, scope: str) -> dict:
        out = {"linear_0": self.linear(f"{scope}/linear_0"), "linear_1": self.linear(f"{scope}/linear_1")}
        noact = self.linear(f"{scope}/linear_0_noact")
        if noact is not None:
            out["linear_0_noact"] = noact
        ln = self.norm(f"{scope}/layer_norm")
        if ln is not None:
            out["layer_norm"] = ln
        return out

    def parallel_embeddings(self, scope: str, num_features: int) -> list:
        if num_features == 1:
            emb = self.embeddings(f"{scope}/embeddings")
            if emb is None:
                emb = self.embeddings(f"{scope}/embeddings_0")
            return [emb]
        return [self.embeddings(f"{scope}/embeddings_{i}") for i in range(num_features)]

    def conv(self, scope: str) -> Optional[dict]:
        var = self.mf.get(scope + "/weight")
        if var is None:
            return None
        scale = self.mf.get(scope + "/weight_scale")
        w = _dequantize(var, scale) if var.dtype_name in ("int8", "int16") \
            else _to_np_float(var)
        out = {"w": jnp.asarray(w, dtype=jnp.float32)}
        bias = self.mf.get(scope + "/bias")
        if bias is not None:
            out["b"] = jnp.asarray(bias.as_float32(), dtype=jnp.float32)
        return out

    def encoder(self, spec: EncoderSpec, scope: str = "encoder") -> dict:
        out: dict = {
            "layers": [],
        }
        if spec.is_wav2vec2:
            out["feat_layer0"] = {
                "conv": self.conv(f"{scope}/feat_layer0/conv"),
                "layer_norm": self.norm(f"{scope}/feat_layer0/layer_norm"),
            }
            out["feat_layers"] = [
                {"conv": self.conv(f"{scope}/feat_layer_{i}/conv"),
                 "layer_norm": self.norm(f"{scope}/feat_layer_{i}/layer_norm")}
                for i in range(spec.num_feat_layers)
            ]
            out["fp_layer_norm"] = self.norm(f"{scope}/fp_layer_norm")
            out["fp_projection"] = self.linear(f"{scope}/fp_projection")
            out["pos_conv_embed"] = {
                "conv": self.conv(f"{scope}/pos_conv_embed/conv")}
            if spec.has_lm_head:
                out["lm_head"] = self.linear(f"{scope}/lm_head")
        elif spec.num_conv_layers:
            out["convs"] = [
                self.conv(f"{scope}/conv{i + 1}")
                for i in range(spec.num_conv_layers)
            ]
        else:
            out["embeddings"] = self.parallel_embeddings(
                scope, spec.embeddings.num_features)
        if spec.has_position_embedding:
            out["position_encodings"] = self.array(
                f"{scope}/position_encodings/encodings"
            )
        for name in ("layernorm_embedding", "layer_norm"):
            n = self.norm(f"{scope}/{name}")
            if n is not None:
                out[name] = n
        for i, layer in enumerate(spec.layers):
            lscope = f"{scope}/layer_{i}"
            lp = {
                "self_attention": self.attention(f"{lscope}/self_attention", layer.self_attention),
                "ffn": self.ffn(f"{lscope}/ffn"),
            }
            for name in (
                "input_layer_norm",
                "post_attention_layer_norm",
                "pre_feedforward_layer_norm",
                "post_feedforward_layer_norm",
            ):
                n = self.norm(f"{lscope}/{name}")
                if n is not None:
                    lp[name] = n
            out["layers"].append(lp)
        return out

    def decoder(self, spec: DecoderSpec, scope: str = "decoder") -> dict:
        out: dict = {
            "embeddings": self.parallel_embeddings(scope, spec.embeddings.num_features),
            "layers": [],
        }
        if spec.has_position_embedding:
            out["position_encodings"] = self.array(
                f"{scope}/position_encodings/encodings"
            )
        for name in ("layernorm_embedding", "layer_norm"):
            n = self.norm(f"{scope}/{name}")
            if n is not None:
                out[name] = n
        for name in ("project_in", "project_out", "projection"):
            lin = self.linear(f"{scope}/{name}")
            if lin is not None:
                out[name] = lin
        if spec.has_outputs_scale:
            out["scale_outputs"] = self.array(f"{scope}/scale_outputs", dtype=jnp.float32)
        for i, layer in enumerate(spec.layers):
            lscope = f"{scope}/layer_{i}"
            lp = {
                "self_attention": self.attention(f"{lscope}/self_attention", layer.self_attention),
                "ffn": self.ffn(f"{lscope}/ffn"),
            }
            if layer.cross_attention is not None:
                lp["attention"] = self.attention(f"{lscope}/attention", layer.cross_attention)
            for name in (
                "shared_layer_norm",
                "input_layer_norm",
                "post_attention_layer_norm",
                "pre_feedforward_layer_norm",
                "post_feedforward_layer_norm",
                "external_pre_encoder_attention_layer_norm",
                "external_post_encoder_attention_layer_norm",
            ):
                n = self.norm(f"{lscope}/{name}")
                if n is not None:
                    lp[name] = n
            out["layers"].append(lp)
        return out


def build_params(mf: ModelFile, arch: ArchSpec, policy: DTypePolicy,
                 fuse_qkv: bool = False, stack_layers: bool = False) -> dict:
    from .spec import decoder_layers_uniform

    builder = ParamsBuilder(mf, policy, fuse_qkv=fuse_qkv)
    params: dict = {}
    if arch.encoder is not None:
        params["encoder"] = builder.encoder(arch.encoder)
    if arch.decoder is not None:
        params["decoder"] = builder.decoder(arch.decoder)
    # One batched dispatch resolves every deferred weight transpose.
    params = finalize_params(params)
    # Safety net: a leaf accidentally left as host numpy would be
    # re-uploaded on EVERY dispatch (a silent order-of-magnitude decode
    # slowdown through a remote device); force residual leaves on device.
    params = jax.tree.map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
        params)
    if arch.decoder is not None and stack_layers \
            and decoder_layers_uniform(arch):
        from .transformer import stack_layer_list

        stacked = stack_layer_list(params["decoder"]["layers"])
        if stacked is not None:
            params["decoder"]["layers"] = stacked
    return params
