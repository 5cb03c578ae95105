import numpy as np
import pytest

from ctranslate2_tpu.formats.model_file import (
    ModelFile,
    Variable,
    load_model_file,
    make_variable,
)


def test_load_tiny_v2(tiny_model_path):
    mf = load_model_file(tiny_model_path)
    assert mf.spec_name == "TransformerBase"
    assert mf.binary_version == 2
    w = mf.get("encoder/layer_0/self_attention/linear_0/weight")
    assert w.shape == (96, 32)
    assert w.dtype_name == "float32"


def test_load_all_versions(any_tiny_model_path):
    mf = load_model_file(any_tiny_model_path)
    assert len(mf.variables) > 100
    if mf.binary_version >= 2:
        assert "decoder/embeddings/weight" in mf
    else:
        # v1 names are raw OpenNMT-tf names; the loader remaps them.
        from ctranslate2_tpu.models.loader import _apply_v1_mapping

        _apply_v1_mapping(mf)
        assert "decoder/embeddings/weight" in mf


def test_roundtrip(tmp_path):
    mf = ModelFile(spec_name="TransformerSpec", spec_revision=7, binary_version=6)
    mf.variables["layer/weight"] = make_variable(
        "layer/weight", np.arange(12, dtype=np.float32).reshape(3, 4)
    )
    mf.variables["layer/weight_scale"] = make_variable(
        "layer/weight_scale", np.ones(3, np.float32)
    )
    mf.variables["num_heads"] = make_variable("num_heads", 8, "int16")
    mf.aliases["alias/weight"] = "layer/weight"
    mf.config = {"bos_token": "<s>"}
    mf.save(str(tmp_path))

    loaded = load_model_file(str(tmp_path))
    assert loaded.spec_name == "TransformerSpec"
    assert loaded.spec_revision == 7
    np.testing.assert_array_equal(
        loaded.get("layer/weight").array, mf.variables["layer/weight"].array
    )
    # Alias resolution (including derived _scale alias).
    assert loaded.get("alias/weight") is not None
    assert loaded.get("alias/weight_scale") is not None
    assert loaded.attribute("num_heads") == 8
    assert loaded.config["bos_token"] == "<s>"


def test_dedupe_aliases(tmp_path):
    """Equal variables collapse to aliases at save time, keeping the
    alphabetically first name (reference model_spec.py:169-190)."""
    mf = ModelFile(spec_name="TransformerSpec", spec_revision=7, binary_version=6)
    shared = np.arange(20, dtype=np.float32).reshape(5, 4)
    mf.variables["decoder/projection/weight"] = make_variable(
        "decoder/projection/weight", shared.copy())
    mf.variables["decoder/embeddings/weight"] = make_variable(
        "decoder/embeddings/weight", shared.copy())
    mf.variables["decoder/other/weight"] = make_variable(
        "decoder/other/weight", np.ones((5, 4), np.float32))
    # Scalars and skip-listed attributes are never aliased.
    mf.variables["a/scalar"] = make_variable("a/scalar", 3, "int32")
    mf.variables["b/scalar"] = make_variable("b/scalar", 3, "int32")
    mf.variables["l0/rotary_scaling_long_factor"] = make_variable(
        "l0/rotary_scaling_long_factor", np.ones(4, np.float32))
    mf.variables["l1/rotary_scaling_long_factor"] = make_variable(
        "l1/rotary_scaling_long_factor", np.ones(4, np.float32))

    assert mf.dedupe_aliases() == 1
    assert "decoder/projection/weight" not in mf.variables
    assert mf.aliases["decoder/projection/weight"] == "decoder/embeddings/weight"
    assert "l1/rotary_scaling_long_factor" in mf.variables

    mf.save(str(tmp_path))
    loaded = load_model_file(str(tmp_path))
    np.testing.assert_array_equal(
        loaded.get("decoder/projection/weight").array, shared)


def test_tied_embeddings_alias_roundtrip(tmp_path):
    """A converted tied-embedding model stores the shared matrix once and
    still loads and generates."""
    from ctranslate2_tpu.converters.builder import build_decoder_only_model
    from ctranslate2_tpu.formats.model_file import load_model_file as load_mf
    from ctranslate2_tpu.models.loader import load_model

    d = build_decoder_only_model(str(tmp_path / "tied"), tied_projection=True)
    mf = load_mf(d)
    assert any("projection" in a for a in mf.aliases), mf.aliases
    m = load_model(d, compute_type="float32")
    assert m is not None


def test_bfloat16_roundtrip(tmp_path):
    x = np.array([1.5, -2.25, 3.0], np.float32)
    var = make_variable("x", x, "bfloat16")
    assert var.dtype_name == "bfloat16"
    np.testing.assert_allclose(var.as_float32(), x, rtol=1e-2)


def test_no_host_leaves_after_load(tmp_path):
    """Every param leaf must live on device after load — a residual host
    numpy leaf re-uploads on EVERY dispatch (silent decode slowdown)."""
    import numpy as np
    import jax

    from ctranslate2_tpu.converters.builder import build_decoder_only_model
    from ctranslate2_tpu.models.loader import load_model

    for quant in (None, "int8", "awq_gemm", "awq_gemv"):
        d = build_decoder_only_model(
            str(tmp_path / f"m_{quant}"), quantization=quant,
            rotary_dim=8, glu=True, rms_norm=True)
        m = load_model(d, compute_type="int8" if quant == "int8" else "default")
        bad = [
            jax.tree_util.keystr(path)
            for path, leaf in jax.tree_util.tree_flatten_with_path(m.params)[0]
            if isinstance(leaf, np.ndarray)
        ]
        assert not bad, (quant, bad)
