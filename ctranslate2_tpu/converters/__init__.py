"""Converters producing CT2-format model directories.

Parity with the reference converter registry
(reference: python/ctranslate2/converters/__init__.py): Transformers,
Marian / OPUS-MT, OpenNMT-py, and Fairseq.
"""

from .transformers_conv import TransformersConverter
from .marian_conv import MarianConverter, OpusMTConverter
from .opennmt_py_conv import OpenNMTPyConverter
from .fairseq_conv import FairseqConverter

try:  # TensorFlow is optional
    from .openai_gpt2_conv import OpenAIGPT2Converter
except ImportError:  # pragma: no cover
    OpenAIGPT2Converter = None
