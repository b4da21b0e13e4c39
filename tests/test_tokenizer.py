"""Tokenizer tests: python vs native parity; golden parity against the
HuggingFace fast tokenizer on the real Mistral tokenizer.json when present.

The reference embeds golden token-id tests (tokeniser2.swift:295-338); we
generate goldens from an independent oracle (transformers) instead.
"""

import os
import json

import pytest

from effort_tpu.runtime.tokenizer import Tokenizer

pytestmark = pytest.mark.smoke

REF_JSON = "/root/reference/tokenizer.json"

SAMPLES = [
    "How are you doing?",
    "hello world",
    "  leading spaces",
    "Zażółć gęślą jaźń",          # multibyte UTF-8
    "emoji 🙂 test",
    "[INST]Tell me a story.[/INST]",
    "numbers 12345 and s3par4tors",
    "",
]


def _mk(native):
    if not os.path.exists(REF_JSON):
        pytest.skip("no tokenizer.json available")
    return Tokenizer(REF_JSON, use_native=native)


@pytest.fixture(scope="module")
def tok_native():
    return _mk(True)


@pytest.fixture(scope="module")
def tok_py():
    return _mk(False)


def test_native_lib_loaded(tok_native):
    if tok_native._h is None:
        pytest.skip("native lib not built (run make in effort_tpu/native)")
    assert tok_native._h is not None


@pytest.mark.parametrize("text", SAMPLES)
def test_python_native_parity(tok_native, tok_py, text):
    assert tok_native.encode(text) == tok_py.encode(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_hf_golden_parity(tok_py, text):
    transformers = pytest.importorskip("transformers")
    hf = transformers.PreTrainedTokenizerFast(tokenizer_file=REF_JSON)
    got = tok_py.encode(text, bos=True)
    want = hf.encode(text)  # HF fast tokenizer prepends BOS itself
    assert got == want, (text, got, want)


@pytest.mark.parametrize("text", SAMPLES)
def test_roundtrip_decode(tok_py, text):
    ids = tok_py.encode(text)
    out = tok_py.decode(ids)
    assert out.strip() == text.strip()


def test_bos_eos_ids(tok_py):
    assert tok_py.bos_id == 1
    assert tok_py.eos_id == 2
