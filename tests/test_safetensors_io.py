"""safetensors reader/writer roundtrip (python + native mmap paths)."""

import os

import numpy as np
import pytest

from effort_tpu.runtime.safetensors_io import (SafeTensorReader,
                                               SafeTensorWriter,
                                               MultiShardReader)

pytestmark = pytest.mark.smoke


@pytest.fixture
def ckpt(tmp_path, rng):
    w = SafeTensorWriter(str(tmp_path), "testmodel", shard_bytes=4096)
    tensors = {
        "a.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "b.weight": rng.standard_normal((128, 4)).astype(np.float16),
        "c.ids": np.arange(100, dtype=np.int32),
        "d.big": rng.standard_normal((64, 64)).astype(np.float32),
    }
    for k, v in tensors.items():
        w.add(k, v)
    # a bf16 tensor stored as raw bits
    bf = (rng.standard_normal(32).astype(np.float32)
          .view(np.uint32) >> 16).astype(np.uint16)
    w.add("e.bf16", bf, bf16_bits=True)
    w.save()
    return str(tmp_path), tensors, bf


@pytest.mark.parametrize("use_native", [False, True])
def test_roundtrip(ckpt, use_native):
    d, tensors, bf = ckpt
    idx = [f for f in os.listdir(d) if f.endswith("index.json")]
    assert len(idx) == 1
    m = MultiShardReader(d, "testmodel")
    assert set(m.keys()) == set(tensors) | {"e.bf16"}
    for k, v in tensors.items():
        got = m[k]
        np.testing.assert_array_equal(got, v)
    # bf16 read back as bits and as f32
    np.testing.assert_array_equal(m["e.bf16"], bf)
    f32 = m._reader("e.bf16").get_f32("e.bf16")
    expect = (bf.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(f32, expect)
    m.close()


def test_sharding_happened(ckpt):
    d, _, _ = ckpt
    shards = [f for f in os.listdir(d)
              if f.endswith(".safetensors")]
    assert len(shards) >= 2  # shard_bytes=4096 forces a rollover


def test_native_mmap_zero_copy(ckpt):
    d, tensors, _ = ckpt
    shards = sorted(f for f in os.listdir(d) if f.endswith(".safetensors"))
    r = SafeTensorReader(os.path.join(d, shards[0]), use_native=True)
    k = r.keys()[0]
    arr = r[k]
    assert arr.size > 0
    r.close()
