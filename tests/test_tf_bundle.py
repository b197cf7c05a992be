"""TensorBundle reader tests.

No TF exists in this image to produce a real checkpoint, so the tests
write bundles with a minimal in-test writer implementing the documented
leveldb-SSTable + BundleEntryProto format (the same spec
tensorflow/core/util/tensor_bundle implements), covering raw and
snappy-compressed blocks, prefix-compressed keys, and the Keras
save_weights naming scheme."""

import struct

import numpy as np

from sggan_tpu.utils import tf_bundle


# ------------------------------------------------------------- mini writer

def _uv(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _block(entries, prefix_compress=False) -> bytes:
    buf = b""
    restarts = []
    prev = b""
    for k, v in entries:
        shared = 0
        if prefix_compress and prev:
            while (shared < len(prev) and shared < len(k)
                   and prev[shared] == k[shared]):
                shared += 1
        else:
            restarts.append(len(buf))
        buf += _uv(shared) + _uv(len(k) - shared) + _uv(len(v))
        buf += k[shared:] + v
        prev = k
    if not restarts:
        restarts = [0]
    buf += b"".join(struct.pack("<I", r) for r in restarts)
    buf += struct.pack("<I", len(restarts))
    return buf


def _snappy_literal(data: bytes) -> bytes:
    """Valid snappy stream using only literal tags."""
    out = _uv(len(data))
    n = len(data) - 1
    if n < 60:
        out += bytes([n << 2])
    else:
        nb = (n.bit_length() + 7) // 8
        out += bytes([(59 + nb) << 2]) + n.to_bytes(nb, "little")
    return out + data


def _entry_proto(dtype, shape, shard, offset, size) -> bytes:
    shp = b""
    for d in shape:
        shp += b"\x12" + _uv(len(b"\x08" + _uv(d))) + b"\x08" + _uv(d)
    out = b"\x08" + _uv(dtype)
    out += b"\x12" + _uv(len(shp)) + shp
    if shard:
        out += b"\x18" + _uv(shard)
    out += b"\x20" + _uv(offset) + b"\x28" + _uv(size)
    return out


def _write_table(path, kvs, compress=False):
    """kvs: list of (key bytes, value bytes), sorted by key."""
    data = b""
    # one data block holding everything
    raw = _block(kvs, prefix_compress=True)
    if compress:
        payload, ctype = _snappy_literal(raw), 1
    else:
        payload, ctype = raw, 0
    handle = _uv(0) + _uv(len(payload))
    data += payload + bytes([ctype]) + b"\x00" * 4
    # index block (raw)
    idx_off = len(data)
    idx = _block([(kvs[-1][0] + b"\x00", handle)])
    data += idx + b"\x00" + b"\x00" * 4
    # metaindex (empty block)
    meta_off = len(data)
    meta = _block([(b"\x00", b"")])
    data += meta + b"\x00" + b"\x00" * 4
    footer = (_uv(meta_off) + _uv(len(meta)) + _uv(idx_off) + _uv(len(idx)))
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    with open(path, "wb") as f:
        f.write(data + footer)


def _write_bundle(tmp_path, tensors, compress=False):
    """tensors: {name: np.ndarray}; returns the bundle prefix."""
    prefix = str(tmp_path / "cp-0000.ckpt")
    blob = b""
    kvs = [(b"", b"\x08\x01")]  # BundleHeaderProto num_shards=1
    dt_map = {np.dtype(np.float32): 1, np.dtype(np.int32): 3,
              np.dtype(np.int64): 9}
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        kvs.append((name.encode(),
                    _entry_proto(dt_map[arr.dtype], arr.shape, 0,
                                 len(blob), len(raw))))
        blob += raw
    _write_table(prefix + ".index", kvs, compress=compress)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(blob)
    return prefix


# ------------------------------------------------------------------- tests

def _roundtrip(tmp_path, compress):
    rng = np.random.default_rng(0)
    tensors = {
        "alpha/kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
        "alpha/step": np.asarray([7], np.int64),
        "beta/bias": rng.normal(size=(8,)).astype(np.float32),
    }
    prefix = _write_bundle(tmp_path, tensors, compress=compress)
    got = tf_bundle.read_bundle(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])
        assert got[k].dtype == tensors[k].dtype


def test_bundle_roundtrip_raw(tmp_path):
    _roundtrip(tmp_path, compress=False)


def test_bundle_roundtrip_snappy(tmp_path):
    _roundtrip(tmp_path, compress=True)


def test_snappy_copy_tags():
    """Back-reference decoding incl. self-overlapping RLE copies."""
    # "abcd" literal + copy(offset=4, len=8) => "abcdabcdabcd"
    src = _uv(12) + bytes([3 << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1,
                                                       4])
    assert tf_bundle._snappy_decompress(src) == b"abcdabcdabcd"
    # RLE: "x" + copy(offset=1, len=5) => "xxxxxx"
    src = _uv(6) + bytes([0 << 2]) + b"x" + bytes([((5 - 4) << 2) | 1, 1])
    assert tf_bundle._snappy_decompress(src) == b"xxxxxx"


def test_keras_weights_ordering(tmp_path):
    """save_weights names map back to get_weights() flat order."""
    t = {
        "layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE":
            np.full((2, 2), 0.0, np.float32),
        "layer_with_weights-0/bias/.ATTRIBUTES/VARIABLE_VALUE":
            np.full((2,), 1.0, np.float32),
        "layer_with_weights-1/gamma/.ATTRIBUTES/VARIABLE_VALUE":
            np.full((2,), 2.0, np.float32),
        "layer_with_weights-1/beta/.ATTRIBUTES/VARIABLE_VALUE":
            np.full((2,), 3.0, np.float32),
        "layer_with_weights-10/kernel/.ATTRIBUTES/VARIABLE_VALUE":
            np.full((2, 2), 4.0, np.float32),
        "_CHECKPOINTABLE_OBJECT_GRAPH": np.asarray([0], np.int64),
    }
    prefix = _write_bundle(tmp_path, t)
    flat = tf_bundle.keras_weights(prefix)
    assert [float(w.flat[0]) for w in flat] == [0.0, 1.0, 2.0, 3.0, 4.0]
