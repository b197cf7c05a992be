"""Pure-python reader for TensorFlow TensorBundle checkpoints
(``cp-XXXX.ckpt.index`` + ``cp-XXXX.ckpt.data-00000-of-00001``), so
reference checkpoints produced by ``Model.save_weights`` (model.py:464-467)
load directly into this framework without TensorFlow installed.

Format (tensorflow/core/util/tensor_bundle):
* the .index file is a leveldb-style SSTable: blocks of prefix-compressed
  key/value entries, an index block mapping last-keys to block handles,
  and a 48-byte footer ending in the table magic;
* blocks may be stored raw or snappy-compressed (1 type byte + crc32c
  follow each block) — a minimal snappy decoder is included;
* the empty key maps to BundleHeaderProto (num_shards/endianness); every
  other key is a tensor name mapping to BundleEntryProto
  {dtype, shape, shard_id, offset, size} into the .data-* shard files.

Only plain (non-sliced) little-endian tensors are supported — which is
what Keras save_weights writes.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Dict, List, Tuple

import numpy as np

_TABLE_MAGIC = 0xDB4775248B80FB57

_DTYPES = {
    1: np.float32, 2: np.float64, 3: np.int32, 4: np.uint8, 5: np.int16,
    6: np.int8, 9: np.int64, 10: np.bool_, 17: np.uint16, 19: np.float16,
    22: np.uint32, 23: np.uint64,
}
DT_BFLOAT16 = 14


# ------------------------------------------------------------- varint/proto

def _uvarint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _proto_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos = 0
    while pos < len(buf):
        tag, pos = _uvarint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _uvarint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            n, pos = _uvarint(buf, pos)
            val = buf[pos:pos + n]
            pos += n
        elif wt == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_shape(buf: bytes) -> Tuple[int, ...]:
    dims: List[int] = []
    for field, _, val in _proto_fields(buf):
        if field == 2:  # TensorShapeProto.Dim
            for f2, _, v2 in _proto_fields(val):
                if f2 == 1:  # Dim.size
                    dims.append(v2)
    return tuple(dims)


def _parse_entry(buf: bytes) -> dict:
    """BundleEntryProto: dtype=1, shape=2, shard_id=3, offset=4, size=5."""
    e = {"dtype": 0, "shape": (), "shard_id": 0, "offset": 0, "size": 0,
         "slices": False}
    for field, _, val in _proto_fields(buf):
        if field == 1:
            e["dtype"] = val
        elif field == 2:
            e["shape"] = _parse_shape(val)
        elif field == 3:
            e["shard_id"] = val
        elif field == 4:
            e["offset"] = val
        elif field == 5:
            e["size"] = val
        elif field == 7:
            e["slices"] = True
    return e


# ------------------------------------------------------------------ snappy

def _snappy_decompress(src: bytes) -> bytes:
    out_len, pos = _uvarint(src, 0)
    out = bytearray()
    while pos < len(src):
        tag = src[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:
                nbytes = n - 59
                n = int.from_bytes(src[pos:pos + nbytes], "little")
                pos += nbytes
            n += 1
            out += src[pos:pos + n]
            pos += n
        else:
            if kind == 1:
                length = ((tag >> 2) & 7) + 4
                offset = ((tag >> 5) << 8) | src[pos]
                pos += 1
            elif kind == 2:
                length = (tag >> 2) + 1
                offset = struct.unpack_from("<H", src, pos)[0]
                pos += 2
            else:
                length = (tag >> 2) + 1
                offset = struct.unpack_from("<I", src, pos)[0]
                pos += 4
            start = len(out) - offset
            for i in range(length):  # may self-overlap
                out.append(out[start + i])
    assert len(out) == out_len, (len(out), out_len)
    return bytes(out)


# ----------------------------------------------------------------- sstable

def _read_block(data: bytes, offset: int, size: int) -> bytes:
    block = data[offset:offset + size]
    ctype = data[offset + size]  # 1 type byte (+4-byte crc, unchecked)
    if ctype == 0:
        return block
    if ctype == 1:
        return _snappy_decompress(block)
    raise ValueError(f"unsupported block compression {ctype}")


def _block_entries(block: bytes) -> List[Tuple[bytes, bytes]]:
    n_restarts = struct.unpack_from("<I", block, len(block) - 4)[0]
    limit = len(block) - 4 - 4 * n_restarts
    entries = []
    key = b""
    pos = 0
    while pos < limit:
        shared, pos = _uvarint(block, pos)
        unshared, pos = _uvarint(block, pos)
        vlen, pos = _uvarint(block, pos)
        key = key[:shared] + block[pos:pos + unshared]
        pos += unshared
        entries.append((key, block[pos:pos + vlen]))
        pos += vlen
    return entries


def _read_sstable(path: str) -> Dict[bytes, bytes]:
    with open(path, "rb") as f:
        data = f.read()
    footer = data[-48:]
    magic = struct.unpack_from("<Q", footer, 40)[0]
    if magic != _TABLE_MAGIC:
        raise ValueError(f"{path}: not an SSTable (bad magic)")
    pos = 0
    _, pos = _uvarint(footer, pos)      # metaindex handle offset
    _, pos = _uvarint(footer, pos)      # metaindex handle size
    idx_off, pos = _uvarint(footer, pos)
    idx_size, pos = _uvarint(footer, pos)
    index = _read_block(data, idx_off, idx_size)
    table: Dict[bytes, bytes] = {}
    for _, handle in _block_entries(index):
        off, hpos = _uvarint(handle, 0)
        size, _ = _uvarint(handle, hpos)
        for k, v in _block_entries(_read_block(data, off, size)):
            table[k] = v
    return table


# -------------------------------------------------------------- public API

def read_index(prefix: str) -> Dict[str, dict]:
    """Parse `<prefix>.index` into {tensor_name: entry dict}."""
    table = _read_sstable(prefix + ".index")
    entries = {}
    for k, v in table.items():
        if k == b"":
            continue  # BundleHeaderProto
        entries[k.decode()] = _parse_entry(v)
    return entries


def _shard_path(prefix: str, shard_id: int) -> str:
    pats = glob.glob(f"{prefix}.data-{shard_id:05d}-of-*")
    if not pats:
        raise FileNotFoundError(f"{prefix}.data-{shard_id:05d}-of-*")
    return pats[0]


def read_bundle(prefix: str) -> Dict[str, np.ndarray]:
    """Load every tensor of a TensorBundle checkpoint as numpy arrays.
    `prefix` is the checkpoint path without extensions, e.g.
    checkpoint/city/gen/cp-0021.ckpt."""
    entries = read_index(prefix)
    shards: Dict[int, bytes] = {}
    out: Dict[str, np.ndarray] = {}
    for name, e in entries.items():
        if e["slices"]:
            raise NotImplementedError(f"{name}: sliced tensor")
        sid = e["shard_id"]
        if sid not in shards:
            with open(_shard_path(prefix, sid), "rb") as f:
                shards[sid] = f.read()
        raw = shards[sid][e["offset"]:e["offset"] + e["size"]]
        if e["dtype"] == DT_BFLOAT16:
            u16 = np.frombuffer(raw, "<u2")
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            dt = _DTYPES.get(e["dtype"])
            if dt is None:
                raise NotImplementedError(f"{name}: dtype {e['dtype']}")
            arr = np.frombuffer(raw, np.dtype(dt).newbyteorder("<"))
        out[name] = arr.reshape(e["shape"]).copy()
    return out


def keras_weights(prefix: str) -> List[np.ndarray]:
    """Flat weight list in Keras layer-creation order from a
    `Model.save_weights` bundle — ready for
    tf_weights.assign_flat_weights.

    save_weights names variables `layer_with_weights-<i>/<attr>/.ATTRIBUTES/
    VARIABLE_VALUE`; sorting by the integer layer index and the in-layer
    attr order (kernel, bias, gamma, beta, then others) reproduces
    get_weights() order."""
    entries = read_index(prefix)
    attr_rank = {"kernel": 0, "depthwise_kernel": 0, "bias": 1,
                 "gamma": 0, "beta": 1, "moving_mean": 2,
                 "moving_variance": 3}
    keyed = []
    for name in entries:
        if not name.startswith("layer_with_weights-"):
            continue
        parts = name.split("/")
        layer_idx = int(parts[0].split("-")[1])
        attr = parts[1]
        keyed.append((layer_idx, attr_rank.get(attr, 9), attr, name))
    keyed.sort()
    tensors = read_bundle(prefix)
    return [tensors[name] for _, _, _, name in keyed]
