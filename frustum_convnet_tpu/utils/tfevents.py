"""Dependency-free TensorBoard event-file writer.

Replaces the reference's TF1 ``tf.summary.FileWriter`` wrapper
(`/root/reference/utils/logger.py:12-72`) without importing TensorFlow:
scalar ``Event`` protos are hand-encoded (the wire format of
``tensorflow/core/util/event.proto`` — three fields and a nested
``Summary.Value`` is all scalars need) and framed as TFRecords
(length + masked-crc32c framing). Output is readable by stock
TensorBoard; ``tests/test_logger.py`` round-trips files through
``tensorboard``'s own ``EventFileLoader``.
"""

from __future__ import annotations

import os
import socket
import struct
import time


def _crc32c_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_bytes(num: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def encode_scalar_event(tag: str, value: float, step: int,
                        wall_time: float) -> bytes:
    # Summary.Value { tag = 1 (string); simple_value = 2 (float) }
    val = (_field_bytes(1, tag.encode("utf-8"))
           + _varint((2 << 3) | 5) + struct.pack("<f", value))
    summary = _field_bytes(1, val)  # Summary.value = 1 (repeated message)
    # Event { wall_time = 1 (double); step = 2 (int64); summary = 5 }
    return (_varint((1 << 3) | 1) + struct.pack("<d", wall_time)
            + _varint(2 << 3) + _varint(step)
            + _field_bytes(5, summary))


def encode_file_version_event(wall_time: float) -> bytes:
    # Event { wall_time = 1; file_version = 3 (string) }
    return (_varint((1 << 3) | 1) + struct.pack("<d", wall_time)
            + _field_bytes(3, b"brain.Event:2"))


def tfrecord_frame(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


class TFEventWriter:
    """Writes ``events.out.tfevents.*`` files TensorBoard can load."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        now = time.time()
        host = socket.gethostname()
        self.path = os.path.join(
            log_dir, f"events.out.tfevents.{now:.6f}.{host}")
        self._f = open(self.path, "ab")
        self._f.write(tfrecord_frame(encode_file_version_event(now)))

    def scalar(self, tag: str, value: float, step: int,
               wall_time: float | None = None):
        wt = time.time() if wall_time is None else wall_time
        self._f.write(tfrecord_frame(
            encode_scalar_event(tag, float(value), int(step), wt)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()
