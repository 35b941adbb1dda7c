"""Minimal dependency-free TensorBoard event writer.

The reference logs scalars/images via tf.summary (phiseg/phiseg_model.py:
704-818). This framework has no TensorFlow, so this module hand-encodes the
TensorBoard event-file wire format (TFRecord framing with masked CRC32C +
Event/Summary protobufs) for scalar and image summaries. Output is readable
by stock TensorBoard (`tensorboard --logdir ...`).

Wire format notes:
  record  = uint64 len | uint32 maskedcrc32c(len) | bytes | uint32 maskedcrc32c(bytes)
  Event   = 1: wall_time (double), 2: step (int64), 3: file_version (string),
            5: summary (Summary)
  Summary = 1: repeated Value; Value = 1: tag (string), 2: simple_value
            (float), 4: image (Image); Image = 1: height, 2: width,
            3: colorspace, 4: encoded PNG bytes
"""

from __future__ import annotations

import os
import struct
import time
from typing import Optional

import numpy as np

# -- CRC32C (Castagnoli), table-driven ----------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf encoding helpers -------------------------------------------------


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


def _field_varint(num: int, val: int) -> bytes:
    return _varint(num << 3) + _varint(val)


def _field_bytes(num: int, val: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(val)) + val


def _field_double(num: int, val: float) -> bytes:
    return _varint((num << 3) | 1) + struct.pack("<d", val)


def _field_float(num: int, val: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", val)


def _event(step: Optional[int] = None, summary: Optional[bytes] = None,
           file_version: Optional[str] = None) -> bytes:
    msg = _field_double(1, time.time())
    if step is not None:
        msg += _field_varint(2, step)
    if file_version is not None:
        msg += _field_bytes(3, file_version.encode())
    if summary is not None:
        msg += _field_bytes(5, summary)
    return msg


def _encode_png(img: np.ndarray) -> bytes:
    """uint8 HxW or HxWx{1,3,4} -> PNG bytes (PIL, in the base image)."""
    import io

    from PIL import Image

    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="png")
    return buf.getvalue()


class SummaryWriter:
    """Append-only event-file writer; one per log dir."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.phiseg_tpu"
        self.path = os.path.join(log_dir, fname)
        self._f = open(self.path, "ab")
        self._write_record(_event(file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def scalar(self, tag: str, value: float, step: int) -> None:
        val = _field_bytes(1, tag.encode()) + _field_float(2, float(value))
        self._write_record(_event(step=int(step), summary=_field_bytes(1, val)))

    def scalars(self, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            try:
                self.scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def histogram(self, tag: str, values: np.ndarray, step: int,
                  bins: int = 30) -> None:
        """Histogram summary from raw values (ref tfwrapper/layers.py:671-677
        attaches tf.summary.histogram to every layer's weights/activations)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        counts, edges = np.histogram(v, bins=bins)
        self.histogram_summary(
            tag,
            {
                "min": float(v.min()),
                "max": float(v.max()),
                "num": float(v.size),
                "sum": float(v.sum()),
                "sum_squares": float(np.square(v).sum()),
                "bucket_limits": edges[1:],
                "bucket_counts": counts,
            },
            step,
        )

    def histogram_summary(self, tag: str, stats: dict, step: int) -> None:
        """Histogram summary from precomputed stats (device-side reduction).

        stats keys: min, max, num, sum, sum_squares (floats),
        bucket_limits (right edges), bucket_counts (same length).

        HistogramProto: 1 min, 2 max, 3 num, 4 sum, 5 sum_squares,
        6 repeated double bucket_limit (packed), 7 repeated double bucket
        (packed). Summary.Value carries it in field 5.
        """
        limits = np.asarray(stats["bucket_limits"], dtype=np.float64)
        counts = np.asarray(stats["bucket_counts"], dtype=np.float64)
        histo = (
            _field_double(1, float(stats["min"]))
            + _field_double(2, float(stats["max"]))
            + _field_double(3, float(stats["num"]))
            + _field_double(4, float(stats["sum"]))
            + _field_double(5, float(stats["sum_squares"]))
            + _field_bytes(6, limits.astype("<f8").tobytes())
            + _field_bytes(7, counts.astype("<f8").tobytes())
        )
        val = _field_bytes(1, tag.encode()) + _field_bytes(5, histo)
        self._write_record(_event(step=int(step), summary=_field_bytes(1, val)))

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: HxW or HxWxC uint8 (or float in [0,1], auto-converted)."""
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        png = _encode_png(img)
        h, w = img.shape[0], img.shape[1]
        c = 1 if img.ndim == 2 else img.shape[2]
        image_msg = (
            _field_varint(1, h) + _field_varint(2, w) + _field_varint(3, c)
            + _field_bytes(4, png)
        )
        val = _field_bytes(1, tag.encode()) + _field_bytes(4, image_msg)
        self._write_record(_event(step=int(step), summary=_field_bytes(1, val)))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
