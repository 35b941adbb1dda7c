"""TensorBoard event-file writer: validate the wire format by re-parsing it."""

import struct

import numpy as np

from phiseg_tpu.utils.tb_writer import SummaryWriter, _crc32c, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header CRC mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data CRC mismatch"
            records.append(data)
    return records


def _parse_proto_fields(data):
    """Minimal proto wire parser -> {field_num: [values]}."""
    fields = {}
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wt == 1:  # 64-bit
            val = struct.unpack("<d", data[i:i + 8])[0]
            i += 8
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = data[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = struct.unpack("<f", data[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        fields.setdefault(num, []).append(val)
    return fields


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar("loss/total", 3.25, step=17)
    w.scalar("lr", 1e-3, step=17)
    w.flush()

    records = _read_records(w.path)
    assert len(records) == 3  # file_version + 2 scalars
    head = _parse_proto_fields(records[0])
    assert head[3][0] == b"brain.Event:2"

    ev = _parse_proto_fields(records[1])
    assert ev[2][0] == 17  # step
    summary = _parse_proto_fields(ev[5][0])
    value = _parse_proto_fields(summary[1][0])
    assert value[1][0] == b"loss/total"
    np.testing.assert_allclose(value[2][0], 3.25)


def test_image_summary(tmp_path):
    w = SummaryWriter(str(tmp_path))
    img = (np.random.RandomState(0).rand(8, 8) * 255).astype(np.uint8)
    w.image("seg", img, step=1)
    w.flush()
    records = _read_records(w.path)
    ev = _parse_proto_fields(records[1])
    summary = _parse_proto_fields(ev[5][0])
    value = _parse_proto_fields(summary[1][0])
    image_msg = _parse_proto_fields(value[4][0])
    assert image_msg[1][0] == 8 and image_msg[2][0] == 8
    assert image_msg[4][0][:8] == b"\x89PNG\r\n\x1a\n"  # PNG magic


def test_histogram_roundtrip(tmp_path):
    """HistogramProto wire format: min/max/num/sum/sum_squares + packed
    bucket_limit/bucket fields parse back exactly."""
    w = SummaryWriter(str(tmp_path))
    vals = np.arange(100, dtype=np.float64)
    w.histogram("weights/conv1", vals, step=5, bins=10)
    w.flush()

    records = _read_records(w.path)
    ev = _parse_proto_fields(records[1])
    assert ev[2][0] == 5
    summary = _parse_proto_fields(ev[5][0])
    value = _parse_proto_fields(summary[1][0])
    assert value[1][0] == b"weights/conv1"
    histo = _parse_proto_fields(value[5][0])
    np.testing.assert_allclose(histo[1][0], 0.0)     # min
    np.testing.assert_allclose(histo[2][0], 99.0)    # max
    np.testing.assert_allclose(histo[3][0], 100.0)   # num
    np.testing.assert_allclose(histo[4][0], vals.sum())
    np.testing.assert_allclose(histo[5][0], np.square(vals).sum())
    limits = np.frombuffer(histo[6][0], "<f8")
    counts = np.frombuffer(histo[7][0], "<f8")
    assert limits.shape == (10,) and counts.shape == (10,)
    assert counts.sum() == 100


def test_histogram_summary_from_device_stats(tmp_path):
    """Precomputed device-side stats (phiseg_tpu.utils.diagnostics) write a
    parseable histogram record."""
    import jax.numpy as jnp

    from phiseg_tpu.utils.diagnostics import tensor_histogram

    stats = {k: np.asarray(v) for k, v in
             tensor_histogram(jnp.linspace(-1.0, 1.0, 64)).items()}
    w = SummaryWriter(str(tmp_path))
    w.histogram_summary("activations/relu", stats, step=2)
    w.flush()
    records = _read_records(w.path)
    value = _parse_proto_fields(_parse_proto_fields(
        _parse_proto_fields(records[1])[5][0])[1][0])
    histo = _parse_proto_fields(value[5][0])
    np.testing.assert_allclose(histo[1][0], -1.0, atol=1e-6)
    np.testing.assert_allclose(histo[2][0], 1.0, atol=1e-6)
    counts = np.frombuffer(histo[7][0], "<f8")
    assert counts.sum() == 64


def test_histogram_skips_empty_and_nonfinite(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.histogram("empty", np.array([]), step=0)
    w.histogram("nans", np.array([np.nan, np.inf]), step=0)
    w.flush()
    assert len(_read_records(w.path)) == 1  # only the file_version record


def test_scalars_skips_non_numeric(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalars({"a": 1.0, "b": "not-a-number"}, step=0)
    w.flush()
    assert len(_read_records(w.path)) == 2  # version + one scalar
