"""TensorBoard event-writer wire-format tests.

The decoder here is written independently of utils/tb.py's encoder (raw
struct/varint parsing of the TFRecord + Event protobuf wire bytes) so a
framing or field-numbering bug cannot cancel itself out.
"""

import json
import os
import struct

import numpy as np

from threedhumangan_tpu.utils.tb import EventWriter, _crc32c, _masked_crc


# -- independent decoder ------------------------------------------------------

def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return out
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data crc mismatch"
            out.append(data)


def _varint_at(buf, i):
    shift, val = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf):
    """-> list of (field_number, wire_type, value_bytes_or_int)."""
    i, out = 0, []
    while i < len(buf):
        key, i = _varint_at(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _varint_at(buf, i)
        elif wire == 1:
            v, i = buf[i:i + 8], i + 8
        elif wire == 5:
            v, i = buf[i:i + 4], i + 4
        elif wire == 2:
            n, i = _varint_at(buf, i)
            v, i = buf[i:i + n], i + n
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, v))
    return out


def _decode_scalar_event(rec):
    ev = dict()
    for field, wire, v in _fields(rec):
        if field == 2 and wire == 0:
            ev["step"] = v
        if field == 5 and wire == 2:  # summary
            for f2, w2, v2 in _fields(v):
                assert f2 == 1 and w2 == 2  # Summary.value
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1:
                        ev["tag"] = v3.decode()
                    if f3 == 2:
                        ev["value"] = struct.unpack("<f", v3)[0]
                    if f3 == 5:
                        ev["histo"] = v3
    return ev


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli CRC
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_event_file_scalars_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/g_loss", 0.25, step=3)
    w.add_scalar("train/d_loss", -1.5, step=4)
    w.close()

    recs = _read_records(w.path)
    assert len(recs) == 3  # file_version + 2 scalars
    fields0 = dict((f, v) for f, _, v in _fields(recs[0]))
    assert fields0[3] == b"brain.Event:2"
    ev1 = _decode_scalar_event(recs[1])
    assert ev1 == {"step": 3, "tag": "train/g_loss",
                   "value": np.float32(0.25)}
    ev2 = _decode_scalar_event(recs[2])
    assert ev2["step"] == 4 and ev2["value"] == np.float32(-1.5)


def test_event_file_histogram(tmp_path):
    w = EventWriter(str(tmp_path))
    vals = np.asarray([-2.0, -1.0, 0.0, 0.5, 3.0])
    w.add_histogram("train/weights/w0", vals, step=7)
    w.close()

    recs = _read_records(w.path)
    ev = _decode_scalar_event(recs[1])
    assert ev["tag"] == "train/weights/w0" and ev["step"] == 7
    h = {f: v for f, _, v in _fields(ev["histo"]) if f in (1, 2, 3, 4)}
    assert struct.unpack("<d", h[1])[0] == -2.0  # min
    assert struct.unpack("<d", h[2])[0] == 3.0   # max
    assert struct.unpack("<d", h[3])[0] == 5.0   # num
    assert struct.unpack("<d", h[4])[0] == 0.5   # sum
    # bucket counts (packed field 7) must sum to num
    for f, _, v in _fields(ev["histo"]):
        if f == 7:
            counts = struct.unpack(f"<{len(v)//8}d", v)
            assert sum(counts) == 5.0


def test_export_tensorboard_cli(tmp_path):
    run = tmp_path / "run"
    os.makedirs(run)
    with open(run / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 10, "g_loss": 1.0, "note": "x"}) + "\n")
        f.write(json.dumps({"step": 20, "g_loss": 0.5}) + "\n")
    import importlib
    mod = importlib.import_module("apps.export_tensorboard")
    path = mod.export(str(run))
    evs = [_decode_scalar_event(r) for r in _read_records(path)[1:]]
    assert [(e["step"], e["value"]) for e in evs] == [(10, 1.0), (20, 0.5)]
