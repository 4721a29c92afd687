"""Interop with the reference's .tfrecords artifacts
(video_features_tf/tfrecords/generate_tfrecords.py:26-55): dependency-free
framing + Example-proto parse, golden-tested on handcrafted bytes, wired
through RecordDataset / input_mode='tfrecords' into training."""

import io
import os
import struct

import numpy as np
import pytest

from ivf_tpu.data.tfrecords import (
    TFRecordReader,
    build_example,
    crc32c,
    iter_tfrecord_offsets,
    masked_crc32c,
    parse_example,
    write_tfrecord,
)


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_crc32c_known_vectors():
    # published Castagnoli test vectors (RFC 3720 appendix / iscsi)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masked_crc_roundtrip_framing(tmp_path):
    path = str(tmp_path / "t.tfrecords")
    payloads = [b"hello", b"", b"x" * 1000]
    write_tfrecord(path, payloads)
    got = list(iter_tfrecord_offsets(path, verify_crc=True))
    assert [p for _, p in got] == payloads
    # corrupt a payload byte -> crc failure
    data = bytearray(open(path, "rb").read())
    data[12] ^= 0xFF  # first byte of first payload
    bad = str(tmp_path / "bad.tfrecords")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="bad data crc"):
        list(iter_tfrecord_offsets(bad, verify_crc=True))
    # a non-TFRecord file fails the (always-on) length crc
    junk = str(tmp_path / "junk.tfrecords")
    open(junk, "wb").write(b"not a tfrecord file at all....")
    with pytest.raises(ValueError, match="bad length crc"):
        list(iter_tfrecord_offsets(junk))


def test_parse_example_handcrafted_golden():
    """Golden parse of a byte-level handcrafted Example with the reference's
    6 fields — layout per the proto wire format, written out by hand (NOT
    via build_example) so reader and writer are tested independently."""

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                return out

    def ld(field, payload):  # length-delimited
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def int64_feature(v):
        return ld(3, varint(1 << 3) + varint(v))

    def bytes_feature(vals):
        return ld(1, b"".join(ld(1, v) for v in vals))

    feats = b""
    for k, fv in (
        (b"nb_frames", int64_feature(2)),
        (b"height", int64_feature(4)),
        (b"width", int64_feature(6)),
        (b"label", int64_feature(3)),
        (b"video_id", bytes_feature([b"vid42"])),
        (b"frames", bytes_feature([b"JPEG1", b"JPEG22"])),
    ):
        feats += ld(1, ld(1, k) + ld(2, fv))
    example = ld(1, feats)

    parsed = parse_example(example)
    assert parsed["nb_frames"] == [2]
    assert parsed["height"] == [4]
    assert parsed["width"] == [6]
    assert parsed["label"] == [3]
    assert parsed["video_id"] == [b"vid42"]
    assert parsed["frames"] == [b"JPEG1", b"JPEG22"]
    # our writer emits byte-identical protos for the same content
    assert (
        build_example("vid42", 3, [b"JPEG1", b"JPEG22"], height=4, width=6)
        == example
    )


def test_parse_example_packed_int64():
    """TF may emit packed repeated int64s — both encodings must parse."""

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                return out

    def ld(field, payload):
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    packed = ld(3, ld(1, varint(7) + varint(300)))  # Int64List packed
    entry = ld(1, ld(1, b"label") + ld(2, packed))
    parsed = parse_example(ld(1, entry))
    assert parsed["label"] == [7, 300]


def test_tfrecord_reader_end_to_end(tmp_path):
    """Write reference-schema records (JPEG frames), read back via
    TFRecordReader: meta + decoded frames match."""
    # smooth gradients: JPEG is near-lossless on them, unlike noise
    yy, xx = np.mgrid[0:16, 0:20]
    frames = [
        np.stack(
            [(yy * 8 + k * 30) % 256, (xx * 8) % 256, np.full_like(yy, k * 40)],
            axis=-1,
        ).astype(np.uint8)
        for k in range(3)
    ]
    jpegs = [_jpeg_bytes(f) for f in frames]
    ex = build_example("clip_a", 5, jpegs, height=16, width=20)
    ex2 = build_example("clip_b", 1, jpegs[:2], height=16, width=20)
    path = str(tmp_path / "shard.tfrecords")
    write_tfrecord(path, [ex, ex2])

    r = TFRecordReader(path, verify_crc=True)
    assert len(r) == 2
    meta = r.read_meta(0)
    assert meta["video_id"] == "clip_a"
    assert meta["label"] == 5
    assert meta["nb_frames"] == 3
    assert (meta["height"], meta["width"]) == (16, 20)
    m, decoded = r.read(0)
    assert decoded.shape == (3, 16, 20, 3)
    # JPEG is lossy; decoded content should still be close
    assert np.mean(np.abs(decoded.astype(int) - np.stack(frames).astype(int))) < 8
    m2, payloads = r.read(1, decode=False)
    assert m2["video_id"] == "clip_b" and payloads == jpegs[:2]
    r.close()


def test_record_dataset_reads_tfrecords(tmp_path):
    """RecordDataset dispatches on extension: reference .tfrecords shards
    load through the exact same dataset/loader stack as .ivfrecords."""
    from ivf_tpu.data.loaders import RecordDataset

    rng = np.random.RandomState(1)
    jpegs = [
        _jpeg_bytes((rng.rand(8, 8, 3) * 255).astype(np.uint8))
        for _ in range(4)
    ]
    path = str(tmp_path / "ds.tfrecords")
    write_tfrecord(
        path,
        [
            build_example(f"v{i}", i % 2, jpegs, height=8, width=8)
            for i in range(3)
        ],
    )
    ds = RecordDataset([path], clip_size=6, get_item_id=True)
    assert len(ds) == 3
    clip, label, vid = ds[1]
    assert clip.shape == (6, 8, 8, 3) and clip.dtype == np.uint8
    assert label == 1 and vid == "v1"
    # payload path (native batch decode uses it)
    payloads, label0, vid0 = ds.get_payloads(0)
    assert len(payloads) == 6 and vid0 == "v0"  # padded by repeat-last
    assert payloads[3] == payloads[5] == jpegs[3]


@pytest.mark.slow
def test_input_mode_tfrecords_trains(tmp_path):
    """input_mode='tfrecords' smoke-trains through the public api
    (VERDICT r2 #5 done-condition)."""
    from ivf_tpu.api import train
    from ivf_tpu.config import Config

    rng = np.random.RandomState(2)
    examples = []
    for i in range(8):
        c = i % 2
        jpegs = [
            _jpeg_bytes(
                np.clip(rng.rand(16, 16, 3) * 100 + c * 120, 0, 255).astype(
                    np.uint8
                )
            )
            for _ in range(4)
        ]
        examples.append(build_example(f"v{i}", c, jpegs, height=16, width=16))
    path = str(tmp_path / "train.tfrecords")
    write_tfrecord(path, examples)

    cfg = Config.from_dict(
        {
            "model_name": "tfrec_smoke",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 4,
            "input_spatial_size": 16,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "optimizer": "ADAM",
            "lr": 0.01,
            "num_epochs": 1,
            "num_workers": 1,
        }
    )
    cfg.model.effective_steps = (1, 3)
    cfg.data.input_mode = "tfrecords"
    cfg.data.record_paths = (path,)
    cfg.test_run = True
    state, history = train(cfg)
    assert len(history) == 1
    assert np.isfinite(history[0]["train"]["loss"])
