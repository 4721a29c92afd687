"""Data pipeline tests: catalogs, samplers, records round-trip, loaders."""

import json
import os

import numpy as np
import pytest

from ivf_tpu.data import (
    ClipLoader,
    FrameDirDataset,
    KTHDirCatalog,
    KTHFrameDataset,
    RecordReader,
    RecordWriter,
    SmthSmthCatalog,
    sample_all,
    sample_cohesive_crop,
    sample_fixed_count,
)
from ivf_tpu.data.loaders import RecordDataset


def _write_jpg(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path, "JPEG", quality=95)


def _make_frame_tree(root, n_classes=2, clips_per_class=2, t=4, hw=16):
    rng = np.random.RandomState(0)
    for c in range(n_classes):
        for k in range(clips_per_class):
            d = os.path.join(str(root), str(c), f"clip{c}_{k}")
            os.makedirs(d)
            for i in range(t):
                _write_jpg(
                    os.path.join(d, f"frame{i+1:02d}.jpg"),
                    rng.randint(0, 255, (hw, hw, 3)),
                )


def test_smth_catalog(tmp_path):
    # labels.json holds *cleaned* labels (no brackets); the per-item
    # templates carry brackets that clean_template strips
    labels = ["Holding something", "Opening something"]
    (tmp_path / "labels.json").write_text(json.dumps(labels))
    items = [
        {"id": "42", "template": "Holding [something]"},
        {"id": "43", "template": "Opening [something]"},
    ]
    (tmp_path / "train.json").write_text(json.dumps(items))
    cat = SmthSmthCatalog(
        str(tmp_path / "train.json"),
        str(tmp_path / "labels.json"),
        "/data",
        ".webm",
    )
    assert len(cat) == 2
    assert cat.items[0].label == "Holding something"
    assert cat.label_index(cat.items[0]) in (0, 1)
    assert cat.classes_dict[cat.label_index(cat.items[0])] == cat.items[0].label
    assert cat.items[1].path == "/data/43.webm"


def test_samplers():
    assert sample_all(1, 4) == [1, 2, 3, 4]
    # short clip: pad with last frame
    s = sample_fixed_count(1, 4, 6)
    assert len(s) == 6 and s[-1] == s[-2] == s[-3]
    # long clip: uniform sampling, reference index math
    s = sample_fixed_count(1, 20, 5)
    assert len(s) == 5 and s[0] == 1 and all(1 <= f <= 20 for f in s)
    c = sample_cohesive_crop(1, 20, 5, np.random.RandomState(3))
    assert len(c) == 5 and c == list(range(c[0], c[0] + 5))


def test_records_roundtrip(tmp_path):
    # smooth gradients: JPEG-friendly content for the fidelity check
    yy, xx = np.mgrid[0:12, 0:10]
    base = ((yy * 10 + xx * 5) % 256).astype(np.uint8)
    clips = [
        np.stack([np.stack([base + 3 * t + k] * 3, axis=-1) for t in range(4)])
        for k in range(3)
    ]
    path = str(tmp_path / "shard0.ivfrecords")
    with RecordWriter(path) as w:
        for i, c in enumerate(clips):
            w.write(c, label=i, video_id=f"vid{i}", extra={"subject": 7})
    r = RecordReader(path)
    assert len(r) == 3
    meta, frames = r.read(1)
    assert meta["label"] == 1 and meta["video_id"] == "vid1"
    assert meta["subject"] == 7
    assert frames.shape == (4, 12, 10, 3)
    # JPEG lossy round-trip: close but not exact
    assert np.mean(np.abs(frames.astype(int) - clips[1].astype(int))) < 20
    meta0 = r.read_meta(0)
    assert meta0["nb_frames"] == 4
    ds = RecordDataset(path, clip_size=6, get_item_id=True)
    clip, label, vid = ds[2]
    assert clip.shape == (6, 12, 10, 3) and vid == "vid2"  # padded
    r.close()


def test_frame_dir_dataset_and_loader(tmp_path):
    _make_frame_tree(tmp_path)
    ds = FrameDirDataset(str(tmp_path), clip_size=4, get_item_id=True)
    assert len(ds) == 4
    clip, label, cid = ds[0]
    assert clip.shape == (4, 16, 16, 3) and clip.dtype == np.uint8
    assert label in (0, 1) and cid.startswith("clip")

    loader = ClipLoader(ds, batch_size=2, shuffle=True, num_workers=2, to_device=False)
    batches = list(loader)
    assert len(batches) == 2
    clips, labels, ids = batches[0]
    assert clips.shape == (2, 4, 16, 16, 3)
    assert labels.dtype == np.int32 and len(ids) == 2
    # second epoch reshuffles deterministically by epoch counter: same
    # multiset of ids, different order (deterministic for this seed/epoch)
    batches2 = list(loader)
    assert len(batches2) == 2
    ids1 = [i for b in batches for i in b[2]]
    ids2 = [i for b in batches2 for i in b[2]]
    assert sorted(ids1) == sorted(ids2)
    assert ids1 != ids2, "epoch 2 saw the identical batch order"


def test_kth_dataset(tmp_path):
    rng = np.random.RandomState(0)
    for idx in range(3):
        d = tmp_path / str(idx)
        d.mkdir()
        for i in range(4):
            _write_jpg(str(d / f"frame{i+1:02d}.jpg"), rng.randint(0, 255, (12, 10, 3)))
        (d / "class.txt").write_text(f"{idx % 2}\n")
        (d / "label.txt").write_text(f"person{idx:02d}_boxing_d1_1\n")
    # stray non-clip dirs (no class.txt) must be ignored by BOTH the dataset
    # and the catalog (code-review regression: the catalog crashed on them)
    (tmp_path / "plots").mkdir()
    (tmp_path / ".ipynb_checkpoints").mkdir()
    ds = KTHFrameDataset(str(tmp_path), clip_size=4, get_item_id=True)
    assert len(ds) == 3
    clip, label, tag = ds[1]
    assert clip.shape == (4, 12, 10, 3)
    assert label == 1 and tag == "person01_boxing_d1_1"
    cat = KTHDirCatalog(str(tmp_path))
    assert len(cat) == 3 and cat.items[2].id == "person02_boxing_d1_1"


def test_record_writer_no_partial_shard_on_error(tmp_path):
    """A build that dies mid-dataset must not leave a complete-looking
    shard behind (code-review regression: __exit__ wrote the footer
    unconditionally, so truncated shards loaded as full datasets)."""
    path = str(tmp_path / "partial.ivfrecords")
    frame = np.zeros((4, 8, 8, 3), np.uint8)
    with pytest.raises(RuntimeError):
        with RecordWriter(path) as w:
            w.write(frame, label=0, video_id="a")
            raise RuntimeError("corrupt input mid-build")
    assert not os.path.exists(path)
    # the success path still round-trips
    with RecordWriter(path) as w:
        w.write(frame, label=0, video_id="a")
    r = RecordReader(path)
    assert len(r) == 1
    r.close()


def test_loader_device_placement_8dev(tmp_path):
    import jax

    _make_frame_tree(tmp_path, n_classes=2, clips_per_class=4)
    from ivf_tpu.parallel import get_mesh

    mesh = get_mesh(8)
    ds = FrameDirDataset(str(tmp_path), clip_size=4)
    loader = ClipLoader(ds, batch_size=8, shuffle=False, mesh=mesh)
    clips, labels = next(iter(loader))
    assert isinstance(clips, jax.Array)
    assert len(clips.sharding.device_set) == 8


def test_native_decode_matches_pil(tmp_path):
    from ivf_tpu import native

    if not native.available():
        pytest.skip("native decoder unavailable")
    _make_frame_tree(tmp_path, n_classes=2, clips_per_class=2)
    ds = FrameDirDataset(str(tmp_path), clip_size=4, get_item_id=True)
    native_loader = ClipLoader(ds, batch_size=4, shuffle=False, to_device=False)
    pil_loader = ClipLoader(
        ds, batch_size=4, shuffle=False, to_device=False, use_native=False
    )
    nb = next(iter(native_loader))
    pb = next(iter(pil_loader))
    np.testing.assert_array_equal(nb[0], pb[0])
    np.testing.assert_array_equal(nb[1], pb[1])
    assert nb[2] == pb[2]
    assert nb[0].dtype == np.uint8  # uint8 transfer: 4x fewer host->HBM bytes


def test_native_decode_records_path(tmp_path):
    from ivf_tpu import native

    if not native.available():
        pytest.skip("native decoder unavailable")
    yy, xx = np.mgrid[0:12, 0:10]
    base = ((yy * 10 + xx * 5) % 256).astype(np.uint8)
    path = str(tmp_path / "s.ivfrecords")
    with RecordWriter(path) as w:
        for k in range(3):
            clip = np.stack([np.stack([base + 3 * t + k] * 3, axis=-1) for t in range(2)])
            w.write(clip, label=k, video_id=f"v{k}")
    ds = RecordDataset(path, clip_size=4)  # forces payload padding
    loader = ClipLoader(ds, batch_size=3, shuffle=False, to_device=False)
    clips, labels = next(iter(loader))
    assert clips.shape == (3, 4, 12, 10, 3)
    np.testing.assert_array_equal(clips[:, 2], clips[:, 3])  # padded frames


def test_record_reader_thread_safety(tmp_path):
    import threading

    yy, xx = np.mgrid[0:12, 0:10]
    base = ((yy * 10 + xx * 5) % 256).astype(np.uint8)
    path = str(tmp_path / "c.ivfrecords")
    with RecordWriter(path) as w:
        for k in range(20):
            clip = np.stack([np.stack([base + t + k] * 3, axis=-1) for t in range(3)])
            w.write(clip, label=k, video_id=f"v{k}")
    r = RecordReader(path)
    errors = []

    def worker(seed):
        rng = np.random.RandomState(seed)
        for _ in range(50):
            i = int(rng.randint(0, 20))
            try:
                meta, frames = r.read(i)
                assert meta["label"] == i and frames.shape == (3, 12, 10, 3)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errors, errors[:3]


def test_clip_loader_early_exit_no_leak(tmp_path):
    import threading

    _make_frame_tree(tmp_path, n_classes=2, clips_per_class=8)
    ds = FrameDirDataset(str(tmp_path), clip_size=4)
    loader = ClipLoader(ds, batch_size=2, prefetch=1, num_workers=2, to_device=False)
    before = threading.active_count()
    for _ in range(5):
        it = iter(loader)
        next(it)  # consume one batch, then abandon the iterator
        it.close()
    # producers must have been cancelled, not stranded on q.put
    assert threading.active_count() <= before + 1
