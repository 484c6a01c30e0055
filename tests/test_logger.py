"""TensorBoard event-file writer round-trip.

The hand-rolled TFRecord/Event encoder in ``utils/tfevents.py`` is verified
against TensorBoard's own reader (``EventFileLoader`` parses real protos and
checks the TFRecord CRCs): every scalar written must come back with the same
tag/step/value. Replaces the reference's TF1 writer surface
(`/root/reference/utils/logger.py:12-72`).
"""

import glob
import json
import os

import pytest

from frustum_convnet_tpu.utils.logger import ScalarWriter
from frustum_convnet_tpu.utils.tfevents import TFEventWriter, crc32c


def test_crc32c_known_vectors():
    # Published CRC-32C test vectors (RFC 3720 appendix B.4 style)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _load_scalars(log_dir):
    tb = pytest.importorskip("tensorboard")  # noqa: F841 (reader is optional)
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)

    files = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    assert len(files) == 1, files
    out = []
    for ev in EventFileLoader(files[0]).Load():
        if ev.HasField("summary"):
            for v in ev.summary.value:
                # the loader's data_compat pass migrates simple_value
                # scalars into rank-0 tensor protos
                if v.HasField("tensor"):
                    out.append((v.tag, ev.step, v.tensor.float_val[0]))
                else:
                    out.append((v.tag, ev.step, v.simple_value))
        elif ev.HasField("file_version"):
            assert ev.file_version == "brain.Event:2"
    return out


def test_tfevent_writer_roundtrip(tmp_path):
    d = str(tmp_path / "events")
    w = TFEventWriter(d)
    written = [("loss/total", 0, 3.25), ("loss/total", 1, 1.5),
               ("lr", 1, 1e-3), ("IoU_0.7", 2, 0.625)]
    for tag, step, val in written:
        w.scalar(tag, val, step)
    w.close()

    got = _load_scalars(d)
    assert len(got) == len(written)
    for (tag, step, val), (gtag, gstep, gval) in zip(written, got):
        assert gtag == tag and gstep == step
        assert gval == pytest.approx(val, rel=1e-6)


def test_jsonl_to_tb_converter(tmp_path):
    """Historical JSONL-only runs convert to loadable event files."""
    import subprocess
    import sys

    out = str(tmp_path)
    d = os.path.join(out, "tb_logger")
    os.makedirs(d)
    with open(os.path.join(d, "val.jsonl"), "w") as f:
        f.write(json.dumps({"step": 3, "key": "IoU_0.7", "value": 0.5,
                            "ts": 123.0}) + "\n")
        f.write(json.dumps({"step": 4, "key": "IoU_0.7", "value": 0.75}) + "\n")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(root, "tools", "jsonl_to_tb.py"),
                        out], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    got = _load_scalars(os.path.join(d, "val"))
    assert ("IoU_0.7", 3, 0.5) in got
    assert ("IoU_0.7", 4, 0.75) in got


def test_scalar_writer_dual_sink(tmp_path):
    out = str(tmp_path)
    w = ScalarWriter(out, "train")
    w.scalars({"total_loss": 2.0, "cls_loss": 0.5}, step=7)
    w.close()

    # JSONL sink
    lines = [json.loads(l) for l in open(
        os.path.join(out, "tb_logger", "train.jsonl"))]
    assert {(l["key"], l["step"]) for l in lines} == {
        ("total_loss", 7), ("cls_loss", 7)}

    # TensorBoard sink, reference tb_logger/train layout
    got = _load_scalars(os.path.join(out, "tb_logger", "train"))
    assert ("total_loss", 7, 2.0) in got
    assert ("cls_loss", 7, 0.5) in got


def test_tfevent_image_and_histogram_roundtrip(tmp_path):
    """Image + histogram events (ref `utils/logger.py:24-72`) parse back
    through TensorBoard's own loader: PNG bytes decode to the original
    pixels, histogram statistics and buckets match numpy's."""
    import numpy as np

    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader)
    from tensorboard.compat.proto import event_pb2

    d = str(tmp_path / "events_ih")
    w = TFEventWriter(d)
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    img_f = rng.normal(size=(4, 6))  # float -> min-max scaled to uint8
    vals = rng.normal(size=1000)
    w.image("viz/frustum", img_u8, step=3)
    w.image("viz/gray", img_f, step=3)
    w.histogram("params/w", vals, step=4, bins=30)
    w.close()

    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(files) == 1
    # raw proto parse (EventFileLoader's data_compat pass would migrate
    # image/histo values into TensorProtos; here we pin the wire format)
    images, histos = {}, {}
    for rec in RawEventFileLoader(files[0]).Load():
        ev = event_pb2.Event.FromString(rec)
        if not ev.HasField("summary"):
            continue
        for v in ev.summary.value:
            if v.HasField("image"):
                images[v.tag] = (ev.step, v.image)
            elif v.HasField("histo"):
                histos[v.tag] = (ev.step, v.histo)

    step, im = images["viz/frustum"]
    assert step == 3
    assert im.height == 7 and im.width == 5 and im.colorspace == 3
    png = im.encoded_image_string
    assert png.startswith(b"\x89PNG")
    assert "viz/gray" in images  # float input path encoded too
    # decode the PNG with matplotlib (PIL-free) and compare pixels
    import io

    import matplotlib.image as mpimg
    decoded = (mpimg.imread(io.BytesIO(png)) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(decoded, img_u8)

    step, h = histos["params/w"]
    assert step == 4
    counts, edges = np.histogram(vals, bins=30)
    assert h.num == vals.size and abs(h.sum - vals.sum()) < 1e-9
    assert abs(h.min - vals.min()) < 1e-12 and abs(h.max - vals.max()) < 1e-12
    np.testing.assert_allclose(list(h.bucket), counts)
    np.testing.assert_allclose(list(h.bucket_limit), edges[1:])
