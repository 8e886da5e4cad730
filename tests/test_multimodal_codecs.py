"""Real-codec coverage for the multimodal decode hooks (VERDICT r4 ask
#6): importorskip-gated, so these run wherever pillow / soundfile /
pyav exist and skip cleanly in this codec-less sandbox. The absent-lib
contract (NotImplementedError, never ImportError) is tested EVERYWHERE
via sys.modules poisoning, so the stubbed path keeps coverage too.

No Spark needed — the hooks are plain functions; their Spark-side
plumbing (schema, Arrow batches, fan-out) is covered by the oracle
parity tests on the deterministic stand-ins.
"""

from __future__ import annotations

import io
import sys

import pytest

from sparkstreamingtohdfsofsensorsdata_spark.llm import multimodal


# --- absent-lib contract: runs in every environment ------------------

@pytest.mark.parametrize(
    ("hook", "module"),
    [
        (lambda: multimodal.decode_image(b"x"), "PIL"),
        (lambda: multimodal.decode_video_frame(b"x", 0), "av"),
        (lambda: multimodal.decode_audio(b"x"), "soundfile"),
    ],
    ids=["image", "video", "audio"],
)
def test_hook_raises_notimplemented_without_codec(monkeypatch, hook, module):
    # Poison the import so the absent-lib branch runs even on machines
    # that DO have the codec: callers must see NotImplementedError (the
    # documented contract), never a bare ImportError.
    monkeypatch.setitem(sys.modules, module, None)
    with pytest.raises(NotImplementedError):
        hook()


def test_decode_video_frame_rejects_negative_index():
    # Argument validation precedes the codec import, so this contract
    # holds in every environment (ADVICE r5): a negative index must not
    # fall through to the misleading 'past end of stream' error — nor
    # to NotImplementedError on codec-less machines.
    with pytest.raises(ValueError, match="frame_idx"):
        multimodal.decode_video_frame(b"x", -1)


# --- real decodes: skip unless the codec is installed -----------------

def test_decode_image_roundtrip():
    Image = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    Image.new("RGB", (5, 3), color=(200, 10, 30)).save(buf, format="PNG")
    img = multimodal.decode_image(buf.getvalue())
    assert img.size == (5, 3)
    assert img.getpixel((0, 0)) == (200, 10, 30)


def test_decode_image_corrupt_payload_raises_now():
    pytest.importorskip("PIL.Image")
    # .load() in the hook forces the decode eagerly so a corrupt
    # payload surfaces at the hook call, not deep inside a UDF batch.
    with pytest.raises(Exception):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png")


def test_decode_audio_roundtrip():
    sf = pytest.importorskip("soundfile")
    np = pytest.importorskip("numpy")
    sr = 16000
    tone = np.sin(np.linspace(0, 2 * np.pi * 440, sr // 4)).astype("float32")
    buf = io.BytesIO()
    sf.write(buf, tone, sr, format="WAV")
    samples, rate = multimodal.decode_audio(buf.getvalue())
    assert rate == sr
    assert len(samples) == len(tone)
    assert abs(float(samples[10]) - float(tone[10])) < 1e-3


def test_decode_video_frame_rejects_streamless_payload():
    av = pytest.importorskip("av")
    sf = pytest.importorskip("soundfile")
    np = pytest.importorskip("numpy")
    # An audio-only container demuxes fine but has no video stream; the
    # hook must say so instead of raising IndexError (ADVICE r5).
    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600, dtype="float32"), 16000, format="WAV")
    with pytest.raises(ValueError, match="no video stream"):
        multimodal.decode_video_frame(buf.getvalue(), 0)


def test_decode_video_frame_roundtrip():
    av = pytest.importorskip("av")
    np = pytest.importorskip("numpy")
    # Encode a 3-frame solid-color video in memory, then decode frame 1.
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("h264", rate=24)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for _ in range(3):
            frame = av.VideoFrame.from_ndarray(
                np.full((16, 16, 3), 128, dtype="uint8"), format="rgb24"
            )
            out.mux(stream.encode(frame))
        out.mux(stream.encode())
    arr = multimodal.decode_video_frame(buf.getvalue(), 1)
    assert arr.shape == (16, 16, 3)
    # lossy codec: solid gray should come back within a few code values
    assert abs(int(arr.mean()) - 128) <= 6
