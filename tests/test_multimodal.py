"""Multimodal plumbing tests: binary columns through an actor-pool decode
stage (codec stubbed; schema/batching/feature layout real)."""

import pyarrow as pa
import pytest

from etl_framework_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageDecoder,
    decode_images,
    synth_media_batch,
)


def test_synth_batch_schema():
    t = synth_media_batch(8, seed=1)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.equals(synth_media_batch(8, seed=1))  # deterministic


def test_decoder_unit():
    t = synth_media_batch(4, seed=2)
    out = ImageDecoder()(t)
    assert out.column_names == ["media_id", "media_type", "mime", "height", "width", "channels", "mean_intensity"]
    rows = out.to_pylist()
    assert all(16 <= r["height"] < 64 and r["channels"] == 3 for r in rows)
    assert all(0 <= r["mean_intensity"] <= 255 for r in rows)


def test_decoder_rejects_garbage():
    bad = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([b"nonsense"], pa.large_binary()),
            "mime": pa.array(["image/fake"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="unrecognized image payload"):
        ImageDecoder()(bad)


def test_fake_payloads_decode_even_with_codec_library_present():
    """Backend is sniffed PER PAYLOAD: a fake-format payload must take the
    fake path even when a real codec library is importable (installing
    PIL must not break fake-payload pipelines)."""
    dec = ImageDecoder()
    dec._pil = object()  # simulate "PIL is importable"
    out = dec(synth_media_batch(4, seed=2))
    assert out.num_rows == 4  # would raise if routed to the real decoder

    from etl_framework_ray.stages.multimodal import AudioFeatures, ResizeImage, synth_audio_batch

    rz = ResizeImage(height=8, width=8)
    rz._pil = object()
    assert rz(synth_media_batch(3, seed=1)).num_rows == 3
    af = AudioFeatures()
    af._librosa = object()
    assert af(synth_audio_batch(3, seed=1)).num_rows == 3


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_decode_pipeline():
    import ray.data

    ds = ray.data.from_arrow(synth_media_batch(64, seed=3))
    out = decode_images(ds, batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 64
    assert "payload" not in out.columns  # heavy bytes dropped after decode


@pytest.mark.usefixtures("ray_session")
def test_resize_then_decode_composes():
    import ray.data

    from etl_framework_ray.stages.multimodal import ResizeImage

    ds = ray.data.from_arrow(synth_media_batch(24, seed=5))
    out = (
        ds.map_batches(ResizeImage, fn_constructor_kwargs={"height": 16, "width": 20},
                       batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
        .map_batches(ImageDecoder, batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
        .to_pandas()
    )
    assert (out.height == 16).all() and (out.width == 20).all()
    assert out.mean_intensity.between(0, 255).all()


@pytest.mark.usefixtures("ray_session")
def test_audio_features_pipeline():
    import ray.data

    from etl_framework_ray.stages.multimodal import AudioFeatures, synth_audio_batch

    ds = ray.data.from_arrow(synth_audio_batch(32, seed=4))
    out = ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    ).to_pandas()
    assert len(out) == 32
    assert out.duration_s.between(0.2, 1.05).all()
    assert (out.rms > 0).all()
    assert set(out.sample_rate) <= {8000, 16000}


def test_frame_sampler_unit():
    import struct

    from etl_framework_ray.stages.multimodal import _VHEADER, synth_video_batch

    t = synth_video_batch(6, seed=7)
    k = 4
    out = FrameSampler(every_k=k)(t)
    # one row per sampled frame: ceil(n_frames / k) per clip
    expected = 0
    for i in range(t.num_rows):
        _, nf, h, w, c = _VHEADER.unpack_from(t.column("payload")[i].as_py())
        expected += -(-nf // k)
    assert out.num_rows == expected
    assert out.column("frame_idx").to_pylist()[:2] == [0, 4] or out.num_rows > 0
    # frames are image payloads: the image decoder composes directly
    decoded = ImageDecoder()(out)
    assert decoded.num_rows == expected
    assert all(v % k == 0 for v in out.column("frame_idx").to_pylist())
    # deterministic
    assert out.equals(FrameSampler(every_k=k)(synth_video_batch(6, seed=7)))


@pytest.mark.usefixtures("ray_session")
def test_frame_sampling_pipeline_composes():
    import ray.data

    from etl_framework_ray.stages.multimodal import sample_frames, synth_video_batch

    ds = ray.data.from_arrow(synth_video_batch(12, seed=9))
    out = (
        sample_frames(ds, every_k=3, batch_size=4, concurrency=(1, 2))
        .map_batches(ImageDecoder, batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
        .to_pandas()
    )
    assert len(out) > 12  # fan-out: multiple frames per clip
    assert {"media_id", "frame_idx", "height", "width", "mean_intensity"} <= set(out.columns)
    assert (out.channels == 3).all()
