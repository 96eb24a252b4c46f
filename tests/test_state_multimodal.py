"""Resumable-output manifests and multimodal stage plumbing."""

import glob
import json
import os
import shutil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_resumable_run_and_skip(ray_session, tmp_path):
    from s2ray.functions.extract import extract_geotag, extract_text, drop_html
    from s2ray.sources.pages import synth_pages_batch
    from s2ray.stages.assign import assign_cells
    from s2ray.state.manifest import (load_metrics, pending_fragments,
                                      run_resumable)

    out = str(tmp_path / "tiles_out")
    inputs = sorted(glob.glob(f"{SF}/documents.parquet"))
    transforms = [synth_pages_batch, extract_text, extract_geotag, drop_html,
                  assign_cells]
    r1 = run_resumable(inputs, out, transforms)
    assert r1["fragments_processed"] == 1
    assert r1["rows_out"] == 500
    m = load_metrics(out)
    assert len(m) == 1 and m.rows_out[0] == 500 and m.wall_s[0] > 0

    # second run: everything skipped, outputs untouched
    data_file = glob.glob(f"{out}/part-*/data.parquet")[0]
    mtime = os.path.getmtime(data_file)
    r2 = run_resumable(inputs, out, transforms)
    assert r2["fragments_processed"] == 0
    assert r2["fragments_skipped_resume"] == 1
    assert os.path.getmtime(data_file) == mtime

    # invalidate the manifest -> that partition (only) is recomputed
    mp = glob.glob(f"{out}/_manifest/*.json")[0]
    os.remove(mp)
    assert pending_fragments(inputs, out) == inputs
    r3 = run_resumable(inputs, out, transforms)
    assert r3["fragments_processed"] == 1


def test_media_decode_pipeline(ray_session):
    from s2ray.stages.multimodal import media_stats

    out = media_stats(SF).to_pandas().sort_values("media_type", ignore_index=True)
    assert list(out.media_type) == ["audio", "image", "video"]
    assert (out.n.sum()) == 500
    assert (out.total_bytes == out.n * 4096).all()


def test_media_decode_deterministic(ray_session):
    from s2ray.stages.multimodal import MediaDecodeStage, read_media

    ds = read_media(SF)
    a = ds.map_batches(MediaDecodeStage, concurrency=2, batch_size=128,
                       batch_format="pyarrow").to_pandas().sort_values(
        "media_id", ignore_index=True)
    b = ds.map_batches(MediaDecodeStage, concurrency=2, batch_size=64,
                       batch_format="pyarrow").to_pandas().sort_values(
        "media_id", ignore_index=True)
    assert a.equals(b)


def test_frame_sampling(ray_session):
    """Frame sampling is REAL: each emitted payload is a single-frame PNG
    whose decoded pixels are bit-exact to the synthetic APNG's frame at
    that index (recomputed from the shared frame-stack generator)."""
    from s2ray.stages.codecs import build_apng, decode_png
    from s2ray.stages.multimodal import (FrameSampleStage, read_media,
                                         synth_video_frames)

    ds = read_media(SF)
    frames = ds.map_batches(FrameSampleStage, fn_constructor_kwargs={"every_n": 4},
                            concurrency=2, batch_size=128,
                            batch_format="pyarrow").to_pandas()
    assert len(frames) > 0
    assert (frames.frame_idx % 4 == 0).all()
    checked = 0
    for mid, fidx, payload in frames.head(30)[
            ["media_id", "frame_idx", "frame_payload"]].itertuples(index=False):
        seed = int(mid) * 2654435761 % (1 << 32)
        stack = synth_video_frames(seed)
        if len(build_apng(stack, delay_ms=40)) > 4096:
            stack = synth_video_frames(seed, max_frames=2)
        meta, px = decode_png(payload)
        assert np.array_equal(px, stack[int(fidx)]), (mid, fidx)
        checked += 1
    assert checked > 0


def test_apng_codec_roundtrip():
    """APNG build -> parse -> per-frame decode is bit-exact, plain PNGs
    are rejected, out-of-range frames return None."""
    from s2ray.stages.codecs import (build_apng, decode_apng_frame,
                                     encode_png, parse_apng)

    rng = np.random.RandomState(3)
    stack = [rng.randint(0, 256, (9, 14, 3), dtype=np.uint8)
             for _ in range(6)]
    data = build_apng(stack, delay_ms=40)
    meta = parse_apng(data)
    assert meta["n_frames"] == 6 and meta["format"] == "video/apng"
    assert (meta["width"], meta["height"]) == (14, 9)
    assert meta["duration_ms"] == 6 * 40
    for k, f in enumerate(stack):
        assert np.array_equal(decode_apng_frame(data, k), f), k
    assert decode_apng_frame(data, 6) is None
    assert parse_apng(encode_png(stack[0])) is None


def test_real_codec_header_path():
    """use_real_codec without PIL falls back to the pure-python header
    codec, which must decode real container bytes byte-exactly."""
    import pyarrow as pa

    from s2ray.stages.codecs import build_png, build_wav, parse_png, parse_wav
    from s2ray.stages.multimodal import MediaDecodeStage

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    # round-trip the builders through the parsers
    png = build_png(640, 480)
    assert parse_png(png) == {"width": 640, "height": 480, "bit_depth": 8,
                              "color_type": 2, "format": "image/png"}
    wav = build_wav(16000, 32000)
    w = parse_wav(wav)
    assert (w["sample_rate"], w["n_samples"], w["duration_ms"]) == \
        (16000, 32000, 2000)
    # corrupt a header byte -> CRC mismatch -> rejected
    assert parse_png(png[:16] + b"\xff" + png[17:]) is None

    stage = MediaDecodeStage(use_real_codec=True)
    assert stage.codec == "headers"
    batch = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "media_type": pa.array(["image", "audio"]),
        "payload": pa.array([png, wav], type=pa.binary()),
    })
    out = stage(batch).to_pandas()
    assert list(out.format) == ["image/png", "audio/wav"]
    assert out.width[0] == 640 and out.height[0] == 480
    assert out.sample_rate[1] == 16000 and out.duration_ms[1] == 2000


def test_real_codec_on_synth_media(ray_session):
    """The synthetic corpus's embedded PNG/WAV headers parse end-to-end."""
    from s2ray.stages.multimodal import MediaDecodeStage, read_media

    out = read_media(SF).map_batches(
        MediaDecodeStage, fn_constructor_kwargs={"use_real_codec": True},
        concurrency=2, batch_size=128, batch_format="pyarrow",
    ).to_pandas()
    img = out[out.media_type == "image"]
    aud = out[out.media_type == "audio"]
    # real decodable gradient PNGs: 16 <= w < 64, 12 <= h < 48, except the
    # rare 8x8 fallback rows for seeds whose PNG would exceed the payload
    assert (img.format == "image/png").all()
    assert ((img.width >= 16) | (img.width == 8)).all()
    assert (img.width < 64).all() and (img.height < 48).all()
    assert ((img.height >= 12) | (img.height == 8)).all()
    assert (aud.format == "audio/wav").all() and (aud.sample_rate > 0).all()


def test_write_tiles_partitioned_resume(ray_session, tmp_path):
    import glob as _glob

    from s2ray.pipelines.tiles import write_tiles_partitioned

    out = str(tmp_path / "tiles_part")
    r1 = write_tiles_partitioned(SF, out, level=8, partition_level=2)
    assert r1["partitions_written"] == r1["partitions_total"] > 5
    parts = _glob.glob(f"{out}/cell=*/tiles.parquet")
    assert len(parts) == r1["partitions_total"]
    # rows across partitions sum to 500 pages
    import pyarrow.parquet as pq

    total = sum(pq.read_table(p).column("n_pages").to_pandas().sum()
                for p in parts)
    assert total == 500
    # rerun: everything skipped
    r2 = write_tiles_partitioned(SF, out, level=8, partition_level=2)
    assert r2["partitions_written"] == 0
    # drop one manifest -> only that partition rewritten
    mp = sorted(_glob.glob(f"{out}/_manifest/*.json"))[0]
    os.remove(mp)
    r3 = write_tiles_partitioned(SF, out, level=8, partition_level=2)
    assert r3["partitions_written"] == 1


def test_media_pixel_dedup_groups_reencodes(ray_session):
    """Byte-distinct PNG re-encodes (different row filters, same pixels)
    must group by decoded-pixel hash exactly along the construction
    (doc_id // 9 among image docs), and a byte hash must find NONE."""
    from s2ray.sources.readers import read_table
    from s2ray.stages.multimodal import (PixelHashStage, media_pixel_dedup,
                                         synth_image_variants)

    SF = "/root/testdata/sf0.001"
    out = media_pixel_dedup(SF).to_pandas()
    # expected groups from the construction: image docs (id % 3 == 0)
    # bucketed by id // 9, keeping buckets with >= 2 members
    import collections

    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    img = [int(i) for i in ids if i % 3 == 0]
    buckets = collections.Counter(i // 9 for i in img)
    want = {g: n for g, n in buckets.items() if n >= 2}
    assert len(out) == len(want)
    got = dict(zip((out.min_media_id // 9), out.n_copies))
    assert got == want
    # contrast: byte hashing groups nothing
    ds = read_table(SF, "documents", columns=["doc_id"]) \
        .map_batches(synth_image_variants, batch_format="pyarrow")
    h = ds.map_batches(PixelHashStage, concurrency=(1, 2), batch_size=256,
                       batch_format="pyarrow").to_pandas()
    assert (h.groupby("byte_hash").size() >= 2).sum() == 0
    assert h.pixel_hash.notna().all()
