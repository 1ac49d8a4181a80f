"""Raw-HTML link extraction (P1 over real HTML) and the
content-addressed media pipeline (S15/S16)."""

from pyspark.sql import functions as F

from openslack_crawler_spark.functions.html import links_from_html
from openslack_crawler_spark.operators import media as M

HTML = """
<html><body>
  <a href="/rel/path">Relative</a>
  <a href="http://other.example/x" rel="nofollow">NoFollow</a>
  <area href="http://area.example/a">
  <a>no href</a>
  <p>not a link</p>
</body></html>
"""


def test_links_from_html(spark):
    df = spark.createDataFrame([( "http://base.example/dir/page", HTML)], ["url", "body"])
    got = links_from_html(df).orderBy("anchor_offset").collect()
    assert [(r.link_url, r.anchor_text, r.nofollow) for r in got] == [
        ("http://base.example/rel/path", "Relative", False),
        ("http://other.example/x", "NoFollow", True),
        ("http://area.example/a", "", False),
    ]
    assert [r.anchor_offset for r in got] == [0, 1, 2]


def _docs(spark):
    spans = [
        ("text", "t", "", 0),
        ("image", "", "img-1", 1),
        ("file", "", "file-2", 2),
        ("image", "", "img-1", 3),  # duplicate ref → one fetch
    ]
    return spark.createDataFrame(
        [("d1", "http://h/1", spans)],
        "doc_id string, url string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_media_candidates_and_key(spark):
    cands = M.media_candidates(_docs(spark)).collect()
    assert len(cands) == 3  # spans, pre-dedup
    keys = {r.media_ref: r.media_key for r in cands}
    assert len(keys["img-1"]) == 40  # sha1 hex of the media url


def test_needs_fetch_freshness(spark):
    cands = M.media_candidates(_docs(spark))
    assert M.needs_fetch(cands, None).count() == 2  # deduped by key

    fetched = M.fetch_media_stub(M.needs_fetch(cands, None), round_id=1)
    rows = fetched.collect()
    assert {r.content_type for r in rows} == {"image/fake", "application/fake"}
    assert all(r.checksum and r.payload for r in rows)

    # everything fresh → nothing to fetch
    assert M.needs_fetch(cands, fetched).count() == 0
    # stale store (old fetched_at) → fetch again
    stale = fetched.withColumn("fetched_at", F.lit("2000-01-01").cast("timestamp"))
    assert M.needs_fetch(cands, stale).count() == 2


def test_thumbnails(spark):
    cands = M.media_candidates(_docs(spark))
    fetched = M.fetch_media_stub(M.needs_fetch(cands, None), round_id=1)
    thumbs = M.thumbnail_plan(fetched).collect()
    # one image key × two sizes, aspect-fit output dims
    assert sorted(t.size_name for t in thumbs) == ["big", "small"]
    for t in thumbs:
        box = M.IMAGES_THUMBS[t.size_name]
        assert 1 <= t.out_w <= min(t.src_w, box[0])
        assert 1 <= t.out_h <= min(t.src_h, box[1])
        if t.src_w > box[0] or t.src_h > box[1]:  # shrunk → aspect kept
            assert abs(t.out_w / t.out_h - t.src_w / t.src_h) < 0.05


def test_thumb_dims_pil_semantics(spark):
    """Aspect-fit arithmetic matches PIL Image.thumbnail: no upscale,
    floor division, never below 1."""
    rows = [
        # (src_w, src_h, box_w, box_h, want_w, want_h)
        (100, 100, 270, 270, 100, 100),   # no upscale
        (1000, 500, 270, 270, 270, 135),  # width-bound
        (500, 1000, 270, 270, 135, 270),  # height-bound
        (2000, 1, 270, 270, 270, 1),      # floor to >= 1
        (970, 970, 970, 970, 970, 970),   # exact fit
    ]
    df = spark.createDataFrame(
        [(a, b, c, d) for a, b, c, d, _, _ in rows],
        "src_w int, src_h int, box_w int, box_h int",
    )
    got = {
        (r.src_w, r.src_h, r.box_w, r.box_h): (r.out_w, r.out_h)
        for r in M.with_thumb_dims(df).collect()
    }
    for a, b, c, d, w, h in rows:
        assert got[(a, b, c, d)] == (w, h), (a, b, c, d)


def test_frame_sample_plan_and_decode_stub(spark):
    """AV frame sampling: plan invariants (k rows per container,
    ts within duration, frame_no consistent with fps) and the
    mapInPandas decode stub's Arrow plumbing (schema, determinism,
    crc integrity)."""
    import zlib

    from pyspark.sql import functions as F

    from openslack_crawler_spark.operators.media import (
        av_metadata,
        decode_frames_stub,
        frame_sample_plan,
    )

    av = spark.range(40).select(
        F.concat(F.lit("av-"), F.col("id").cast("string")).alias("media_ref")
    )
    plan = frame_sample_plan(av_metadata(av), k=4)
    rows = plan.collect()
    assert len(rows) == 160  # 4 frames per container
    for r in rows:
        assert 1000 <= r.duration_ms <= 120000 and r.fps in (24, 25, 30)
        assert 0 <= r.ts_ms < r.duration_ms
        assert r.frame_no == r.ts_ms * r.fps // 1000
    decoded = decode_frames_stub(plan)
    assert decoded.schema.simpleString() == (
        "struct<media_ref:string,frame_idx:int,ts_ms:bigint,"
        "frame_no:bigint,frame_bytes:binary,frame_crc:bigint>"
    )
    d1 = {(r.media_ref, r.frame_idx): (bytes(r.frame_bytes), r.frame_crc)
          for r in decoded.collect()}
    d2 = {(r.media_ref, r.frame_idx): (bytes(r.frame_bytes), r.frame_crc)
          for r in decode_frames_stub(plan).collect()}
    assert d1 == d2 and len(d1) == 160  # deterministic across runs
    for payload, crc in d1.values():
        assert len(payload) == 64 and zlib.crc32(payload) == crc
