"""Video-level perceptual near-dup (round 12): per-clip majority
fingerprint over frame dHashes (operators/multimodal.py
video_fingerprint / video_near_dups) — container invariance
(MJPEG-in-AVI vs Y4M of the same pictures resolve to one survivor),
discrimination against distinct clips, and the CLI + streaming admit
wiring for --kind video."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from test_operators import _make_avi, _make_jpeg

from etl_olho_vivo_spark.operators import multimodal

SCHEMA = "doc_id long, media binary"


def _planes(seed, n=6, h=16, w=16):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 256, size=(h, w)).astype(np.float64)
        for _ in range(n)
    ]


def _avi_clip(planes):
    h, w = planes[0].shape
    return _make_avi(
        [_make_jpeg(w, h, [p], [(1, 1)]) for p in planes]
    )


def _y4m_clip(planes):
    h, w = planes[0].shape
    chroma = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)
    for p in planes:
        out += (b"FRAME\n" + p.astype(np.uint8).tobytes()
                + bytes([128]) * chroma)
    return out


def test_vfp_majority_fold_pins():
    """The bitwise-majority fold on analytically-known inputs: strict
    majority per bit, ties to 0, None frames skipped, all-None → None,
    and the signed-i64 wrap for a set bit 63."""
    fold = multimodal._vfp_votes_fn()
    assert fold([]) is None
    assert fold([None, None]) is None
    # 3 voters: bit0 2/3 → 1; bit1 1/3 → 0; bit2 3/3 → 1
    assert fold([0b101, 0b111, 0b100]) == 0b101
    # ties (1/2) resolve to 0; None does not dilute the vote
    assert fold([0b11, 0b01, None]) == 0b01
    # a single frame IS the fingerprint (majority of one)
    assert fold([42]) == 42
    # majority sets bit 63 → signed two's-complement long
    top = 1 << 63
    assert fold([top - (1 << 64), top - (1 << 64)]) == top - (1 << 64)


def test_video_fingerprint_container_invariance(spark):
    """The SAME pictures muxed as MJPEG-in-AVI and as Y4M fingerprint
    within re-encode distance (the JPEG leg re-quantizes pixels; the
    majority fold absorbs the per-frame flips), video_near_dups pairs
    them, and distinct clips stay far apart and unpaired.  Opaque
    media yield NULL vfp and never pair."""
    clip = _planes(7)
    other = _planes(99)
    rows = [
        (1, bytearray(_avi_clip(clip))),
        (2, bytearray(_y4m_clip(clip))),
        (3, bytearray(_y4m_clip(other))),
        (4, bytearray(b"not a video at all")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    fps = {r["doc_id"]: r for r in multimodal.video_fingerprint(df).collect()}

    assert fps[1]["media_kind"] == "avi"
    assert fps[2]["media_kind"] == "y4m"
    assert fps[4]["media_kind"] == "opaque" and fps[4]["vfp"] is None
    assert fps[5]["vfp"] is None
    assert fps[1]["n_frames"] == fps[2]["n_frames"] == len(clip)
    # clip geometry rides the same decode pass (the resolution gate)
    assert (fps[1]["width"], fps[1]["height"]) == (16, 16)
    assert (fps[2]["width"], fps[2]["height"]) == (16, 16)
    assert fps[4]["width"] is None and fps[4]["height"] is None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    same = ham(fps[1]["vfp"], fps[2]["vfp"])
    diff = ham(fps[1]["vfp"], fps[3]["vfp"])
    assert same <= 6, f"same clip measured {same} bits apart"
    assert diff > 6, f"distinct clips measured only {diff} bits apart"

    pairs = [(r["doc_a"], r["doc_b"])
             for r in multimodal.video_near_dups(df).collect()]
    assert pairs == [(1, 2)]


def test_video_fingerprint_stride_dial(spark):
    """stride samples every k-th frame: a stride equal to the clip
    length folds exactly frame 0, and the validation rejects
    non-positive strides driver-side."""
    clip = _planes(7, n=4)
    df = spark.createDataFrame(
        [(1, bytearray(_y4m_clip(clip)))], SCHEMA
    )
    full = multimodal.video_fingerprint(df).collect()[0]
    first = multimodal.video_fingerprint(df, stride=len(clip)).collect()[0]
    # n_frames reports the demuxed total either way
    assert full["n_frames"] == first["n_frames"] == 4
    dhash = multimodal._dhash_fn()
    parse = multimodal._media_parser(pixels=True)
    demux = multimodal._y4m_demuxer()
    f0 = demux(_y4m_clip(clip))[0]
    assert first["vfp"] == dhash(parse(f0)[6])
    with pytest.raises(ValueError, match="stride"):
        multimodal.video_fingerprint(df, stride=0)


@pytest.mark.sweep
def test_media_dedup_cli_video(spark, tmp_path, capsys):
    """End-to-end media-dedup CLI, video kind: the two containers of
    one clip resolve to the min-id survivor, the distinct clip and the
    opaque row survive."""
    from etl_olho_vivo_spark.__main__ import main

    clip = _planes(7)
    rows = [
        (1, bytearray(_avi_clip(clip))),
        (2, bytearray(_y4m_clip(clip))),
        (3, bytearray(_y4m_clip(_planes(99)))),
        (4, bytearray(b"opaque bytes")),
    ]
    src = str(tmp_path / "videos")
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)
    pairs_out = str(tmp_path / "pairs")
    surv_out = str(tmp_path / "survivors")
    assert main(["--cpus", "8", "media-dedup", "--in", src,
                 "--kind", "video", "--pairs-out", pairs_out,
                 "--survivors-out", surv_out]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"command": "media-dedup", "kind": "video",
                     "pairs": 1, "survivors": 3}
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(surv_out).collect()
    )
    assert kept == [1, 3, 4]


@pytest.mark.sweep
def test_media_stream_end_to_end_video(spark, tmp_path):
    """Full readStream → foreachBatch drain, video kind with a
    min-frames gate: container dup collapses in-batch, a cross-batch
    re-encode drops against the store, a short clip is gated out."""
    import glob
    import shutil

    from etl_olho_vivo_spark.streaming.media_stream import (
        run_media_stream,
    )

    stage = str(tmp_path / "landing")
    os.makedirs(stage)
    clip = _planes(7)

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
        tmp = f"{stage}__{name}"
        df.write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        shutil.move(part, os.path.join(stage, f"{name}.parquet"))
        shutil.rmtree(tmp)

    write_batch("b0", [(1, bytearray(_avi_clip(clip))),
                       (2, bytearray(_y4m_clip(clip))),
                       (3, bytearray(_y4m_clip(_planes(7, n=2))))])
    write_batch("b1", [(10, bytearray(_y4m_clip(clip))),
                       (11, bytearray(_avi_clip(_planes(123))))])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    # width/height apply to video too (round 12): the 16px floor
    # passes every clip here — the frame-count gate does the dropping
    q = run_media_stream(
        stream, corpus, store, str(tmp_path / "ckpt"),
        kind="video", gates={"min_frames": 3, "min_width": 16},
    )
    q.awaitTermination(180)

    def ids(path):
        return sorted(
            r["doc_id"] for r in spark.read.parquet(path).collect()
        )

    # 2 = container dup of 1 (in-batch), 3 = 2-frame clip gated out,
    # 10 = cross-batch re-encode of 1 dropped vs the store
    assert ids(corpus) == [1, 11]
    assert ids(store) == [1, 11]


@pytest.mark.sweep
def test_media_stream_admit_video(spark, tmp_path):
    """Streaming admit loop, video kind: in-batch container dup
    resolved to the min id, a later batch's re-encode of an admitted
    clip dropped against the fingerprint store, fresh clip admitted."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    clip = _planes(7)

    b0 = spark.createDataFrame(
        [(1, bytearray(_avi_clip(clip))),
         (2, bytearray(_y4m_clip(clip))),
         (3, bytearray(_y4m_clip(_planes(99))))],
        SCHEMA,
    )
    admit_media_batch(spark, b0, 0, corpus, store, kind="video")

    def ids(path):
        return sorted(
            r["doc_id"] for r in spark.read.parquet(path).collect()
        )

    assert ids(corpus) == [1, 3]
    assert ids(store) == [1, 3]

    b1 = spark.createDataFrame(
        [(10, bytearray(_y4m_clip(clip))),          # re-encode of 1
         (11, bytearray(_avi_clip(_planes(123))))],  # fresh
        SCHEMA,
    )
    admit_media_batch(spark, b1, 1, corpus, store, kind="video")
    assert ids(corpus) == [1, 3, 11]
    assert ids(store) == [1, 3, 11]

def test_video_excerpt_is_not_a_near_dup(spark):
    """Round 13 (r12 verdict "What's missing" #3): the identity the
    majority fingerprint encodes is "same pictures BY MAJORITY" —
    re-paces and minority trims keep the fingerprint, but an EXCERPT
    whose frames are a minority of the source folds its own majority
    over a different frame population and must NOT pair.  Pinned as a
    decision, not left as a surprise.  Y4M frames are lossless, so the
    majorities here are exact: full = 9xA + 3xB folds to dHash(A);
    the one-frame trim keeps that majority (pairs, hamming 0); the
    tail excerpt (1xA + 3xB) folds to dHash(B) (no pair)."""
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    rows = [
        (1, bytearray(_y4m_clip([a] * 9 + [b] * 3))),   # the source
        (2, bytearray(_y4m_clip([a] * 8 + [b] * 3))),   # minority trim
        (3, bytearray(_y4m_clip([a] + [b] * 3))),       # tail excerpt
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    fps = {r["doc_id"]: r["vfp"]
           for r in multimodal.video_fingerprint(df).collect()}
    dhash = multimodal._dhash_fn()
    parse = multimodal._media_parser(pixels=True)
    demux = multimodal._y4m_demuxer()
    fp_a = dhash(parse(demux(_y4m_clip([a]))[0])[6])
    fp_b = dhash(parse(demux(_y4m_clip([b]))[0])[6])
    assert fps[1] == fps[2] == fp_a    # exact majorities, trim-stable
    assert fps[3] == fp_b              # the excerpt IS its own majority

    pairs = [(r["doc_a"], r["doc_b"])
             for r in multimodal.video_near_dups(df).collect()]
    assert pairs == [(1, 2)]           # trim pairs; excerpt does not


def test_video_excerpt_is_contained(spark):
    """Round 14 (r13 verdict #1): the retrieval sibling of the excerpt
    decision.  The tail excerpt that ``video_near_dups`` correctly
    refuses to pair (test above) IS reported by the per-frame
    containment query — every excerpt frame appears verbatim in the
    source (Y4M is lossless → hamming 0), so frac = 1.0 — while a
    distinct clip sharing no pictures reports nothing."""
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    c = _planes(123, n=1)[0]
    rows = [
        (1, bytearray(_y4m_clip([a] * 9 + [b] * 3))),   # the source
        (3, bytearray(_y4m_clip([a] + [b] * 3))),       # tail excerpt
        (4, bytearray(_y4m_clip([c] * 4))),             # distinct clip
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    frames = multimodal.video_frame_fingerprints(df)
    # index = whole corpus; probe = the excerpt and the distinct clip
    probe = frames.filter("doc_id IN (3, 4)")
    got = {
        (r["doc_probe"], r["doc_index"]):
            (r["matched_frames"], r["probe_frames"], r["frac"])
        for r in multimodal.media_containment_pairs(
            probe, frames, max_hamming=6, n_bands=8, min_frac=0.9
        ).collect()
    }
    assert got == {(3, 1): (4, 4, 1.0)}
    # the dedup boundary still holds: the excerpt is NOT a near-dup
    pairs = [(r["doc_a"], r["doc_b"])
             for r in multimodal.video_near_dups(df).collect()]
    assert (1, 3) not in pairs and (3, 1) not in pairs


def test_video_containment_partial_and_threshold(spark):
    """min_frac is an exact integer-arithmetic boundary: a probe with
    half its frames in the index passes at 0.5 and fails just above;
    a probe frame matching MANY index frames still counts once."""
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    c = _planes(123, n=1)[0]
    rows = [
        # index doc: many copies of a (multi-match for one probe frame)
        (1, bytearray(_y4m_clip([a] * 6))),
        # probe: half a-frames, half c-frames (c not in the index)
        (2, bytearray(_y4m_clip([a, c] * 2))),
        (3, bytearray(_y4m_clip([b] * 2))),             # unrelated
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    frames = multimodal.video_frame_fingerprints(df)
    probe = frames.filter("doc_id = 2")
    index = frames.filter("doc_id != 2")

    def run(frac):
        return {
            (r["doc_probe"], r["doc_index"]): r["matched_frames"]
            for r in multimodal.media_containment_pairs(
                probe, index, max_hamming=6, n_bands=8, min_frac=frac
            ).collect()
        }

    assert run(0.5) == {(2, 1): 2}   # exactly half covered, once each
    assert run(0.500001) == {}       # strictly above the boundary
    with pytest.raises(ValueError, match="min_frac"):
        multimodal.media_containment_pairs(
            probe, index, min_frac=0.0
        )


def test_video_frame_fingerprints_relation(spark):
    """The unfolded relation: demux-indexed (pre-stride) frame_idx,
    stride sampling, opaque docs emit nothing, and the per-frame
    hashes equal the direct decode path's."""
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    df = spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a, b, a, b]))),
         (2, bytearray(b"not a video"))],
        SCHEMA,
    )
    dhash = multimodal._dhash_fn()
    parse = multimodal._media_parser(pixels=True)
    demux = multimodal._y4m_demuxer()
    fa = dhash(parse(demux(_y4m_clip([a]))[0])[6])
    fb = dhash(parse(demux(_y4m_clip([b]))[0])[6])

    rows = multimodal.video_frame_fingerprints(df).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["fp"] for r in rows}
    assert got == {(1, 0): fa, (1, 1): fb, (1, 2): fa, (1, 3): fb}
    strided = multimodal.video_frame_fingerprints(df, stride=2).collect()
    assert {(r["doc_id"], r["frame_idx"]) for r in strided} \
        == {(1, 0), (1, 2)}


@pytest.mark.sweep
def test_media_stream_maintains_frame_index(spark, tmp_path):
    """frame_index_dir on the video admit loop: the incremental
    per-frame index over admitted clips equals a one-shot
    video_frame_fingerprints over the admitted corpus, a replay
    replaces its partition, and the containment query answers from
    the index alone (no corpus re-decode)."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
        run_media_stream,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    fidx = str(tmp_path / "frame_index")
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    c = _planes(123, n=1)[0]
    b0 = spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a] * 9 + [b] * 3))),  # the source
         (2, bytearray(_y4m_clip([c] * 4)))], SCHEMA
    )
    admit_media_batch(spark, b0, 0, corpus, store, kind="video",
                      frame_index_dir=fidx)

    def rel(df):
        return sorted(
            (r["doc_id"], r["frame_idx"], r["fp"]) for r in df.collect()
        )

    # materialize NOW: the replay below rewrites the corpus partition
    # files this lazy plan would otherwise read too late
    one_shot = rel(multimodal.video_frame_fingerprints(
        spark.read.parquet(corpus).select("doc_id", "media")
    ))
    idx = spark.read.parquet(fidx).select("doc_id", "frame_idx", "fp")
    assert rel(idx) == one_shot
    # replay: partition replaced, not appended
    admit_media_batch(spark, b0, 0, corpus, store, kind="video",
                      frame_index_dir=fidx)
    assert rel(spark.read.parquet(fidx)
               .select("doc_id", "frame_idx", "fp")) == one_shot
    # the excerpt probes the INDEX — the corpus is never re-decoded
    probe = multimodal.video_frame_fingerprints(
        spark.createDataFrame(
            [(30, bytearray(_y4m_clip([a] + [b] * 3)))], SCHEMA
        )
    )
    idx_fresh = spark.read.parquet(fidx).select(
        "doc_id", "frame_idx", "fp"
    )  # the replay replaced the files idx's lazy plan listed
    got = [(r["doc_probe"], r["doc_index"], r["frac"])
           for r in multimodal.media_containment_pairs(
               probe, idx_fresh, min_frac=0.9).collect()]
    assert got == [(30, 1, 1.0)]
    # a non-video stream must reject the dial at start-up
    with pytest.raises(ValueError, match="frame_index_dir"):
        run_media_stream(
            spark.readStream.format("rate").load(),
            corpus, store, str(tmp_path / "ck"),
            kind="image", frame_index_dir=fidx,
        )


@pytest.mark.sweep
def test_video_index_and_contain_cli(spark, tmp_path, capsys):
    """video-index + video-contain end to end: index a corpus of
    clips, probe with an excerpt and a stranger — exactly the excerpt
    is reported, against the index parquet alone."""
    from etl_olho_vivo_spark.__main__ import main

    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    c = _planes(123, n=1)[0]
    corpus = str(tmp_path / "videos")
    spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a] * 9 + [b] * 3))),
         (2, bytearray(_y4m_clip([c] * 4))),
         (3, bytearray(b"opaque"))], SCHEMA
    ).write.parquet(corpus)
    probes = str(tmp_path / "probes")
    spark.createDataFrame(
        [(30, bytearray(_y4m_clip([a] + [b] * 3))),   # excerpt of 1
         (31, bytearray(_y4m_clip([_planes(55, n=1)[0]] * 2)))],
        SCHEMA,
    ).write.parquet(probes)

    idx_out = str(tmp_path / "frame_idx")
    assert main(["video-index", "--in", corpus, "--out", idx_out]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["clips"] == 2 and line["frames"] == 16  # opaque: none

    pairs_out = str(tmp_path / "contained")
    assert main([
        "video-contain", "--index", idx_out, "--probe", probes,
        "--out", pairs_out, "--min-frac", "0.9",
    ]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["containments"] == 1
    (row,) = spark.read.parquet(pairs_out).collect()
    assert (row["doc_probe"], row["doc_index"], row["frac"]) == (30, 1, 1.0)


@pytest.mark.sweep
def test_containment_stop_frame_dial(spark):
    """max_index_df drops fingerprint values carried by too many index
    clips: a probe made of a ubiquitous frame (a logo card) reports
    nothing with the dial set — instead of reporting containment in
    EVERY clip carrying the logo — while a discriminative probe still
    matches its source; the dial validates driver-side."""
    logo = _planes(7, n=1)[0]
    uniq = _planes(99, n=1)[0]
    rows = [(i, bytearray(_y4m_clip([logo] * 2))) for i in (1, 2, 3, 4)]
    rows.append((5, bytearray(_y4m_clip([uniq] * 2 + [logo]))))
    df = spark.createDataFrame(rows, SCHEMA)
    frames = multimodal.video_frame_fingerprints(df)
    index = frames.filter("doc_id <= 5")
    logo_probe = multimodal.video_frame_fingerprints(
        spark.createDataFrame([(30, bytearray(_y4m_clip([logo] * 2)))],
                              SCHEMA))
    uniq_probe = multimodal.video_frame_fingerprints(
        spark.createDataFrame([(31, bytearray(_y4m_clip([uniq] * 2)))],
                              SCHEMA))

    def run(probe, **kw):
        return sorted(
            (r["doc_probe"], r["doc_index"])
            for r in multimodal.media_containment_pairs(
                probe, index, min_frac=0.9, **kw).collect()
        )

    # without the dial: the logo probe is "contained" in all 5 clips
    assert run(logo_probe) == [(30, i) for i in (1, 2, 3, 4, 5)]
    # logo fp appears in 5 distinct index docs > 4 -> dropped; the
    # discriminative probe still matches clip 5 (uniq df = 1)
    assert run(logo_probe, max_index_df=4) == []
    assert run(uniq_probe, max_index_df=4) == [(31, 5)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_index_df"):
        run(logo_probe, max_index_df=0)


def test_containment_probe_duplicate_rows_granularity(spark):
    """Both sides of the containment fraction share DISTINCT-frame
    granularity (round-15, r14 advisor): a probe relation carrying
    duplicate (doc_id, frame_idx) rows — video-contain
    --probe-is-index over unioned parquet — must report the SAME
    pairs and frac as the deduplicated relation, not a deflated frac
    that silently drops true containments."""
    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    index = multimodal.video_frame_fingerprints(spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a] * 9 + [b] * 3)))], SCHEMA))
    probe = multimodal.video_frame_fingerprints(spark.createDataFrame(
        [(30, bytearray(_y4m_clip([a] + [b] * 3)))], SCHEMA))

    def run(p):
        return sorted(
            (r["doc_probe"], r["doc_index"], r["matched_frames"],
             r["probe_frames"], r["frac"])
            for r in multimodal.media_containment_pairs(
                p, index, min_frac=0.9).collect()
        )

    clean = run(probe)
    assert clean == [(30, 1, 4, 4, 1.0)]
    # tripled rows: same doc/frame set, 3x the row count
    assert run(probe.unionAll(probe).unionAll(probe)) == clean


@pytest.mark.sweep
def test_video_contain_cli_rejects_bad_stride(spark, tmp_path):
    """video-contain validates --stride like video-index does: a
    non-positive stride exits with the clean SystemExit message, not
    an uncaught ValueError traceback from the probe build."""
    from etl_olho_vivo_spark.__main__ import main

    a = _planes(7, n=1)[0]
    corpus = str(tmp_path / "videos")
    spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a] * 4)))], SCHEMA
    ).write.parquet(corpus)
    idx_out = str(tmp_path / "frame_idx")
    assert main(["video-index", "--in", corpus, "--out", idx_out]) == 0
    with pytest.raises(SystemExit, match="--stride must be positive"):
        main([
            "video-contain", "--index", idx_out, "--probe", corpus,
            "--out", str(tmp_path / "pairs"), "--stride", "0",
        ])


@pytest.mark.sweep
def test_frame_index_midlife_coverage(spark, tmp_path):
    """frame-index-dir enabled AFTER the first drain is LOUD (round-15,
    r14 advisor — the frame-index twin of the stats store's partial
    stamp): coverage reports partial=true + the missing batch ids +
    the video-index backfill pointer; a backfill of the missing
    partition clears it."""
    from etl_olho_vivo_spark.streaming.media_stream import (
        admit_media_batch,
        frame_index_coverage,
    )

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    fidx = str(tmp_path / "frame_index")
    b0 = spark.createDataFrame(
        [(1, bytearray(_y4m_clip(_planes(7, n=4))))], SCHEMA)
    b1 = spark.createDataFrame(
        [(2, bytearray(_y4m_clip(_planes(99, n=4))))], SCHEMA)
    # batch 0 admitted WITHOUT the frame index; batch 1 with it
    admit_media_batch(spark, b0, 0, corpus, store, kind="video")
    admit_media_batch(spark, b1, 1, corpus, store, kind="video",
                      frame_index_dir=fidx)

    cov = frame_index_coverage(spark, fidx, corpus)
    assert cov["partial"] is True
    assert cov["missing_batch_ids"] == ["0"]
    assert "video-index" in cov["note"]

    # backfill: re-admit batch 0 with the index enabled (the
    # per-partition overwrite makes this replay-idempotent)
    admit_media_batch(spark, b0, 0, corpus, store, kind="video",
                      frame_index_dir=fidx)
    assert frame_index_coverage(spark, fidx, corpus) == {
        "partial": False
    }


def test_video_contain_cli_self_probe_path(spark, tmp_path, capsys):
    """--probe-is-index with the SAME parquet path as --index is a
    corpus self-audit: the CLI must detect it (resolved-path compare)
    and pass self_probe=True so the exact leg collapses like the
    registry self-probe rows (round 16, advisor item) — with results
    identical to the uncollapsed two-read plan."""
    from etl_olho_vivo_spark.__main__ import main

    a = _planes(7, n=1)[0]
    b = _planes(99, n=1)[0]
    corpus = str(tmp_path / "videos")
    spark.createDataFrame(
        [(1, bytearray(_y4m_clip([a] * 9 + [b] * 3))),
         (30, bytearray(_y4m_clip([a] + [b] * 3)))], SCHEMA
    ).write.parquet(corpus)
    idx_out = str(tmp_path / "frame_idx")
    assert main(["video-index", "--in", corpus, "--out", idx_out]) == 0
    capsys.readouterr()

    pairs_out = str(tmp_path / "self_contained")
    assert main([
        "video-contain", "--index", idx_out, "--probe", idx_out,
        "--probe-is-index", "--out", pairs_out, "--min-frac", "0.9",
    ]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # both directions qualify in this corpus: the excerpt (30) is fully
    # covered by 1, and 1's frames are all a/b values 30 also carries
    assert line["containments"] == 2
    got = sorted(
        (r["doc_probe"], r["doc_index"], r["frac"])
        for r in spark.read.parquet(pairs_out).collect()
    )
    assert got == [(1, 30, 1.0), (30, 1, 1.0)]

    # the explicit flag and the two-read fallback agree row-for-row
    p1 = spark.read.parquet(idx_out)
    p2 = spark.read.parquet(idx_out)
    collapsed = sorted(map(tuple, multimodal.media_containment_pairs(
        p1, p2, min_frac=0.9, self_probe=True).collect()))
    fallback = sorted(map(tuple, multimodal.media_containment_pairs(
        p1, p2, min_frac=0.9).collect()))
    assert collapsed == fallback
    assert {(r[0], r[1]) for r in collapsed} == {(1, 30), (30, 1)}
