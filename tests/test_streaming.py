"""Streaming kNN skin (streaming/incremental.py:streaming_knn)."""

from tests.conftest import SF_DIR




def test_streaming_knn_union_equals_batch(spark, tmp_path):
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from demeter_spark.streaming.incremental import streaming_knn

    pts = synth.page_points(spark, SF_DIR)
    in_dir = str(tmp_path / "in")
    for i in range(2):
        pts.filter(f"doc_id % 2 = {i}").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    streaming_knn(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        k=3, res=6,
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(tmp_path / "out"))
            .select("url", "place_id", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            joins.knn_join(pts, synth.gazetteer(spark), k=3, res=6)
            .select("url", "place_id", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) > 0
