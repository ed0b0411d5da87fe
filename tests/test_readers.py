"""Reader registry: sniffing rules, dispatch fallbacks, sheet-table
type inference (reader/mod.rs, xlsx_table_detect.rs semantics)."""

from memvid_spark.sources.readers import (
    demo_sheets,
    extract_documents,
    register_reader,
    sheet_tables,
    sniff_format,
)


def test_sniff_format_rules():
    assert sniff_format(b"%PDF-1.7 blah") == "pdf"
    assert sniff_format(b"PK\x03\x04...", "mv2://a/report.XLSX") == "xlsx"
    assert sniff_format(b"PK\x03\x04...", "mv2://a/deck.pptx") == "pptx"
    assert sniff_format(b"PK\x03\x04...", "mv2://a/archive.zip") == "zip"
    assert sniff_format("plain text".encode()) == "text"
    assert sniff_format(b"\xff\xfe\x00\x80") == "binary"


def test_extract_binary_and_custom_reader(spark):
    payloads = spark.createDataFrame(
        [(1, "a.bin", bytearray(b"\xff\xfe\x00\x80")),
         (2, "b.txt", bytearray(b"hello"))],
        "doc_id long, uri string, payload binary",
    )
    rows = {r.doc_id: r for r in extract_documents(payloads).collect()}
    assert rows[1].fmt == "binary" and rows[1].text is None
    assert rows[2].fmt == "text" and rows[2].text == "hello"
    # plugin registration (DocumentReader registry analogue)
    register_reader("binary", lambda b: f"<{len(b)} bytes>")
    try:
        rows = {r.doc_id: r for r in extract_documents(payloads).collect()}
        assert rows[1].text == "<4 bytes>"
    finally:
        del __import__("memvid_spark.sources.readers", fromlist=["READERS"]).READERS[
            "binary"
        ]


def test_sheet_table_types(spark):
    docs = spark.createDataFrame([(7, "alpha beta")], "doc_id long, text string")
    out = sheet_tables(demo_sheets(docs)).collect()
    t0 = {r.col_index: r for r in out if r.table_index == 0}
    assert [t0[i].header for i in range(3)] == ["name", "qty", "price"]
    assert [t0[i].dtype for i in range(3)] == ["str", "int", "double"]
    assert t0[0].n_rows == 7 % 3 + 2
    t1 = {r.col_index: r for r in out if r.table_index == 1}
    assert [t1[i].header for i in range(2)] == ["city", "code"]
    assert t1[1].dtype == "int"


def test_transcribe_requires_model_and_plumbs_segments(spark):
    import pytest

    from memvid_spark.sources.multimodal import media_from_documents, transcribe_audio

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (4, "gamma delta")], "doc_id long, text string"
    )
    media = media_from_documents(docs)  # doc 1 and 4 → audio/wav (id%3==1)
    with pytest.raises(NotImplementedError):
        transcribe_audio(media)
    fake = lambda payload: [(0.0, 1.5, f"<{len(payload)}b>"), (1.5, 3.0, "end")]
    segs = transcribe_audio(media, fake).collect()
    assert {r.media_id for r in segs} == {1, 4}
    assert all(r.t_end > r.t_start for r in segs)
    assert sorted(r.seg_index for r in segs if r.media_id == 1) == [0, 1]


def test_api_embedder_transport_injection(spark):
    import pytest

    from memvid_spark.functions.embed import ApiEmbedder

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        ApiEmbedder().embed_df(docs)
    e = ApiEmbedder(dim=3, transport=lambda texts: [[1.0, 0.0, 0.0]] * len(texts))
    out = e.embed_df(docs).collect()
    assert out[0].embedding == [1.0, 0.0, 0.0]
    bad = ApiEmbedder(dim=4, transport=lambda texts: [[1.0]] * len(texts))
    with pytest.raises(Exception, match="dimension"):
        bad.embed_df(docs).collect()


def test_batch_model_embedder_plumbing_and_knn(spark):
    """BatchModelEmbedder: executor-side model factory, Arrow batching,
    L2 normalization, dimension contract — with the deterministic
    projection stand-in encoder; kNN over its output must rank a
    near-duplicate text above an unrelated one (recall sanity)."""
    import pytest

    from memvid_spark.functions.embed import (
        BatchModelEmbedder,
        projection_model_factory,
    )
    from memvid_spark.functions.vector import cosine

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition join aggregate"),
            (2, "spark shuffle partition join aggregate tuning"),
            (3, "grape orchard harvest wine barrels"),
        ],
        "doc_id long, text string",
    )
    if not BatchModelEmbedder.available():
        with pytest.raises(NotImplementedError):
            BatchModelEmbedder().embed_df(docs)
    emb = BatchModelEmbedder(dim=64, model_factory=projection_model_factory(64),
                             batch_size=2)
    out = emb.embed_df(docs)
    rows = {r.doc_id: r.embedding for r in out.collect()}
    assert all(len(v) == 64 for v in rows.values())
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-9 for v in rows.values())
    # query-side twin agrees with the df path
    q = emb.embed_query("spark shuffle partition join aggregate")
    assert max(abs(a - b) for a, b in zip(q, rows[1])) < 1e-9
    # recall sanity: near-dup text closer than unrelated text
    scored = out.select(
        "doc_id", cosine(F.col("embedding"), F.lit(q).cast("array<double>")).alias("s")
    )
    s = {r.doc_id: r.s for r in scored.collect()}
    assert s[1] > s[2] > s[3]
    # dimension contract enforced
    bad = BatchModelEmbedder(dim=32, model_factory=projection_model_factory(64))
    with pytest.raises(Exception, match="dimension"):
        bad.embed_df(docs).collect()


def test_transcriber_factory_builds_executor_side(spark):
    from memvid_spark.sources.multimodal import media_from_documents, transcribe_audio

    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    media = media_from_documents(docs)

    def factory():
        # runs once per task on the executor; a real model would load here
        return lambda payload: [(0.0, 1.0, f"seg<{len(payload)}>")]

    segs = transcribe_audio(media, transcriber_factory=factory).collect()
    assert len(segs) == 1 and segs[0].text.startswith("seg<")
