"""Sequence-packing operators: concat-and-chunk layout and FFD bin packing."""
import pytest

from sissaschool_xmlschema_spark.operators.packing import (
    pack_bins_first_fit,
    pack_bins_stats,
    pack_concat_chunks,
    pack_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_concat_chunks_hand_computed(spark):
    # stream: [5][3][4][6] with seq_len=4 -> offsets 0,5,8,12
    df = _docs(spark, [(1, 5), (2, 3), (3, 4), (4, 6)])
    out = {
        r["doc_id"]: r
        for r in pack_concat_chunks(df, "doc_id", "n_tokens", 4).collect()
    }
    assert out[1]["start_tok"] == 0 and out[1]["first_seq"] == 0
    assert out[1]["last_seq"] == 1 and out[1]["n_splits"] == 1  # spans 0..4
    assert out[2]["start_tok"] == 5 and out[2]["first_seq"] == 1
    assert out[2]["last_seq"] == 1 and out[2]["n_splits"] == 0  # tokens 5..7
    assert out[3]["start_tok"] == 8 and out[3]["n_splits"] == 0  # 8..11 exact
    assert out[4]["start_tok"] == 12 and out[4]["last_seq"] == 4

    stats = pack_stats(
        pack_concat_chunks(df, "doc_id", "n_tokens", 4), 4
    ).first()
    assert stats["total_tokens"] == 18
    assert stats["n_sequences"] == 5  # ceil(18/4)
    assert stats["n_docs_split"] == 2  # docs 1 and 4
    assert stats["n_docs"] == 4


def test_concat_chunks_partitioning_invariant(spark):
    # The two-phase prefix sum must give the same offsets regardless of how
    # the input arrives partitioned.
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    a = pack_concat_chunks(
        _docs(spark, rows).repartition(7), "doc_id", "n_tokens", 16
    )
    b = pack_concat_chunks(
        _docs(spark, rows).coalesce(1), "doc_id", "n_tokens", 16
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and matches the serial prefix sum
    expect = {}
    off = 0
    for i, t in rows:
        expect[i] = off
        off += t
    for r in a.collect():
        assert r["start_tok"] == expect[r["doc_id"]]


def test_concat_chunks_zero_len_doc(spark):
    df = _docs(spark, [(1, 4), (2, 0), (3, 1)])
    out = {r["doc_id"]: r for r in
           pack_concat_chunks(df, "doc_id", "n_tokens", 4).collect()}
    # empty doc sits at offset 4 == boundary; last_seq clamps to first_seq
    assert out[2]["first_seq"] == out[2]["last_seq"] == 1
    assert out[2]["n_splits"] == 0


def test_ffd_capacity_and_determinism(spark):
    rows = [(i, (i * 31) % 50 + 1) for i in range(300)]
    df = _docs(spark, rows)
    a = pack_bins_first_fit(df, "doc_id", "n_tokens", 64, n_groups=8)
    rows_a = a.collect()
    assert len(rows_a) == 300 and not any(r["overflow"] for r in rows_a)
    fills = {}
    for r in rows_a:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(f <= 64 for f in fills.values())
    b = pack_bins_first_fit(df, "doc_id", "n_tokens", 64, n_groups=8)
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, b.collect()))


def test_ffd_oversized_doc_gets_own_bin(spark):
    df = _docs(spark, [(1, 100), (2, 10), (3, 10)])
    out = {r["doc_id"]: r for r in
           pack_bins_first_fit(df, "doc_id", "n_tokens", 64, n_groups=1)
           .collect()}
    assert out[1]["overflow"]
    assert out[1]["bin_id"] not in (out[2]["bin_id"], out[3]["bin_id"])
    assert not out[2]["overflow"] and not out[3]["overflow"]


def test_ffd_beats_next_fit(spark):
    # Classic FFD win: sizes 6,5,5,4,4,3,3 into capacity 10.
    # Next-fit in id order: [6]... -> 5 bins; FFD -> 3 bins (6+4, 5+5, 4+3+3).
    rows = list(enumerate([6, 5, 5, 4, 4, 3, 3], start=1))
    df = _docs(spark, rows)
    out = pack_bins_first_fit(df, "doc_id", "n_tokens", 10, n_groups=1)
    st = pack_bins_stats(out, 10).first()
    assert st["n_bins"] == 3
    assert st["padding_frac"] == pytest.approx(0.0)


def test_pack_invalid_params(spark):
    df = _docs(spark, [(1, 1)])
    with pytest.raises(ValueError):
        pack_concat_chunks(df, "doc_id", "n_tokens", 0)
    with pytest.raises(ValueError):
        pack_bins_first_fit(df, "doc_id", "n_tokens", 0)
    with pytest.raises(ValueError):
        pack_bins_first_fit(df, "doc_id", "n_tokens", 8, n_groups=0)


def test_chunk_with_overlap_hand_worked(spark):
    """10 tokens, chunk 4, stride 3 -> starts 0,3,6 (the window at 9 would
    contain only tokens already covered by the window at 6, so it is NOT
    emitted); every token covered; overlap regions repeat across windows."""
    from sissaschool_xmlschema_spark.operators.packing import chunk_with_overlap

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_with_overlap(df, "doc_id", "text", chunk_tokens=4, stride=3)
        .collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.start_token, r.n_chunk_tokens) for r in rows] == [
        (0, 4), (3, 4), (6, 4),
    ]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"   # overlap token t3
    assert rows[2].chunk_text == "t6 t7 t8 t9"   # tail covered, no extra window
    # every token appears in at least one chunk
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_with_overlap_edges(spark):
    import pytest as _pytest

    from sissaschool_xmlschema_spark.operators.packing import chunk_with_overlap

    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = chunk_with_overlap(df, "doc_id", "text", chunk_tokens=8, stride=8)
    got = {r.doc_id: (r.n_chunk_tokens, r.chunk_text) for r in out.collect()}
    assert got[1] == (2, "a b")
    assert 2 not in got            # NULL text -> no rows
    assert got[3] == (1, "")       # empty text -> one empty-token chunk
    with _pytest.raises(ValueError):
        chunk_with_overlap(df, "doc_id", "text", chunk_tokens=4, stride=5)

    # regression: n=100, chunk=64, stride=48 — the window at 96 would hold
    # only tokens already covered by the window at 48; exactly two windows
    df2 = spark.createDataFrame(
        [(9, " ".join(f"w{i}" for i in range(100)))], "doc_id long, text string"
    )
    starts = sorted(
        r.start_token
        for r in chunk_with_overlap(
            df2, "doc_id", "text", chunk_tokens=64, stride=48
        ).collect()
    )
    assert starts == [0, 48]
