"""Semantic tests: temporal joins, vector functions, and the stateful
streaming sessionizer (applyInPandasWithState)."""

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(s), u, t, v, "{}") for (i, s, u, t, v) in rows],
        EV_SCHEMA,
    )


def test_asof_join_semantics(spark):
    from rdf_canonize_spark.operators.temporal import asof_last_order

    events = _events(
        spark,
        [
            (1, 10, 1, "click", 1.0),
            (2, 20, 1, "view", 1.0),
            (3, 5, 2, "click", 1.0),
        ],
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "O", 100.0, _ts(10), "1-URGENT"),
            (101, 1, "O", 200.0, _ts(15), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    got = {
        r["event_id"]: (r["last_order_date"], r["last_order_price"])
        for r in asof_last_order(events, orders).collect()
    }
    # inclusive at equal timestamps; most-recent-at-or-before wins
    assert got[1] == (_ts(10), 100.0)
    assert got[2] == (_ts(15), 200.0)
    # no order for user 2 -> nulls survive the left join
    assert got[3] == (None, None)


def test_asof_join_null_payload_not_torn(spark):
    """A legitimately-NULL payload value in the matching right row must
    NOT be replaced by a stale value from an older right row: the
    payload is carried as one struct, so the whole matching row wins
    (matches DuckDB ASOF semantics)."""
    from rdf_canonize_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, 20), (2, 1, 5)], "eid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 1, "old", 7.0), (1, 10, None, 9.0)],
        "k int, rts int, tag string, amt double",
    )
    got = {
        r["eid"]: (r["tag"], r["amt"])
        for r in asof_join(
            left, right, "k", "k", "ts", "rts", ["tag", "amt"]
        ).collect()
    }
    # eid=1 matches the rts=10 row whose tag IS NULL -- must stay NULL
    assert got[1] == (None, 9.0)
    assert got[2] == ("old", 7.0)


def test_salted_join_rejects_right_full(spark):
    import pytest

    from rdf_canonize_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, "a")], "row_id int, key string")
    dim = spark.createDataFrame([("a", "v")], "key string, val string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, "key", n_salts=4, how=how)


def test_connected_components_raises_when_unconverged(spark):
    import pytest

    from rdf_canonize_spark.operators.graph import connected_components

    # a 12-node chain needs ~11 rounds under hash-min; max_iter=2
    # cannot converge and must raise instead of silently returning
    # split components (same contract for the star variant at
    # max_iter=1)
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)],
        "src string, dst string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2, algorithm="hashmin")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1, algorithm="star")
    # and with enough rounds the same graph converges to one component
    labels = {
        r["node"]: r["component"]
        for r in connected_components(
            chain, max_iter=15, algorithm="hashmin"
        ).collect()
    }
    assert set(labels.values()) == {"n00"}


def test_connected_components_star_high_diameter(spark):
    """Planted high-diameter graph (the 100 TB mandate includes
    power-law web graphs with long chains): a 200-node path needs
    ~200 rounds under diameter-bound hash-min -- beyond the default
    budget -- while the default two-phase star contraction converges
    within it (O(log^2 n) rounds) and labels every node with the
    component minimum."""
    import pytest

    from rdf_canonize_spark.operators.graph import connected_components

    n = 200
    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n - 1)],
        "src string, dst string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, algorithm="hashmin")
    labels = {
        r["node"]: r["component"]
        for r in connected_components(chain).collect()
    }
    assert len(labels) == n
    assert set(labels.values()) == {"n000"}


def test_connected_components_star_equals_hashmin(spark):
    """The two algorithms are exchangeable: identical (node,
    component) output on a seeded random graph with several
    components, an isolated self-loop node, and duplicate/reversed
    edges."""
    import random

    from rdf_canonize_spark.operators.graph import connected_components

    rng = random.Random(20260817)
    edges = [("iso", "iso")]
    for comp in range(5):
        members = [f"c{comp}_{i:02d}" for i in range(rng.randint(2, 12))]
        for m in members[1:]:
            other = rng.choice(members)
            edges.append((m, other) if rng.random() < 0.5 else (other, m))
    edges += [(b, a) for a, b in rng.sample(edges, 5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    star = {
        (r["node"], r["component"])
        for r in connected_components(df, algorithm="star").collect()
    }
    hm = {
        (r["node"], r["component"])
        for r in connected_components(df, algorithm="hashmin").collect()
    }
    assert star == hm
    assert ("iso", "iso") in star


def test_close_event_pairs_exact_and_duplicate_free(spark):
    from rdf_canonize_spark.operators.temporal import close_event_pairs

    # 30->70 crosses a 60 s bucket boundary (bucket 0 vs 1): exercises
    # the offset explode; 0->70 is out of band.
    events = _events(
        spark,
        [
            (1, 0, 1, "click", 1.0),
            (2, 30, 1, "click", 1.0),
            (3, 70, 1, "click", 1.0),
            (4, 200, 1, "click", 1.0),
            (5, 10, 2, "click", 1.0),
        ],
    )
    rows = close_event_pairs(events, window_seconds=60).collect()
    got = {(r["event_a"], r["event_b"]): r["dt_seconds"] for r in rows}
    assert got == {(1, 2): 30, (2, 3): 40}
    assert len(rows) == len(got), "bucket join produced duplicates"


def test_vector_functions(spark):
    from rdf_canonize_spark.functions import vectors

    df = spark.createDataFrame(
        [(1, [3.0, 4.0], 0), (2, [0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    norms = {
        r["vec_id"]: (r["dim"], r["l2_norm"])
        for r in vectors.embedding_norms(df).collect()
    }
    assert norms == {1: (2, 5.0), 2: (2, 0.0)}
    pair = df.select(
        vectors.cosine(
            vectors.as_double(F.array(F.lit(1.0), F.lit(0.0))),
            vectors.as_double(F.array(F.lit(0.0), F.lit(1.0))),
        ).alias("c")
    ).first()
    assert pair["c"] == 0.0
    zero = df.filter("vec_id = 2").select(
        vectors.cosine(
            vectors.as_double("embedding"), vectors.as_double("embedding")
        ).alias("c")
    ).first()
    assert zero["c"] is None  # null-safe zero-vector guard


def test_streaming_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: in-batch gap closes a
    session immediately; watermark passage times out idle sessions."""
    from rdf_canonize_spark.streaming.ingest import start_session_stream

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    gap, wm = 600, "10 minutes"

    # batch 1: user 1 has two events then a >gap jump (closes in-batch);
    # user 2 one event (stays open)
    _events(
        spark,
        [
            (1, 0, 1, "click", 1.0),
            (2, 60, 1, "view", 2.0),
            (3, 1200, 1, "click", 4.0),
            (4, 30, 2, "view", 8.0),
        ],
    ).coalesce(1).write.parquet(in_dir)
    q = start_session_stream(spark, in_dir, out_dir,
                             gap_seconds=gap, watermark=wm)
    q.awaitTermination(timeout=300)
    rows = spark.read.parquet(f"{out_dir}/sessions").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["n_events"], r["session_value"]) == (1, 2, 3.0)
    assert r["session_start"] == _ts(0) and r["session_end"] == _ts(60)

    # batch 2 advances max event time to t0+4000 (watermark t0+3400
    # after it); batch 3 triggers timeout evaluation at that watermark.
    _events(spark, [(5, 4000, 3, "click", 1.0)]).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    q2 = start_session_stream(spark, in_dir, out_dir,
                              gap_seconds=gap, watermark=wm)
    q2.awaitTermination(timeout=300)
    _events(spark, [(6, 4100, 3, "click", 1.0)]).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    q3 = start_session_stream(spark, in_dir, out_dir,
                              gap_seconds=gap, watermark=wm)
    q3.awaitTermination(timeout=300)

    rows = spark.read.parquet(f"{out_dir}/sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: the gap session plus the timed-out tail session
    assert sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in by_user[1]
    ) == [(_ts(0), _ts(60), 2), (_ts(1200), _ts(1200), 1)]
    # user 2: timed out
    assert [(r["session_start"], r["n_events"]) for r in by_user[2]] == [
        (_ts(30), 1)
    ]
    # user 3: still open (events 4000/4100 within gap of each other)
    assert 3 not in by_user


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Re-delivered events are dropped within the watermark delay."""
    from rdf_canonize_spark.streaming.ingest import start_dedup_stream

    in_dir = str(tmp_path / "dedup_in")
    out_dir = str(tmp_path / "dedup_out")
    _events(
        spark,
        [(1, 0, 1, "click", 1.0), (2, 30, 1, "view", 2.0),
         (1, 0, 1, "click", 1.0)],  # duplicate delivery of event 1
    ).coalesce(1).write.parquet(in_dir)
    q = start_dedup_stream(spark, in_dir, out_dir, watermark="10 minutes")
    q.awaitTermination(timeout=300)
    got = spark.read.parquet(f"{out_dir}/deduped")
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2]

    # a second batch re-delivering event 2 (still within watermark)
    # plus a fresh event: only the fresh one lands
    _events(
        spark, [(2, 30, 1, "view", 2.0), (3, 60, 1, "click", 3.0)]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = start_dedup_stream(spark, in_dir, out_dir,
                            watermark="10 minutes")
    q2.awaitTermination(timeout=300)
    got = spark.read.parquet(f"{out_dir}/deduped")
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3]


def test_asof_join_randomized_vs_bruteforce(spark):
    """Randomized as-of: 400 events x 120 orders across 25 users must
    match a per-event brute-force scan (greatest order date <= event
    ts, max price at that date)."""
    import random

    from rdf_canonize_spark.operators.temporal import asof_last_order

    rng = random.Random(77)
    events = [(i, rng.randrange(0, 5000), rng.randrange(1, 26),
               "click", 1.0) for i in range(400)]
    orders = [(1000 + i, rng.randrange(1, 26), "O",
               float(rng.randrange(1, 500)),
               _ts(rng.randrange(0, 5000)), "P") for i in range(120)]
    ev_df = _events(spark, events)
    ord_df = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    got = {
        r["event_id"]: (r["last_order_date"], r["last_order_price"])
        for r in asof_last_order(ev_df, ord_df).collect()
    }
    for (eid, esec, euser, _, _v) in events:
        ets = _ts(esec)
        cands = [(ts, price) for (_, u, _, price, ts, _) in orders
                 if u == euser and ts <= ets]
        if not cands:
            want = (None, None)
        else:
            best_date = max(ts for ts, _ in cands)
            want = (best_date,
                    max(p for ts, p in cands if ts == best_date))
        assert got[eid] == want, (eid, got[eid], want)


def test_streaming_url_dedup_canonical_variants(spark, tmp_path):
    """Streaming canonical-URL ingest dedup: cosmetic URL variants of
    the same page (scheme case, www., :80, tracking params, query
    order, fragment) collapse to one surviving row per canonical
    form within the watermark; a genuinely different path survives."""
    import datetime as dt

    from rdf_canonize_spark.streaming.ingest import start_url_dedup_stream

    in_dir = str(tmp_path / "url_in")
    out_dir = str(tmp_path / "url_out")
    t0 = dt.datetime(2026, 8, 17, 12, 0, 0)

    def page(url, sec):
        return (url, t0 + dt.timedelta(seconds=sec), None,
                "body text", "en")

    rows = [
        page("http://WWW.site.example.com:80/a?utm_source=x&page=1", 0),
        page("https://site.example.com/a?page=1#frag", 10),  # same canon
        page("HTTPS://site.example.com/a/?page=1", 20),      # same canon
        page("https://site.example.com/b?page=1", 30),       # different
    ]
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.parquet(in_dir)
    q = start_url_dedup_stream(spark, in_dir, out_dir,
                               watermark="10 minutes")
    q.awaitTermination(timeout=300)
    got = spark.read.parquet(f"{out_dir}/url_deduped")
    canon = sorted(r["canonical_url"] for r in got.collect())
    assert canon == [
        "com,example,site)/a?page=1",
        "com,example,site)/b?page=1",
    ]
