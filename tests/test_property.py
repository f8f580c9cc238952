"""Property-based differential testing: Hypothesis generates random query
specs (dims × measures × filters), and every generated query must match
the DuckDB oracle on the same data.  This is the coverage style the
reference lacked entirely (SURVEY.md §5: "No property-based testing")."""

import duckdb
import pytest

# property/differential sweeps (many randomized Spark jobs per test) — full-suite lane only (see conftest fast lane)
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquery_spark import aggregate_pq
from tests.conftest import assert_matches_duckdb

DIMS = ["f0", "f1", "f2", "f6"]
MEASURES = ["f3", "f4", "f5"]
# ops whose oracle translation is unambiguous (float-rounding-free check:
# the comparison helper uses approx for floats anyway)
OPS = {
    "sum": "SUM({c})",
    "mean": "AVG({c})",
    "count": "COUNT({c})",
    "count_distinct": "COUNT(DISTINCT {c})",
    "min": "MIN({c})",
    "max": "MAX({c})",
    "one": "MIN({c})",
}
FILTER_OPS = {
    ">": "{c} > {v}",
    ">=": "{c} >= {v}",
    "<": "{c} < {v}",
    "<=": "{c} <= {v}",
    "==": "{c} = {v}",
    "!=": "{c} != {v}",
}


@st.composite
def query_spec(draw):
    dims = draw(st.lists(st.sampled_from(DIMS), max_size=3, unique=True))
    n_measures = draw(st.integers(1, 3))
    measures = []
    for i in range(n_measures):
        col = draw(st.sampled_from(MEASURES))
        op = draw(st.sampled_from(sorted(OPS)))
        measures.append([col, op, f"out_{i}"])
    filters = []
    for _ in range(draw(st.integers(0, 2))):
        fcol = draw(st.sampled_from(["f1", "f2", "f5"]))
        fop = draw(st.sampled_from(sorted(FILTER_OPS)))
        fval = draw(st.integers(0, 10)) if fcol != "f5" else draw(
            st.integers(20240101, 20241231)
        )
        filters.append([fcol, fop, fval])
    return dims, measures, filters


@pytest.fixture(scope="module")
def syn_con(synthetic_pq):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{synthetic_pq}')")
    return con


class TestAggregationProperties:
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(spec=query_spec())
    def test_random_query_matches_oracle(self, synthetic_pq, syn_con, spec):
        dims, measures, filters = spec
        result = aggregate_pq(synthetic_pq, dims, measures, filters or None)

        select_parts = list(dims) + [
            OPS[op].format(c=col) + f" AS {out}" for col, op, out in measures
        ]
        sql = f"SELECT {', '.join(select_parts)} FROM t"
        if filters:
            sql += " WHERE " + " AND ".join(
                FILTER_OPS[op].format(c=c, v=v) for c, op, v in filters
            )
        if dims:
            sql += " GROUP BY " + ", ".join(dims)
        # duplicate output names across measures are possible only if the
        # spec generator produced them; out_{i} names are unique
        assert_matches_duckdb(result, syn_con, sql)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(st.integers(-5, 15), min_size=1, max_size=8, unique=True)
    )
    def test_in_filter_matches_oracle(self, synthetic_pq, syn_con, vals):
        result = aggregate_pq(
            synthetic_pq, ["f0"], [["f4", "sum", "s"]], [["f1", "in", vals]]
        )
        sql = (
            "SELECT f0, SUM(f4) AS s FROM t WHERE f1 IN "
            f"({', '.join(map(str, vals))}) GROUP BY f0"
        )
        assert_matches_duckdb(result, syn_con, sql)


class TestGraphProperties:
    """connected_components vs a driver-side union-find reference on
    random edge lists — the distributed label propagation must agree with
    the textbook algorithm on every graph Hypothesis can draw."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1, max_size=40,
        )
    )
    def test_matches_union_find(self, spark, edges):
        from parquery_spark.operators.graph import connected_components

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in parent}

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["v"]: r["cluster_id"]
            for r in connected_components(pairs).collect()
        }
        assert got == want


class TestPackingProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(0, 50), min_size=1, max_size=60),
        shard=st.integers(1, 100),
        parts=st.integers(1, 5),
    )
    def test_matches_sequential_cumsum(self, spark, sizes, shard, parts):
        from parquery_spark.operators.packing import pack_shards

        rows = [(i, s) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(rows, ["k", "n"])
        got = {
            r["k"]: r["shard_id"]
            for r in pack_shards(df, "n", shard, "k",
                                 num_partitions=parts).collect()
        }
        before = 0
        want = {}
        for i, s in enumerate(sizes):
            want[i] = before // shard
            before += s
        assert got == want


class TestPrefixSumProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(0, 100), min_size=1, max_size=50),
        parts=st.integers(1, 6),
        inclusive=st.booleans(),
    )
    def test_matches_sequential(self, spark, sizes, parts, inclusive):
        from parquery_spark.operators.packing import prefix_sum

        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sizes)], ["k", "v"]
        )
        got = {
            r["k"]: r["p"]
            for r in prefix_sum(
                df, "v", "k", "p", num_partitions=parts, inclusive=inclusive
            ).collect()
        }
        acc, want = 0, {}
        for i, s in enumerate(sizes):
            want[i] = acc + (s if inclusive else 0)
            acc += s
        assert got == want


class TestUpsertProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        cur=st.dictionaries(st.integers(0, 20), st.integers(0, 5),
                            max_size=15),
        batch=st.dictionaries(st.integers(0, 20), st.integers(6, 9),
                              max_size=10),
    )
    def test_matches_dict_update(self, spark, cur, batch):
        from parquery_spark.operators.upsert import upsert

        cur_df = spark.createDataFrame(
            [(k, v) for k, v in cur.items()], "k long, v long"
        )
        batch_df = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "k long, v long"
        )
        got = {r["k"]: r["v"]
               for r in upsert(cur_df, batch_df, ["k"]).collect()}
        want = dict(cur)
        want.update(batch)
        assert got == want


class TestSessionProperties:
    """session_window vs a driver-side sequential sessionizer on random
    event streams — the native operator and the textbook gap rule must
    agree on every stream Hypothesis can draw (gap boundary excluded:
    generated timestamps are whole seconds, the gap is 100.5 s)."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2000)),
            min_size=1, max_size=60, unique=True,
        )
    )
    def test_session_window_matches_gap_rule(self, spark, events):
        import datetime as dt

        from pyspark.sql import functions as F

        gap_s = 100.5
        base = dt.datetime(2024, 1, 1)
        rows = [
            (u, base + dt.timedelta(seconds=s)) for u, s in events
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r["user_id"], r["session_start"], r["n"])
            for r in df.groupBy(
                "user_id", F.session_window("ts", f"{gap_s} seconds")
            )
            .agg(F.min("ts").alias("session_start"),
                 F.count(F.lit(1)).alias("n"))
            .select("user_id", "session_start", "n")
            .collect()
        }

        want = set()
        by_user: dict[int, list] = {}
        for u, s in sorted(events):
            by_user.setdefault(u, []).append(s)
        for u, times in by_user.items():
            start, n, prev = times[0], 0, None
            for s in times:
                if prev is not None and s - prev >= gap_s:
                    want.add((u, base + dt.timedelta(seconds=start), n))
                    start, n = s, 0
                n += 1
                prev = s
            want.add((u, base + dt.timedelta(seconds=start), n))
        assert got == want


class TestScd2Properties:
    """SCD2 intervals must PARTITION each user's timeline: ordered,
    non-overlapping, gap-free, exactly one open (is_current) interval,
    and re-applying the runs rule sequentially gives identical
    intervals."""

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),      # user
                st.integers(0, 10_000),  # seconds offset (unique per draw)
                st.integers(0, 2),      # state id
            ),
            min_size=1, max_size=80,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    def test_intervals_partition_timeline(self, spark, events):
        import datetime

        from parquery_spark.queries import QUERIES

        rows = [
            (
                i,
                datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=sec),
                u,
                f"s{state}",
                0.0,
                "",
            )
            for i, (u, sec, state) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        # reuse the query body via a monkeypatched loader-free path:
        # replicate q104's plan inline on this frame
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev = F.lag("event_type").over(w)
        chg = F.when(
            prev.isNull() | (prev != F.col("event_type")), F.lit(1)
        ).otherwise(F.lit(0))
        runs = (
            df.select("user_id", "event_type", "ts", "event_id")
            .withColumn("__chg", chg)
            .withColumn(
                "run",
                F.sum("__chg").over(
                    w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
                ),
            )
        )
        iv = runs.groupBy("user_id", "run").agg(
            F.min("event_type").alias("event_type"),
            F.unix_micros(F.min("ts")).alias("valid_from_us"),
        )
        w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
        valid_to = F.lead("valid_from_us").over(w2)
        got = iv.select(
            "user_id", "event_type", "valid_from_us",
            valid_to.alias("valid_to_us"),
        ).collect()

        # sequential reference
        by_user = {}
        for i, (u, sec, state) in sorted(
            enumerate(events), key=lambda t: (t[1][1], t[0])
        ):
            by_user.setdefault(u, []).append((sec, f"s{state}"))
        want = {}
        for u, seq in by_user.items():
            ivs = []
            for sec, stt in seq:
                if not ivs or ivs[-1][0] != stt:
                    ivs.append((stt, sec))
            want[u] = ivs

        for u, ivs in want.items():
            mine = sorted(
                [r for r in got if r.user_id == u],
                key=lambda r: r.valid_from_us,
            )
            assert len(mine) == len(ivs)
            base = 1704067200_000000  # 2024-01-01 UTC epoch-us
            for r, (stt, sec) in zip(mine, ivs):
                assert r.event_type == stt
                assert r.valid_from_us == base + sec * 1_000_000
            # partition property: each valid_to == next valid_from,
            # exactly one open interval (the last)
            for r, nxt in zip(mine, mine[1:]):
                assert r.valid_to_us == nxt.valid_from_us
            assert mine[-1].valid_to_us is None


class TestPageRankProperties:
    def test_mass_conserved_and_positive(self, spark, sf_dir):
        """PageRank over the co-purchase graph: Σpr == 1 (damping mass
        balance on a graph with no dangling nodes) and every score ≥
        (1-d)/N."""
        from parquery_spark.queries import QUERIES

        rows = QUERIES["q132_pagerank"][0](spark, sf_dir).collect()
        total = sum(r.pr for r in rows)
        assert abs(total - 1.0) < 1e-3  # rounding at 9 digits × |V|
        assert all(r.pr > 0 for r in rows)
        floor = 0.15 / len(rows)
        assert all(r.pr >= floor * 0.999 for r in rows)


class TestAttributionProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 2),        # user
                st.integers(0, 20_000),   # seconds
                st.integers(0, 3),        # type id (0=click, 1=purchase)
            ),
            min_size=1, max_size=60,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    def test_matches_bruteforce(self, spark, events):
        """Carry-forward attribution == brute-force 'latest click ≤ ts
        within window' per purchase."""
        import datetime

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        types = ["click", "purchase", "view", "error"]
        window_s = 5_000
        rows = [
            (
                i,
                datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=sec),
                u,
                types[t],
            )
            for i, (u, sec, t) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
            " event_type string"
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        lc = F.last(
            F.when(
                F.col("event_type") == "click",
                F.struct(F.col("ts").alias("ts"),
                         F.col("event_id").alias("id")),
            ),
            ignorenulls=True,
        ).over(w)
        got = {
            r.purchase_id: r.click_id
            for r in df.select(
                "user_id", "event_id", "event_type", "ts", lc.alias("lc")
            )
            .where(
                (F.col("event_type") == "purchase")
                & F.col("lc").isNotNull()
                & (
                    F.unix_micros("ts") - F.unix_micros("lc.ts")
                    <= window_s * 1_000_000
                )
            )
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("lc.id").alias("click_id"),
            )
            .collect()
        }

        want = {}
        for i, (u, sec, t) in enumerate(events):
            if types[t] != "purchase":
                continue
            clicks = [
                (s2, j)
                for j, (u2, s2, t2) in enumerate(events)
                if u2 == u and types[t2] == "click"
                and (s2, j) <= (sec, i) and sec - s2 <= window_s
            ]
            if clicks:
                want[i] = max(clicks)[1]
        assert got == want


class TestTriangleProperty:
    def test_matches_brute_force_on_random_graphs(self, spark):
        import itertools
        import random

        from parquery_spark.operators.graph import triangle_stats

        rng = random.Random(11)
        for trial in range(3):
            n = rng.randint(6, 14)
            edges = sorted(
                {
                    (min(a, b), max(a, b))
                    for a, b in (
                        (rng.randrange(n), rng.randrange(n))
                        for _ in range(rng.randint(5, 40))
                    )
                    if a != b
                }
            )
            adj = {i: set() for i in range(n)}
            for u, v in edges:
                adj[u].add(v)
                adj[v].add(u)
            brute_tri = sum(
                1
                for a, b, c in itertools.combinations(range(n), 3)
                if b in adj[a] and c in adj[a] and c in adj[b]
            )
            brute_wedges = sum(
                len(adj[i]) * (len(adj[i]) - 1) // 2 for i in range(n)
            )
            df = spark.createDataFrame(edges, "u long, v long")
            row = triangle_stats(df).collect()[0]
            assert row["n_edges"] == len(edges), (trial, edges)
            assert row["n_triangles"] == brute_tri, (trial, edges)
            assert row["n_wedges"] == brute_wedges, (trial, edges)


class TestWeightedMedianProperty:
    def test_matches_sequential_definition(self, spark):
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rng = random.Random(23)
        rows = [
            (rng.choice("AB"), float(rng.randint(1, 100)),
             float(rng.randint(1, 9)))
            for _ in range(300)
        ]

        def reference(grp):
            vals = sorted(
                (v, w) for g, v, w in rows if g == grp
            )
            tot = sum(w for _, w in vals)
            cum = 0.0
            for v, w in vals:
                cum += w
                if cum >= tot / 2:
                    return v
            raise AssertionError

        df = spark.createDataFrame(rows, "g string, v double, w double")
        wc = (
            Window.partitionBy("g")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("g")
        got = {
            r["g"]: r["wm"]
            for r in df.select(
                "g",
                "v",
                F.sum("w").over(wc).alias("cw"),
                F.sum("w").over(wt).alias("tw"),
            )
            .where(F.col("cw") >= F.col("tw") / 2)
            .groupBy("g")
            .agg(F.min("v").alias("wm"))
            .collect()
        }
        assert got == {"A": reference("A"), "B": reference("B")}


class TestResampleProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        obs=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(0, 40),  # day offset
                st.integers(-5, 5),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_sequential_densify_ffill(self, spark, obs):
        """resample_daily == the obvious per-key python densify: one row
        per day of the key's span, counts zero-filled, sums carried
        forward from the latest present day."""
        import datetime

        from pyspark.sql import functions as F

        from parquery_spark.operators.timeseries import resample_daily

        base = datetime.date(2024, 3, 1)
        rows = [
            (k, base + datetime.timedelta(days=d), v) for k, d, v in obs
        ]
        df = spark.createDataFrame(rows, "k string, d date, v long")
        got = {
            (r["k"], r["day"]): (r["n"], r["s"])
            for r in resample_daily(
                df, keys=["k"], day_col="d",
                aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
                zero_fill=["n"], ffill=["s"],
            ).collect()
        }
        # python reference
        want = {}
        per_key = {}
        for k, day, v in rows:
            per_key.setdefault(k, {}).setdefault(day, []).append(v)
        for k, days in per_key.items():
            d0, d1 = min(days), max(days)
            last = None
            d = d0
            while d <= d1:
                if d in days:
                    last = sum(days[d])
                    want[(k, d)] = (len(days[d]), last)
                else:
                    want[(k, d)] = (0, last)
                d += datetime.timedelta(days=1)
        assert got == want


class TestSlidingChunkProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["x", "yy", "z0"]), max_size=20),
            min_size=1,
            max_size=10,
        ),
        size=st.integers(1, 8),
        stride=st.integers(1, 8),
    )
    def test_matches_sequential_windows(self, spark, docs, size, stride):
        import hashlib

        from parquery_spark.operators.packing import sliding_chunks

        df = spark.createDataFrame(
            [(i, toks) for i, toks in enumerate(docs)],
            "doc_id long, w array<string>",
        )
        got = {
            (r["doc_id"], r["chunk_idx"]): (
                r["start_tok"], r["chunk_len"], r["chunk_fp"]
            )
            for r in sliding_chunks(
                df, "doc_id", "w", size=size, stride=stride
            ).collect()
        }
        want = {}
        for i, toks in enumerate(docs):
            for ci, start in enumerate(range(0, len(toks), stride)):
                chunk = toks[start:start + size]
                want[(i, ci)] = (
                    start,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )
        assert got == want


class TestFoldKernelProperties:
    """The shared bit-stable fold kernel (similarity.fold_sum): pinned
    CAST-to-DOUBLE + left-to-right accumulation must be BIT-identical to
    DuckDB's list_sum / list_dot_product — the invariant every
    distance/score oracle hash depends on (retired NOTES.md hazard)."""

    @staticmethod
    def _bits(x):
        import struct

        return struct.pack("<d", float(x))

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ),
            min_size=1,
            max_size=64,
        )
    )
    def test_fold_sum_bit_equals_duckdb_list_sum(self, spark, vals):
        from pyspark.sql import functions as F

        from parquery_spark.operators.similarity import fold_sum, fold_sum_pairs

        df = spark.createDataFrame([(vals,)], "a array<double>")
        got_sum, got_dot = df.select(
            fold_sum(F.col("a")).alias("s"),
            fold_sum_pairs(F.col("a"), F.col("a"), lambda x, y: x * y).alias("d"),
        ).first()

        con = duckdb.connect()
        want_sum, want_dot = con.execute(
            "SELECT list_sum(a), list_dot_product(a, a) FROM "
            "(SELECT CAST(? AS DOUBLE[]) AS a)",
            [vals],
        ).fetchone()
        con.close()
        assert self._bits(got_sum) == self._bits(want_sum)
        assert self._bits(got_dot) == self._bits(want_dot)

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_fold_kernel_bit_stable_on_testdata(self, spark, sf):
        """Every embedding row at every SF: Spark fold-norm² and
        fold-dot(first-row) bit-equal DuckDB's list fold — real float32
        data widened to double, the exact shape q211/q218/q220 score."""
        import os

        from pyspark.sql import functions as F

        from parquery_spark.operators.similarity import dot, fold_sum

        path = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(path):
            pytest.skip(f"no {sf} testdata")
        emb = spark.read.parquet(path)
        q = [
            float(x)
            for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
        ]
        lit_q = F.array(*[F.lit(v) for v in q])
        got = {
            r["vec_id"]: (self._bits(r["n2"]), self._bits(r["dq"]))
            for r in emb.select(
                "vec_id",
                fold_sum(F.col("embedding"), lambda v: v * v).alias("n2"),
                dot(F.col("embedding").cast("array<double>"), lit_q).alias("dq"),
            ).collect()
        }
        con = duckdb.connect()
        want = {
            vid: (self._bits(n2), self._bits(dq))
            for vid, n2, dq in con.execute(
                f"""
                SELECT vec_id,
                       list_sum(list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                       list_dot_product(
                           list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           CAST(? AS DOUBLE[]))
                FROM '{path}'
                """,
                [q],
            ).fetchall()
        }
        con.close()
        assert got == want

    def test_no_handrolled_float_folds_outside_kernel(self):
        """Grep guard: every F.aggregate fold in the package outside the
        kernel module must be a NON-float-sum fold (integer vote, string
        merge, max).  A new float-sum fold belongs in
        similarity.fold_sum — hand-rolling one re-opens the cross-engine
        summation-order hazard this kernel retired."""
        import pathlib
        import re

        pkg = pathlib.Path(__file__).resolve().parents[1] / "parquery_spark"
        offenders = []
        for py in pkg.rglob("*.py"):
            if py.name == "similarity.py":  # the kernel lives here
                continue
            text = py.read_text()
            for m in re.finditer(r"F\.aggregate\(", text):
                # a float-sum fold carries the DOUBLE 0.0 accumulator
                window = text[m.start(): m.start() + 400]
                if re.search(r"F\.lit\(0\.0\)", window):
                    offenders.append(f"{py.relative_to(pkg)}:{m.start()}")
            # expr-string folds: aggregate(..., 0.0, ...) inside SQL text
            for m in re.finditer(r"F\.expr\([^)]*aggregate\(", text):
                window = text[m.start(): m.start() + 400]
                if re.search(r"\b0\.0\b", window):
                    offenders.append(f"{py.relative_to(pkg)}:{m.start()}")
        assert offenders == [], (
            "float-sum folds outside similarity.fold_sum (route them "
            f"through the kernel): {offenders}"
        )

    def test_no_raw_multi_alias_idiom_outside_reuse(self):
        """Grep guard: multi-alias references to ONE relation (the
        ReuseExchange sharing idiom) must route through
        ``operators/reuse.py`` (``self_join_reusing`` / ``aliased_refs``).
        A hand-rolled ``rel.alias(a).join(rel.alias(b))`` — or worse,
        per-side pre-renamed ``select()`` copies — is exactly the shape
        that silently regresses to recompute-per-side or to a leaked
        persist when someone 'fixes' the recompute (the round-7/8 cache
        leak class)."""
        import pathlib
        import re

        pkg = pathlib.Path(__file__).resolve().parents[1] / "parquery_spark"
        pats = [
            # a, b = rel.alias(...), rel.alias(...)
            re.compile(r"=\s*(?<![\w.])(\w+)\.alias\([^)]*\)\s*,\s*\1\.alias\("),
            # rel.alias(...).join(rel.alias(...)
            re.compile(
                r"(?<![\w.])(\w+)\.alias\([^)]*\)\s*\.join\(\s*\1\.alias\("
            ),
        ]
        offenders = []
        for py in pkg.rglob("*.py"):
            if py.name == "reuse.py":
                continue
            text = py.read_text()
            for pat in pats:
                for m in pat.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    offenders.append(f"{py.relative_to(pkg)}:{line}")
        assert offenders == [], (
            "raw multi-alias self-reference outside operators/reuse.py "
            f"(route through self_join_reusing/aliased_refs): {offenders}"
        )


def _brute_spans(docs: dict[int, list[str]], L: int) -> set[tuple]:
    """Independent reference for substring_spans: for every doc pair,
    walk every diagonal and emit each maximal run of >= L equal tokens.
    O(n^2) per pair — fine at property-test sizes, and shares NO code or
    plan shape with the SQL islands construction it checks."""
    out = set()
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = docs[ids[ai]], docs[ids[bi]]
            for diag in range(-(len(b) - 1), len(a)):
                i = max(0, diag)
                j = i - diag
                run = 0
                while i <= len(a) and j <= len(b):
                    if i < len(a) and j < len(b) and a[i] == b[j]:
                        run += 1
                    else:
                        if run >= L:
                            out.add((
                                ids[ai], ids[bi],
                                i - run + 1, j - run + 1, run,
                            ))
                        run = 0
                    i += 1
                    j += 1
    return out


class TestSubstringSpanProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def test_spans_match_bruteforce(self, spark, data):
        from parquery_spark.operators.dedup import substring_spans

        L = 3
        # tiny vocabulary forces shared runs; short docs keep the
        # quadratic reference fast
        word = st.sampled_from(["a", "b", "c"])
        n_docs = data.draw(st.integers(2, 4))
        docs = {
            i + 1: data.draw(st.lists(word, min_size=0, max_size=12))
            for i in range(n_docs)
        }
        # max_gram_occ high enough that the cap never fires — the brute
        # force has no cap, so this isolates the span-merge logic
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in docs.items()],
            "doc_id long, text string",
        )
        got = {
            (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
            for r in substring_spans(
                df, min_tokens=L, max_gram_occ=10_000
            ).collect()
        }
        assert got == _brute_spans(docs, L)
