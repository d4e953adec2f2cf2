"""Sketches (KMV / HLL / count-min) and connected-components clustering."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.clustering import (
    connected_components,
    resolve_dup_clusters,
)
from ig_etl_sync_spark.operators.sketches import (
    cms_lookup,
    cms_sketch,
    hll_distinct,
    hll_registers,
    kmv_distinct,
)


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# -- KMV --------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], ["v"])
    [row] = kmv_distinct(df, "v", k=64).collect()
    assert row.kmv_est == 10.0


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], ["v"])
    [row] = kmv_distinct(df, "v", k=256).collect()
    assert abs(row.kmv_est - n) / n < 0.15  # ~1/sqrt(k) ≈ 6% expected


def test_kmv_grouped_matches_python(spark):
    rows = [(g, f"{g}:{i}") for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r.kmv_est for r in kmv_distinct(df, "v", k=16, group_cols=["g"]).collect()}
    for g in ("a", "b"):
        hs = sorted(_md5_int(f"{g}:{i}") for i in range(200))
        expect = round(15 * float(1 << 32) / hs[15], 4)
        assert got[g] == pytest.approx(expect, abs=1e-4)


# -- HLL --------------------------------------------------------------

def test_hll_registers_match_python(spark):
    vals = [f"x{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    regs = {(r._b, r._m) for r in hll_registers(df, "v", m=64).collect()}
    expect: dict[int, int] = {}
    for v in vals:
        h = _md5_int(v)
        b, r = h % 64, h >> 6
        rank = 27 if r == 0 else (r & -r).bit_length()
        expect[b] = max(expect.get(b, 0), rank)
    assert regs == set(expect.items())


def test_hll_estimate_accuracy(spark):
    n = 3000
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], ["v"])
    [row] = hll_distinct(df, "v", m=64).collect()
    assert abs(row.hll_est - n) / n < 0.35  # raw (uncorrected), m=64 → ~13% rse
    assert row.hll_buckets == 64


def test_hll_small_range_correction(spark):
    """Linear counting kicks in below 2.5·m and beats the raw estimator
    by an order of magnitude at tiny cardinalities; the LC value itself
    matches the plan-time m·ln(m/V) table exactly."""
    import math

    n = 15
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], ["v"])
    [raw] = hll_distinct(df, "v", m=64).collect()
    [cor] = hll_distinct(df, "v", m=64, corrected=True).collect()
    assert abs(cor.hll_est - n) < abs(raw.hll_est - n)
    assert abs(cor.hll_est - n) / n < 0.35
    v_empty = 64 - cor.hll_buckets
    assert v_empty > 0
    assert cor.hll_est == round(64 * math.log(64 / v_empty), 4)


def test_hll_correction_noop_at_large_cardinality(spark):
    """Above the 2.5·m threshold the corrected estimator IS the raw one."""
    df = spark.createDataFrame([(f"v{i}",) for i in range(3000)], ["v"])
    [raw] = hll_distinct(df, "v", m=64).collect()
    [cor] = hll_distinct(df, "v", m=64, corrected=True).collect()
    assert raw.hll_est == cor.hll_est


def test_hll_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([("a",)], ["v"])
    with pytest.raises(ValueError):
        hll_distinct(df, "v", m=60).collect()


def test_hll_merge_property(spark):
    """Registers from disjoint shards merged by max ≡ single-pass sketch."""
    a = spark.createDataFrame([(f"v{i}",) for i in range(0, 400)], ["v"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(200, 600)], ["v"])
    both = a.union(b)
    merged = (
        hll_registers(a, "v").union(hll_registers(b, "v"))
        .groupBy("_b").agg(F.max("_m").alias("_m"))
    )
    single = hll_registers(both, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, single.collect()))


# -- count-min --------------------------------------------------------

def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    rows = [(f"u{i % 20}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["u"])
    sketch = cms_sketch(df, "u", depth=4, width=256)
    exact = df.groupBy("u").agg(F.count(F.lit(1)).alias("exact"))
    got = cms_lookup(sketch, exact, "u", depth=4, width=256).collect()
    assert len(got) == 20
    for r in got:
        assert r.cms_est >= r.exact  # CMS upper-bound invariant
    # 20 keys into 256 buckets × 4 rows: min over rows is exact w.h.p.
    assert all(r.cms_est == r.exact for r in got)


def test_cms_sketch_size_bounded(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(5000)], ["u"])
    n = cms_sketch(df, "u", depth=4, width=64).count()
    assert n <= 4 * 64


# -- connected components --------------------------------------------

def test_cc_two_components_and_chain(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)], ["src", "dst"]
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_cc_self_loop_and_duplicate_edges(spark):
    edges = spark.createDataFrame([(5, 5), (6, 7), (7, 6), (6, 7)], ["src", "dst"])
    got = {r.id: r.component for r in connected_components(edges).collect()}
    # pure self-loop nodes are dropped by symmetrization (no real edge)
    assert got == {6: 6, 7: 6}


def test_cc_probe_cadence_exact_on_path(spark):
    """check_every=3 (default) must detect convergence exactly: a path
    graph converges on a round that is NOT a probe multiple, and the
    labelling must equal the every-round-probe result, at several path
    lengths straddling the cadence boundary."""
    for n in (4, 5, 6, 7, 8):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], ["src", "dst"]
        )
        fast = {
            r.id: r.component
            for r in connected_components(edges, check_every=3).collect()
        }
        exact = {
            r.id: r.component
            for r in connected_components(edges, check_every=1).collect()
        }
        assert fast == exact == {i: 0 for i in range(n + 1)}


def test_cc_max_iter_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["src", "dst"])
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_resolve_dup_clusters(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9)], ["id_a", "id_b"]
    )
    got = {r.doc_id: r for r in resolve_dup_clusters(pairs).collect()}
    assert got[1].cluster_id == 1 and got[1].keep and got[1].cluster_size == 3
    assert got[2].cluster_id == 1 and not got[2].keep
    assert got[3].cluster_id == 1 and not got[3].keep
    assert got[8].keep and got[9].cluster_id == 8 and got[9].cluster_size == 2


# -- equi-depth histogram --------------------------------------------

def test_histogram_counts_and_depth(spark):
    import random

    rng = random.Random(7)
    rows = [(("a" if i % 2 else "b"), rng.uniform(0, 100)) for i in range(4000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    from ig_etl_sync_spark.operators.sketches import equi_depth_histogram

    hist = equi_depth_histogram(df, "v", buckets=8, group_cols=["g"]).collect()
    by_g: dict = {}
    for r in hist:
        by_g.setdefault(r.g, []).append(r)
    for g, rs in by_g.items():
        assert len(rs) == 8
        assert sum(r.cnt for r in rs) == 2000
        # equi-depth: continuous data → every bucket within 2% of n/k
        assert all(abs(r.cnt - 250) <= 5 for r in rs)
        # buckets tile the range: sorted los strictly increase
        los = [r.lo for r in sorted(rs, key=lambda r: r.bucket)]
        assert los == sorted(los)


def test_histogram_no_groups(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    from ig_etl_sync_spark.operators.sketches import equi_depth_histogram

    hist = equi_depth_histogram(df, "v", buckets=4).collect()
    assert sum(r.cnt for r in hist) == 100
    assert len(hist) == 4


# -- large-star/small-star CC ----------------------------------------

def test_star_cc_matches_label_prop_on_random_graphs(spark):
    import random

    from ig_etl_sync_spark.operators.clustering import connected_components_star

    for seed in (3, 11):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        star = {r.id: r.component for r in connected_components_star(df).collect()}
        prop = {r.id: r.component for r in connected_components(df).collect()}
        assert star == prop


def test_star_cc_deep_chain_converges_fast(spark):
    from ig_etl_sync_spark.operators.clustering import connected_components_star

    n = 200  # label prop would need ~200 rounds; stars need O(log^2 n)
    df = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    got = {r.id: r.component for r in connected_components_star(df, max_iter=12).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_quantile_sketch_exact_on_small_groups(spark):
    """Groups with <= k rows return EXACT discrete quantiles."""
    from ig_etl_sync_spark.operators.sketches import quantile_sketch

    rows = [("a", i, float(v)) for i, v in enumerate(range(1, 101))]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    got = quantile_sketch(
        df, "v", "id", k=256, group_cols=("g",), quantiles=(25, 50, 90, 99)
    ).collect()[0]
    # discrete quantile = value at rank ceil(q*n/100) over 1..100
    assert (got["sample_n"], got["q25"], got["q50"], got["q90"], got["q99"]) == (
        100, 25.0, 50.0, 90.0, 99.0,
    )


def test_quantile_sketch_merges(spark):
    """Mergeability: the bottom-k of the union equals the bottom-k of
    the per-shard bottom-k samples — sketching shards then merging
    gives the same quantiles as sketching the whole."""
    import pyspark.sql.functions as F

    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.sketches import quantile_sketch

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"),
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    k = 64
    whole = quantile_sketch(df, "v", "id", k=k, group_cols=("g",)).collect()

    # shard -> per-shard bottom-k SAMPLE (the sketch state) -> union ->
    # re-sketch the merged state
    def shard_sample(part):
        h = md5_int32(F.concat_ws(":", F.col("v").cast("string"), F.col("id").cast("string")))
        from pyspark.sql import Window
        w = Window.partitionBy("g").orderBy(h.asc(), F.col("v").asc())
        return (
            part.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .drop("_r")
        )

    merged_state = shard_sample(df.where("id % 2 = 0")).unionByName(
        shard_sample(df.where("id % 2 = 1"))
    )
    merged = quantile_sketch(merged_state, "v", "id", k=k, group_cols=("g",)).collect()
    assert [tuple(r) for r in whole] == [tuple(r) for r in merged]


def test_quantile_sketch_plan_has_window_group_limit(spark, sf_dir):
    """The rank<=k cut must compile to partial WindowGroupLimit so each
    partition forwards at most k rows per group into the shuffle."""
    from ig_etl_sync_spark.operators.sketches import quantile_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        quantile_sketch(ev, "value", "event_id", k=256, group_cols=("event_type",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_hll_rollup_levels_consistent(spark):
    """Rollup estimates from merged leaf registers must equal direct
    sketches computed at each level — merge loses nothing."""
    from ig_etl_sync_spark.operators.sketches import hll_distinct, hll_rollup

    rows = [
        (i, f"reg{i % 2}", f"nat{i % 6}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "uid long, r string, n string")
    roll = hll_rollup(df, "uid", ["r", "n"], m=64).collect()
    by_lvl = {}
    for row in roll:
        by_lvl.setdefault(row.lvl, {})[(row.r, row.n)] = (
            row.hll_est,
            row.hll_buckets,
        )
    leaf = {
        (r.r, r.n): (r.hll_est, r.hll_buckets)
        for r in hll_distinct(df, "uid", m=64, group_cols=["r", "n"]).collect()
    }
    mid = {
        (r.r, None): (r.hll_est, r.hll_buckets)
        for r in hll_distinct(df, "uid", m=64, group_cols=["r"]).collect()
    }
    top = hll_distinct(df, "uid", m=64).collect()[0]
    assert by_lvl[2] == leaf
    assert by_lvl[1] == mid
    assert by_lvl[0] == {(None, None): (top.hll_est, top.hll_buckets)}


def test_hll_rollup_single_scan_of_input(spark):
    """All levels must derive from the leaf registers: the executed
    plan scans the (cached-checkpoint) leaf, and the global estimate is
    within HLL error of the truth."""
    from ig_etl_sync_spark.operators.sketches import hll_rollup

    df = spark.createDataFrame(
        [(i, "r0" if i % 3 else "r1", f"n{i % 4}") for i in range(5000)],
        "uid long, r string, n string",
    )
    out = hll_rollup(df, "uid", ["r", "n"], m=64).collect()
    total = [r for r in out if r.lvl == 0][0]
    assert abs(total.hll_est - 5000) / 5000 < 0.35  # 1/sqrt(64) ~ 12.5%


def test_hll_rollup_rejects_empty_hierarchy(spark):
    from ig_etl_sync_spark.operators.sketches import hll_rollup

    df = spark.createDataFrame([(1, "a")], "uid long, r string")
    with pytest.raises(ValueError):
        hll_rollup(df, "uid", [])


def test_cc_matches_bruteforce_closure_random_graphs(spark):
    """Round-9 rework pin (self-loop single-join rounds, fused init,
    probe-every-round): the labelling must equal a driver-side
    union-find closure on randomized graphs of varying shape — shallow
    dup-style pair sets, deeper chains, and a mix with duplicate /
    reversed edges."""
    import random

    rng = random.Random(90210)
    for trial in range(4):
        n = rng.randint(8, 40)
        m = rng.randint(4, 60)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        # include a deliberate chain so diameter > 1 rounds are hit
        chain = list(range(100, 100 + rng.randint(3, 9)))
        edges += list(zip(chain, chain[1:]))
        df = spark.createDataFrame(edges, ["src", "dst"])

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = set()
        for a, b in edges:
            if a == b:
                continue  # pure self-loops are not edges (pinned above)
            nodes |= {a, b}
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {x: find(x) for x in nodes}

        got = {
            r.id: r.component for r in connected_components(df).collect()
        }
        assert got == expect, (trial, sorted(edges))
