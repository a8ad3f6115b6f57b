"""Property tests (SURVEY §5.3): parse/normalize round-trips and the
upsert PK invariant, over hypothesis-generated inputs.

Each example list becomes ONE DataFrame (not one Spark job per
example) to keep runtime sane; deadline disabled because Spark job
latency is unrelated to input size.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from bow_hunter_pipeline_spark.functions.parsing import (
    parse_long,
    parse_unit,
    sanitize_header,
)
from bow_hunter_pipeline_spark.operators.upsert import upsert

_SETTINGS = dict(max_examples=10, deadline=None)

# printable ASCII only: Python's int()/strip() accept unicode digits
# and exotic whitespace that JVM casts/trim deliberately do not — that
# divergence is outside the engine's contract (headers/cells are ASCII
# in the reference corpus)
_junk = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=12,
)
_ints = st.integers(min_value=0, max_value=10**12)


def _fmt_commas(n: int) -> str:
    return f"{n:,}"


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_junk, _ints.map(_fmt_commas)), min_size=1, max_size=30))
def test_parse_long_is_null_or_exact(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    rows = df.select("raw", parse_long("raw").alias("parsed")).collect()
    for r in rows:
        stripped = r.raw.strip().replace(",", "")
        try:
            expected = int(stripped)
            if not (-(2**63) <= expected < 2**63):
                expected = None
        except ValueError:
            expected = None
        assert r.parsed == expected, (r.raw, r.parsed, expected)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(_junk, st.integers(0, 10**6).map(lambda n: f"00{n}")),
        min_size=1,
        max_size=30,
    )
)
def test_parse_unit_digits_only_gate(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    rows = df.select("raw", parse_unit("raw").alias("unit")).collect()
    for r in rows:
        t = r.raw.strip()
        if t and all(c in "0123456789" for c in t):
            # digit strings: exact value, or NULL on int32 overflow
            expected = int(t) if int(t) < 2**31 else None
        else:
            expected = None
        assert r.unit == expected, (r.raw, r.unit, expected)


@given(st.text(min_size=0, max_size=40))
@settings(**_SETTINGS)
def test_sanitize_header_charset_and_idempotence(name):
    out = sanitize_header(name)
    assert all(c.islower() or c.isdigit() or c == "_" for c in out)
    assert sanitize_header(out) == out  # idempotent


@settings(**_SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 100)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 100)), min_size=1, max_size=25),
)
def test_upsert_pk_unique_and_partial_update(spark, old_rows, new_rows):
    # dedupe inputs per key (last wins) to model valid batches
    old = {k: v for k, v in old_rows}
    new = {k: v for k, v in new_rows}
    existing = spark.createDataFrame(
        [(k, v, f"old{k}") for k, v in old.items()], "k int, upd int, keep string"
    )
    incoming = spark.createDataFrame(
        [(k, v, f"new{k}") for k, v in new.items()], "k int, upd int, keep string"
    )
    merged = {
        r.k: (r.upd, r.keep)
        for r in upsert(existing, incoming, ["k"], ["upd"]).collect()
    }
    # PK unique and complete
    assert set(merged) == set(old) | set(new)
    for k, (upd, keep) in merged.items():
        if k in old and k in new:
            # update col from incoming, other col keeps the OLD value
            assert upd == new[k] and keep == f"old{k}"
        elif k in new:
            assert upd == new[k] and keep == f"new{k}"
        else:
            assert upd == old[k] and keep == f"old{k}"


@settings(max_examples=5, deadline=None)
@given(
    base_keys=st.lists(
        st.integers(min_value=0, max_value=300),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    upd_keys=st.lists(
        st.integers(min_value=0, max_value=300),
        min_size=0,
        max_size=20,
        unique=True,
    ),
    n_files=st.integers(min_value=1, max_value=5),
)
def test_tx_merge_pruned_equals_full_merge(
    spark, tmp_path_factory, base_keys, upd_keys, n_files
):
    """Property: for ANY base/update key sets and ANY file layout, the
    file-pruned MERGE and the full-rewrite MERGE produce identical
    tables — pruning is a pure I/O optimization, never a semantics
    change. Covers empty updates (no-op path), all-insert, all-match,
    and straddling ranges."""
    from bow_hunter_pipeline_spark import warehouse_tx as tx

    root = tmp_path_factory.mktemp("txprop")
    base = spark.createDataFrame(
        [(k, f"s{k}", float(k)) for k in sorted(base_keys)],
        "k bigint, s string, v double",
    ).repartitionByRange(n_files, "k")
    upd = spark.createDataFrame(
        [(k, "UP", float(k) * 10) for k in sorted(upd_keys)],
        "k bigint, s string, v double",
    )
    t_full, t_pruned = str(root / "full"), str(root / "pruned")
    tx.create_table(spark, t_full, base)
    tx.create_table(spark, t_pruned, base, stats_cols=["k"])
    tx.merge(spark, t_full, upd, ["k"], ["v"])
    tx.merge_pruned(spark, t_pruned, upd, ["k"], ["v"])
    a = sorted(map(tuple, tx.snapshot(spark, t_full).collect()))
    b = sorted(map(tuple, tx.snapshot(spark, t_pruned).collect()))
    assert a == b


@settings(max_examples=5, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["merge", "pruned", "compact"]),
            st.lists(
                st.integers(min_value=0, max_value=60),
                min_size=0,
                max_size=6,
                unique=True,
            ),
        ),
        min_size=3,
        max_size=14,
    ),
)
def test_tx_model_based_history_and_checkpoints(
    spark, tmp_path_factory, ops
):
    """Model-based property: apply an arbitrary sequence of
    merge / pruned-merge / compact ops to a tx table AND to a plain
    Python dict model; at the end the table equals the model, and at
    EVERY version the checkpointed replay equals the full from-zero
    replay. Catches protocol bugs a fixed-sequence test can't (e.g.
    checkpoint interaction with compaction's remove-all commits)."""
    from bow_hunter_pipeline_spark import warehouse_tx as tx

    root = tmp_path_factory.mktemp("txmodel")
    table = str(root / "t")
    model = {k: float(k) for k in range(10)}
    base = spark.createDataFrame(
        sorted(model.items()), "k bigint, v double"
    )
    tx.create_table(spark, table, base, stats_cols=["k"])

    step = 0
    for op, keys in ops:
        step += 1
        if op == "compact":
            tx.compact(spark, table)
            continue  # state unchanged
        upd_rows = [(k, float(1000 * step + k)) for k in sorted(keys)]
        upd = spark.createDataFrame(upd_rows, "k bigint, v double")
        if op == "merge":
            tx.merge(spark, table, upd, ["k"], ["v"])
        else:
            tx.merge_pruned(spark, table, upd, ["k"], ["v"])
        model.update({k: v for k, v in upd_rows})

    got = {r.k: r.v for r in tx.snapshot(spark, table).collect()}
    assert got == model
    for v in tx._versions(table):
        assert tx._replay(table, v) == tx._replay(
            table, v, use_checkpoint=False
        ), f"checkpoint replay diverged at v{v}"


@settings(max_examples=5, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(
                ["merge", "append", "cow_delete", "dv_delete",
                 "update", "compact", "binpack", "restore",
                 "merge_sync", "dv_purge"]
            ),
            st.lists(
                st.integers(min_value=0, max_value=60),
                min_size=0,
                max_size=5,
                unique=True,
            ),
        ),
        min_size=4,
        max_size=12,
    ),
)
def test_tx_model_based_row_ops_and_restore(spark, tmp_path_factory, ops):
    """Model-based property over the ROUND-6 op set: arbitrary
    sequences of merge / append / copy-on-write delete / deletion-
    vector delete / update / compact / size-binpack / restore
    (rewriting ops randomly writing CDC change files) applied to the table
    AND to a dict model; the snapshot must equal the model after
    EVERY op, restore must reproduce the recorded model of the target
    version exactly, and the DV-aware checkpoint replay must equal
    the full replay at every version."""
    from bow_hunter_pipeline_spark import warehouse_tx as tx

    root = tmp_path_factory.mktemp("txmodel2")
    table = str(root / "t")
    model = {k: float(k) for k in range(12)}
    base = spark.createDataFrame(
        sorted(model.items()), "k bigint, v double"
    )
    tx.create_table(spark, table, base, stats_cols=["k"])
    model_at = {0: dict(model)}

    step = 0
    for op, keys in ops:
        step += 1
        cdc = step % 2 == 0  # alternate writer-side change files
        if op == "compact":
            tx.compact(spark, table)
        elif op == "binpack":
            tx.compact_binpack(
                spark, table, target_bytes=1 << 20,
                min_file_bytes=64 << 10,
            )
        elif op == "restore":
            target = sorted(model_at)[keys[0] % len(model_at)] if keys else 0
            tx.restore(spark, table, target)
            model = dict(model_at[target])
        elif op == "append":
            rows = [(1000 * step + i, float(step)) for i in keys]
            if rows:
                tx.append(
                    spark,
                    table,
                    spark.createDataFrame(rows, "k bigint, v double"),
                )
                model.update({k: v for k, v in rows})
        elif op == "merge":
            rows = [(k, float(100 * step + k)) for k in sorted(keys)]
            upd = spark.createDataFrame(rows, "k bigint, v double")
            tx.merge(spark, table, upd, ["k"], ["v"], write_cdc=cdc)
            model.update({k: v for k, v in rows})
        elif op == "cow_delete":
            ks = ", ".join(str(k) for k in keys) or "-1"
            tx.delete_where(spark, table, f"k IN ({ks})", write_cdc=cdc)
            for k in keys:
                model.pop(k, None)
        elif op == "dv_delete":
            ks = ", ".join(str(k) for k in keys) or "-1"
            tx.delete_where_dv(spark, table, f"k IN ({ks})")
            for k in keys:
                model.pop(k, None)
        elif op == "update":
            ks = ", ".join(str(k) for k in keys) or "-1"
            tx.update_where(
                spark, table, f"k IN ({ks})", {"v": "v + 0.5"},
                write_cdc=cdc,
            )
            for k in keys:
                if k in model:
                    model[k] += 0.5
        elif op == "merge_sync":
            # tri-clause MERGE: source is authoritative for the
            # k % 3 == 0 region — rows there and absent from the
            # source are deleted; everywhere else matched-update /
            # not-matched-insert apply
            rows = [(k, float(7000 + step)) for k in sorted(keys)]
            src = spark.createDataFrame(
                rows or [(-1, 0.0)], "k bigint, v double"
            )
            if not rows:
                src = src.filter("k >= 0")
            _, n_u, n_i, n_d = tx.merge_sync(
                spark, table, src, ["k"], ["v"], scope="k % 3 = 0"
            )
            src_keys = {k for k, _ in rows}
            expect_del = [
                k
                for k in model
                if k % 3 == 0 and k not in src_keys
            ]
            assert n_d == len(expect_del), (n_d, expect_del)
            for k in expect_del:
                model.pop(k)
            model.update({k: v for k, v in rows})
        elif op == "dv_purge":
            v_purge, n_files, n_rows = tx.purge_deletion_vectors(
                spark, table
            )
            # model untouched: purge is pure reorganization — and the
            # post-purge live set must carry ZERO vectors
            live_now = set(tx.live_files(table))
            dv_now = {
                r
                for r, ref in tx._replay_dvs(table).items()
                if ref and r in live_now
            }
            assert not dv_now, dv_now
        got = {r.k: r.v for r in tx.snapshot(spark, table).collect()}
        assert got == model, f"diverged after step {step} ({op})"
        model_at[tx._versions(table)[-1]] = dict(model)

    for v in tx._versions(table):
        assert tx._replay_dvs(table, v) == tx._replay_dvs(
            table, v, use_checkpoint=False
        ), f"DV checkpoint replay diverged at v{v}"


@settings(**_SETTINGS)
@given(
    old_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda r: r[0],
    ),
    new_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda r: r[0],
    ),
)
def test_upsert_guard_cols_matches_model(spark, old_rows, new_rows):
    """Guarded upsert law, over arbitrary key/guard combinations: a
    matched row takes the update iff the update's guard is STRICTLY
    greater; unmatched updates insert; everything else is untouched."""
    from bow_hunter_pipeline_spark.operators.upsert import upsert

    schema = "k bigint, g bigint, v bigint"
    old = [(k, g, 100 + k) for k, g in old_rows]
    new = [(k, g, 200 + k) for k, g in new_rows]
    e = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    u = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
    got = {
        r.k: (r.g, r.v)
        for r in upsert(e, u, ["k"], ["g", "v"], guard_cols=["g"]).collect()
    }
    model = {k: (g, v) for k, g, v in old}
    for k, g, v in new:
        if k not in model or g > model[k][0]:
            model[k] = (g, v)
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=60,
    ),
)
def test_histogram_quantile_error_bounded_by_bin_width(spark, data):
    """Sketch error law on arbitrary data: the interpolated estimate
    and the exact rank-ceil(q·n) element sit in the SAME bin (the
    cumulative-count inequalities force it), so |est − exact| can
    never exceed one bin width. Degenerate all-equal inputs give
    width 0 and exact answers."""
    from bow_hunter_pipeline_spark.plans.approx import (
        HIST_BINS,
        _histogram_quantiles,
    )

    vals = spark.createDataFrame(data, "grp string, v double")
    lo = min(v for _, v in data)
    hi = max(v for _, v in data)
    width = (hi - lo) / HIST_BINS
    rows = _histogram_quantiles(vals).collect()
    assert rows, "sketch produced no quantile rows"
    groups = {g for g, _ in data}
    qs_seen = {(r.grp, r.q) for r in rows}
    assert {g for g, _ in qs_seen} == groups | {"ALL"}
    for r in rows:
        assert abs(r.est_q - r.exact_q) <= width + 1e-9 * max(
            1.0, abs(hi), abs(lo)
        ), (r, width)


@settings(max_examples=25, deadline=None)
@given(
    toks=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3),
        min_size=1,
        max_size=12,
    ),
    rule=st.tuples(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.text(alphabet="ab", min_size=1, max_size=3),
    ),
)
def test_bpe_fold_matches_pure_python_greedy(spark, toks, rule):
    """The BPE merge fold vs an independent reference on ARBITRARY
    token runs and rules (including multi-char symbols and rules that
    never match): greedy left-to-right non-overlapping merge — scan
    the original sequence, merge (l, r) at the first opportunity,
    continue after the merged pair."""
    from pyspark.sql import functions as F

    from bow_hunter_pipeline_spark.plans import traindata

    l, r = rule

    def reference(ts: list) -> list:
        out, i = [], 0
        while i < len(ts):
            if i + 1 < len(ts) and ts[i] == l and ts[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(ts[i])
                i += 1
        return out

    df = spark.createDataFrame(
        [(toks, l, r)], "toks array<string>, w_l string, w_r string"
    )
    got = df.select(
        F.split(
            F.aggregate("toks", F.lit(""), traindata._bpe_fold), " "
        ).alias("out")
    ).collect()[0].out
    assert got == reference(toks), (toks, rule, got)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_cc_alternating_star_matches_union_find(spark, raw_edges):
    """Alternating large-star/small-star on ARBITRARY random graphs
    (self-loops and duplicates included in the raw input) must label
    every node with its component minimum — the PRODUCTION fixpoint
    loop checked against a pure Python union-find."""
    from bow_hunter_pipeline_spark.plans.dedup import (
        alternating_star_labels,
    )

    edges_py = sorted(
        {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    )
    if not edges_py:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges_py:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}

    edges = spark.createDataFrame(edges_py, "src bigint, dst bigint")
    got = {
        r.src: r.lbl for r in alternating_star_labels(edges).collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_phases_match_bruteforce(spark, pts):
    """The two-phase skyline (bucket prefilter + survivor windows) on
    random (x=date-index, y=price) points must equal the O(n²)
    dominance definition — including duplicate points, which are
    mutually non-dominating and must BOTH survive."""
    rows = [(1, x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "seg int, x int, y int")
    bucket = (F.col("x") / F.lit(5)).cast("int")
    month_max = df.groupBy("seg", bucket.alias("b")).agg(
        F.max("y").alias("mmax")
    )
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("seg")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bound = month_max.select(
        "seg", "b", F.max("mmax").over(w_prev).alias("pb")
    )
    surv = (
        df.withColumn("b", bucket)
        .join(F.broadcast(bound), ["seg", "b"])
        .filter(F.col("pb").isNull() | (F.col("y") > F.col("pb")))
    )
    w_past = (
        Window.partitionBy("seg")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("seg", "x")
    got_rows = (
        surv.select(
            "x",
            "y",
            F.max("y").over(w_past).alias("pm"),
            F.max("y").over(w_same).alias("sm"),
        )
        .filter(
            (F.col("y") == F.col("sm"))
            & (F.col("pm").isNull() | (F.col("y") > F.col("pm")))
        )
        .select("x", "y")
        .collect()
    )
    got = sorted((r.x, r.y) for r in got_rows)
    expect = sorted(
        (x, y)
        for x, y in pts
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y) for qx, qy in pts
        )
    )
    assert got == expect
