"""Property-based tests (hypothesis): the dedup/window/merge semantics
hold for arbitrary event interleavings, not just the fixture scenarios.
A Python model implements the spec; Spark must agree."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fhir_to_lakehouse_spark.functions import dedup as DD
from fhir_to_lakehouse_spark.operators.bundles import latest_per_key
from pyspark.sql import functions as F

# (key, partition, offset) events; offsets unique per partition
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=3),   # kafka partition
    ),
    min_size=1,
    max_size=30,
).map(
    lambda pairs: [
        (k, p, off) for off, (k, p) in enumerate(pairs)
    ]
)


def model_latest_per_key(rows):
    """Spec: per key keep the row that sorts first by
    (partition ASC, offset DESC) — reference W1."""
    best = {}
    for k, p, off in rows:
        if k not in best:
            best[k] = (p, off)
        else:
            bp, boff = best[k]
            if (p, -off) < (bp, -boff):
                best[k] = (p, off)
    return {(k, p, off) for k, (p, off) in best.items()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_latest_per_key_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(str(k), p, off) for k, p, off in rows],
        "request_url string, partition int, offset long",
    )
    got = {
        (int(r["request_url"]), r["partition"], r["offset"])
        for r in latest_per_key(df, key="request_url").collect()
    }
    assert got == model_latest_per_key(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), max_size=8),
    b=st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), max_size=8),
)
def test_jaccard_matches_set_definition(spark, a, b):
    df = spark.createDataFrame(
        [(sorted(a), sorted(b))], "x array<string>, y array<string>"
    )
    got = df.select(DD.jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0]["j"]
    want = len(a & b) / max(len(a | b), 1)
    assert abs(got - want) < 1e-12


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abc .,!123\n\t", min_size=0, max_size=40),
        min_size=1,
        max_size=5,
    )
)
def test_quality_score_bounded(spark, texts):
    """quality_score stays in [0, 1] for arbitrary text, including
    empty/whitespace/punctuation-only documents."""
    from fhir_to_lakehouse_spark.functions.text import quality_score

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for r in df.select(quality_score("text").alias("q")).collect():
        assert r["q"] is not None
        assert 0.0 <= r["q"] <= 1.0 + 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=20), min_size=1, max_size=6
    )
)
def test_minhash_similarity_bounds(spark, texts):
    """Signature agreement fraction is 1.0 for identical shingle sets
    and in [0,1] always; identical docs always collide in every band."""
    from fhir_to_lakehouse_spark.functions.text import shingles

    rows = [(i, t) for i, t in enumerate(texts + texts)]  # planted dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r["doc_id"]: tuple(r["sig"])
        for r in df.select(
            "doc_id", DD.minhash_signature(shingles("text", 2), 6).alias("sig")
        ).collect()
    }
    n = len(texts)
    for i in range(n):
        assert sigs[i] == sigs[i + n]  # identical text -> identical signature


# --- SCD2: arbitrary keyed update sequences -------------------------------

# sequence of (key, value, day) records with strictly increasing days,
# split into 1-3 batches at arbitrary points
scd_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=2),    # tracked value
    ),
    min_size=1,
    max_size=16,
).map(lambda pairs: [(k, v, day + 1) for day, (k, v) in enumerate(pairs)])


def _model_scd2(records):
    """Spec: per key, consecutive-distinct values form versions;
    each version spans [its day, next version's day)."""
    by_key: dict = {}
    for k, v, day in records:
        chain = by_key.setdefault(k, [])
        if not chain or chain[-1][0] != v:
            chain.append((v, day))
    out = set()
    for k, chain in by_key.items():
        for (v, day), nxt in zip(chain, chain[1:] + [None]):
            out.add((k, v, day, nxt[1] if nxt else None))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=scd_strategy, n_batches=st.integers(min_value=1, max_value=3))
def test_scd2_matches_model_for_any_batching(spark, records, n_batches):
    """apply_scd2 must produce the model's version set regardless of
    how the record sequence is split into incremental batches — the
    incremental path and a one-shot rebuild agree."""
    import datetime as dt

    from fhir_to_lakehouse_spark.operators.scd import apply_scd2

    def to_df(batch):
        return spark.createDataFrame(
            [
                (str(k), str(v), dt.datetime(2024, 1, day))
                for k, v, day in batch
            ],
            "id STRING, status STRING, ts TIMESTAMP",
        )

    size = max(1, -(-len(records) // n_batches))
    state = None
    for i in range(0, len(records), size):
        state = apply_scd2(
            state, to_df(records[i : i + size]),
            key="id", ts_col="ts", tracked=["status"],
        )
    got = {
        (
            int(r["id"]),
            int(r["status"]),
            r["valid_from"].day,
            r["valid_to"].day if r["valid_to"] else None,
        )
        for r in state.collect()
    }
    assert got == _model_scd2(records)
    # interval invariants: exactly one open version per key
    rows = state.collect()
    open_per_key: dict = {}
    for r in rows:
        if r["valid_to"] is None:
            open_per_key[r["id"]] = open_per_key.get(r["id"], 0) + 1
        assert r["is_current"] == (r["valid_to"] is None)
    assert all(n == 1 for n in open_per_key.values())


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=20,
    ),
    max_hops=st.integers(0, 4),
)
def test_bfs_hops_matches_python_reference(spark, edges, max_hops):
    """bfs_hops on arbitrary small digraphs (self-loops, cycles,
    duplicates) equals a pure-Python level-synchronous BFS."""
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    seed = edges[0][0]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.hops for r in bfs_hops(df, seed=seed, max_hops=max_hops).collect()}

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want = {seed: 0}
    frontier = {seed}
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= set(want)
        for v in nxt:
            want[v] = h
        frontier = nxt
        if not frontier:
            break
    assert got == want


# --- prefix-filtered set-similarity join (AllPairs/PPJoin) -----------

# docs as small integer-element sets drawn from a 20-element universe:
# small universe forces overlaps, so near-dup pairs actually occur
sets_strategy = st.lists(
    st.sets(st.integers(min_value=0, max_value=19), min_size=0, max_size=12),
    min_size=2,
    max_size=14,
)


def _model_prefix_pairs(doc_sets, t):
    """Spec: every unordered id pair with Jaccard >= t, brute force."""
    out = set()
    for i in range(len(doc_sets)):
        for j in range(i + 1, len(doc_sets)):
            a, b = doc_sets[i], doc_sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter / (len(a) + len(b) - inter) >= t:
                out.add((i, j, inter))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_sets=sets_strategy,
    t=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_prefix_filter_pairs_matches_brute_force(spark, doc_sets, t):
    """Completeness AND precision: the prefix-filter join returns
    exactly the brute-force Jaccard >= t pair set for arbitrary input
    sets and thresholds (the prefix lemma's guarantee, end to end)."""
    df = spark.createDataFrame(
        [(i, [str(x) for x in sorted(s)]) for i, s in enumerate(doc_sets)],
        "doc_id long, sh array<string>",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in DD.prefix_filter_pairs(
            df, set_col="sh", id_col="doc_id", threshold=t
        ).collect()
    }
    assert got == _model_prefix_pairs(doc_sets, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    copies=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=16),
    t=st.sampled_from([0.3, 0.5, 0.9]),
)
def test_prefix_filter_pairs_duplicate_heavy(spark, copies, t):
    """The identical-set collapse path (PPJoin duplicate hardening):
    corpora that are mostly COPIES of a few base sets must still yield
    exactly the brute-force pair set — within-group (Jaccard=1) and
    cross-group expansions both correct."""
    bases = [
        {"a", "b", "c", "d"},          # base 0
        {"a", "b", "c", "e"},          # near-dup of 0 (J = 0.6)
        {"x", "y"},                    # unrelated
    ]
    doc_sets = [bases[c] for c in copies]
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(doc_sets)],
        "doc_id long, sh array<string>",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in DD.prefix_filter_pairs(
            df, set_col="sh", id_col="doc_id", threshold=t
        ).collect()
    }
    assert got == _model_prefix_pairs(doc_sets, t)


def test_prefix_filter_positional_bound_exact_threshold(spark):
    """Pin the ADVICE-r10 float-ceil boundary: threshold 0.9, na+nb=133
    makes the exact overlap requirement ceil(9/19*133) = 63, but the
    double product 0.9/1.9*133 = 63.000000000000001 so a naive F.ceil
    gives 64 and the positional filter prunes a pair whose Jaccard is
    EXACTLY the threshold before verification ever sees it.

    Construction: |a| = 66, |b| = 67, 63 shared elements (J = 63/70 =
    0.9 exactly), 3 elements unique to a and 4 unique to b. Unique
    elements have df=1 so the df-ascending canonical order puts them
    first: the first common element sits at positions (pa, pb) = (4, 5),
    giving positional bound 1 + min(66-4, 67-5) = 63 — passing iff
    alpha is the exact 63. Prefix lengths are 7/7 so the collision is
    in-prefix. With the overshot alpha=64 this pair silently vanishes;
    with the boundary-safe ceil it must be returned (and the later
    collisions at (5,6)/(6,7) correctly fail the bound, so THIS row is
    the only survivor — the test exercises the boundary, not slack)."""
    common = [f"c{i:02d}" for i in range(63)]
    a = {"ua0", "ua1", "ua2"} | set(common)
    b = {"ub0", "ub1", "ub2", "ub3"} | set(common)
    doc_sets = [a, b]
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(doc_sets)],
        "doc_id long, sh array<string>",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"], r["jaccard"])
        for r in DD.prefix_filter_pairs(
            df, set_col="sh", id_col="doc_id", threshold=0.9
        ).collect()
    }
    assert got == {(0, 1, 63, 0.9)}
    assert _model_prefix_pairs(doc_sets, 0.9) == {(0, 1, 63)}


def test_prefix_filter_exact_threshold_small_ratio(spark):
    """Second ADVICE-r10 overshoot instance: t=0.2, na+nb=18 — double
    0.2/1.2*18 = 3.0000000000000004 -> naive ceil 4 vs exact 3. Two
    9-element sets sharing exactly 3 elements have J = 3/15 = 0.2,
    exactly at threshold; they must be returned."""
    common = ["c0", "c1", "c2"]
    a = {"a0", "a1", "a2", "a3", "a4", "a5"} | set(common)
    b = {"b0", "b1", "b2", "b3", "b4", "b5"} | set(common)
    df = spark.createDataFrame(
        [(0, sorted(a)), (1, sorted(b))],
        "doc_id long, sh array<string>",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in DD.prefix_filter_pairs(
            df, set_col="sh", id_col="doc_id", threshold=0.2
        ).collect()
    }
    assert got == _model_prefix_pairs([a, b], 0.2) == {(0, 1, 3)}


# --- view-path splitter (quote-aware) ------------------------------------

_seg_chars = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
).map(lambda s: "f" + s)  # segments start with a letter
_literal_chars = st.text(
    alphabet=st.characters(
        blacklist_characters="'", min_codepoint=32, max_codepoint=126
    ),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    segs=st.lists(_seg_chars, min_size=1, max_size=5),
    lit=_literal_chars,
    where_field=_seg_chars,
)
def test_split_path_quote_aware_roundtrip(segs, lit, where_field):
    """Property: dots INSIDE single-quoted literals never split a
    segment — any printable quote-free literal (dots, parens, spaces,
    '%', '=') survives verbatim inside where(f='...') / join('...') /
    extension('...') — while dots between segments always split."""
    from fhir_to_lakehouse_spark.operators.view_definition import (
        _split_path,
    )

    # plain dotted path splits into exactly its segments
    assert _split_path(".".join(segs)) == segs

    for fn_seg in (
        f"where({where_field}='{lit}')",
        f"join('{lit}')",
        f"extension('{lit or 'u'}')",
    ):
        path = ".".join(segs + [fn_seg])
        got = _split_path(path)
        assert got[: len(segs)] == segs
        # the function call survives as ONE trailing segment with the
        # literal intact (leading/trailing blanks strip like segments)
        assert len(got) == len(segs) + 1
        assert got[-1] == fn_seg.strip()


# --- interval coalescing: islands match a sweep-line model ----------


def model_islands(intervals):
    """Spec: sort by (start, end); a row opens a new island exactly
    when its start exceeds the running max of all previous ends.
    Returns the multiset of (island_start, island_end) spans."""
    spans = []
    cur_s = cur_e = None
    for s, e in sorted(intervals):
        if cur_s is None or s > cur_e:
            if cur_s is not None:
                spans.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_s is not None:
        spans.append((cur_s, cur_e))
    return sorted(spans)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # start
            st.integers(min_value=0, max_value=20),  # length
        ),
        min_size=1,
        max_size=25,
    )
)
def test_coalesce_intervals_matches_sweep_line(spark, raw):
    """functions/intervals.coalesce_intervals (the operator under
    fhir_medication_mpr and events_interval_coalesce) must produce
    exactly the sweep-line model's island spans for ANY interval
    multiset — including duplicates, containment, touching ends, and
    zero-length intervals."""
    from fhir_to_lakehouse_spark.functions.intervals import (
        coalesce_intervals,
    )

    intervals = [(s, s + ln) for s, ln in raw]
    df = spark.createDataFrame(
        [("k", s, e) for s, e in intervals], "key string, s int, e int"
    )
    out = (
        coalesce_intervals(df, ["key"], "s", "e", order_tiebreak="e")
        .groupBy("island_id")
        .agg(F.min("s").alias("is"), F.max("e").alias("ie"))
        .collect()
    )
    got = sorted((r["is"], r["ie"]) for r in out)
    assert got == model_islands(intervals)


# ---------------------------------------------------------- pagerank paths

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=20,
).map(
    # collapse parallel edges (pagerank expects an aggregated edge
    # list); self-loops are legal and kept
    lambda es: sorted({(a, b): w for a, b, w in es}.items())
)


def _model_pagerank(edge_items, iterations=2, damping=0.85):
    """Reference implementation in plain Python: the exact update
    formula pagerank documents, dangling mass redistributed uniformly."""
    edges = [(a, b, w) for (a, b), w in edge_items]
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    out = {}
    for a, _, w in edges:
        out[a] = out.get(a, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        c = {}
        for a, b, w in edges:
            c[b] = c.get(b, 0.0) + rank[a] * (w / out[a])
        dm = 1.0 - sum(c.values())
        rank = {
            v: (1 - damping) / n + damping * (c.get(v, 0.0) + dm / n)
            for v in nodes
        }
    return rank


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_items=edges_strategy)
def test_pagerank_three_paths_agree_with_model(spark, edge_items):
    """The r9 collect-once local path, the broadcast driver-iterate
    path, and the shuffle path must all match the Python model (and
    each other) on arbitrary small graphs — self-loops, dangling
    nodes, disconnected components included."""
    from fhir_to_lakehouse_spark.functions.graph import pagerank

    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in edge_items], "src long, dst long, w long"
    )
    want = _model_pagerank(edge_items)
    for kw in (
        {"broadcast_threshold": 10**6},  # collect-once local path
        {"broadcast_threshold": True},   # driver-iterate broadcast path
        {"broadcast_threshold": False},  # distributed shuffle path
    ):
        got = {
            r.node: r.r
            for r in pagerank(df, iterations=2, **kw).collect()
        }
        assert got.keys() == want.keys(), kw
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (kw, v, got[v], want[v])
