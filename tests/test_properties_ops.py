"""Property-based tests (hypothesis) for the round-4 operators: each Spark
operator is compared against a direct Python reference model on randomized
inputs — catching partition/segmentation edge cases single examples miss.
Spark jobs are expensive, so examples are few but each carries many rows."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_engine_spark.core.definitions import TransformerSpec
from lakehouse_engine_spark.transformers.transformer_factory import TransformerFactory


def t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


_few = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_intervals = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 60),
        st.integers(0, 30),
    ),
    min_size=1,
    max_size=40,
)


def _merge_ref(rows):
    """Reference sweep: per key, sort by (start, end), merge overlapping or
    touching spans."""
    out = []
    for key in sorted({k for k, _, _ in rows}):
        iv = sorted(((s, s + d) for k, s, d in rows if k == key))
        cur_s, cur_e, n = iv[0][0], iv[0][1], 1
        for s, e in iv[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                out.append((key, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        out.append((key, cur_s, cur_e, n))
    return sorted(out)


@_few
@given(rows=_intervals)
def test_merge_intervals_matches_reference_sweep(spark, rows):
    df = spark.createDataFrame(
        [(k, s, s + d) for k, s, d in rows], "k STRING, s INT, e INT"
    )
    got = sorted(
        (r["k"], r["s"], r["e"], r["n_merged"])
        for r in df.transform(
            t("merge_intervals", on=["k"], start_col="s", end_col="e")
        ).collect()
    )
    assert got == _merge_ref(rows)


_states = st.lists(
    st.tuples(st.integers(1, 3), st.sampled_from(["A", "B", "C"])),
    min_size=1,
    max_size=40,
)


@_few
@given(rows=_states)
def test_scd2_matches_reference_fold(spark, rows):
    """Random per-key state sequences: versions = run-length encoding;
    intervals chain contiguously; exactly one current row per key."""
    data = []
    seq = {}
    for k, state in rows:
        seq.setdefault(k, []).append(state)
        data.append((k, len(seq[k]), state))
    df = spark.createDataFrame(data, "k INT, ts INT, state STRING")
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["state"], r["is_current"])
        for r in df.transform(
            t("scd2_build", key_cols=["k"], ts_col="ts", attr_cols=["state"])
        ).collect()
    )
    ref = []
    for k, states in seq.items():
        runs = []
        for i, s in enumerate(states, 1):
            if not runs or runs[-1][1] != s:
                runs.append((i, s))
        for j, (start, s) in enumerate(runs):
            nxt = runs[j + 1][0] if j + 1 < len(runs) else None
            ref.append((k, start, nxt, s, nxt is None))
    assert got == sorted(ref)


_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=60),
    min_size=1,
    max_size=8,
)


@_few
@given(docs=_docs)
def test_cdc_chunk_tiles_every_document(spark, docs):
    """Chunks always tile the token stream exactly (no loss, no overlap,
    contiguous chunk indices), for any token content incl. highly
    repetitive streams."""
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id LONG, text STRING",
    )
    out = df.transform(t("text_cdc_chunk", window=3, divisor=3)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i, toks in enumerate(docs):
        chunks = sorted(by_doc.get(i, []))
        assert [c for c, _ in chunks] == list(range(len(chunks)))
        assert " ".join(txt for _, txt in chunks).split() == toks


_series = st.lists(
    st.tuples(st.integers(1, 3), st.floats(-100, 100, allow_nan=False)),
    min_size=1,
    max_size=60,
)


@_few
@given(rows=_series)
def test_ewma_batch_matches_python_recurrence(spark, rows):
    """The sorted-partition mapInPandas fold equals the direct recurrence —
    with tiny Arrow batches forcing key groups to straddle batch
    boundaries (exercising the buffering path)."""
    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k INT, ts INT, v DOUBLE")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = {
            (r["k"], r["ts"]): (r["ewma"], r["z"], r["is_anomaly"])
            for r in df.transform(
                t("streaming_ewma_anomaly", on=["k"], value_col="v",
                  ts_col="ts", alpha=0.5, threshold=2.0, min_periods=2)
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    state = {}
    for k, ts, v in data:
        ewma, ewvar, n = state.get(k, (0.0, 0.0, 0))
        if n >= 2 and ewvar > 0:
            z = (v - ewma) / math.sqrt(ewvar)
            exp = (z, abs(z) > 2.0)
        else:
            exp = (None, False)
        if n == 0:
            ewma, ewvar = v, 0.0
        else:
            delta = v - ewma
            ewma = ewma + 0.5 * delta
            ewvar = 0.5 * (ewvar + 0.5 * delta * delta)
        state[k] = (ewma, ewvar, n + 1)
        g_ewma, g_z, g_flag = got[(k, ts)]
        assert g_ewma == pytest.approx(ewma, rel=1e-12)
        assert g_flag == exp[1]
        if exp[0] is None:
            assert g_z is None
        else:
            assert g_z == pytest.approx(exp[0], rel=1e-12)


_asof_data = st.tuples(
    # left rows: (key, ts) — duplicates allowed
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
    # right rows: (key, ts, value) — unique (key, ts) enforced below so the
    # match is well-defined (the operator picks "a" right row at ties among
    # identical timestamps; the contract only fixes WHICH timestamp wins)
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 100),
                  st.integers(-5, 5)),
        min_size=0, max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.one_of(st.none(), st.integers(0, 20)),
)


def _asof_ref(left, right, direction, tol):
    """Python reference for asof_join on integer timestamps."""
    out = []
    for k, lt in left:
        cands = [(rt, v) for rk, rt, v in right if rk == k]
        back = max(((rt, v) for rt, v in cands if rt <= lt), default=None)
        fwd = min(((rt, v) for rt, v in cands if rt >= lt), default=None)
        if direction == "backward":
            m = back
        elif direction == "forward":
            m = fwd
        elif back is None:
            m = fwd
        elif fwd is None:
            m = back
        else:  # nearest: ties -> backward (pandas merge_asof convention)
            m = back if (lt - back[0]) <= (fwd[0] - lt) else fwd
        if m is not None and tol is not None:
            gap = (lt - m[0]) if m[0] <= lt else (m[0] - lt)
            if direction == "nearest":
                gap = abs(lt - m[0])
            if gap > tol:
                m = None
        out.append((k, lt, None if m is None else m[1]))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2]))


@_few
@given(data=_asof_data)
def test_asof_join_matches_reference_all_directions(spark, data):
    import pyspark.sql.functions as F

    left, right, direction, tol = data
    ldf = spark.createDataFrame(left, "k STRING, ts LONG")
    rdf = spark.createDataFrame(right, "k STRING, ts LONG, v LONG")
    got = ldf.transform(
        t("asof_join", right=rdf, on=["k"], left_ts="ts",
          direction=direction,
          tolerance=None if tol is None else F.lit(tol))
    ).select("k", "ts", "v_matched").collect()
    got_rows = sorted(
        ((r["k"], r["ts"], r["v_matched"]) for r in got),
        key=lambda r: (r[0], r[1], r[2] is None, r[2]),
    )
    assert got_rows == _asof_ref(left, right, direction, tol)


_sessions = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), st.integers(0, 500)),
    min_size=1, max_size=40,
)


def _session_ref(rows, gap_s):
    """Reference sessionization: per key, sorted events; a new session
    starts when ts - prev_ts > gap. Spark's session_window treats the
    session end as an INCLUSIVE merge boundary — an event landing exactly
    at prev+gap extends the session (verified against session_window and
    pinned by the dp31 oracle, which marks new sessions with `> gap`)."""
    out = []
    for key in sorted({k for k, _ in rows}):
        ts = sorted(s for k, s in rows if k == key)
        start, prev, n = ts[0], ts[0], 1
        for s in ts[1:]:
            if s - prev > gap_s:
                out.append((key, start, prev + gap_s, n))
                start, n = s, 0
            prev = s
            n += 1
        out.append((key, start, prev + gap_s, n))
    return sorted(out)


@_few
@given(rows=_sessions)
def test_sessionize_matches_reference_split(spark, rows):
    gap_s = 60
    df = spark.createDataFrame(
        [(k, s) for k, s in rows], "k STRING, sec LONG"
    ).selectExpr("k", "timestamp_seconds(sec) AS ts")
    got = sorted(
        (
            r["k"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in df.transform(
            t("sessionize", on=["k"], ts_col="ts", gap="60 seconds")
        ).collect()
    )
    assert got == _session_ref(rows, gap_s)


_zorder_rows = st.lists(
    st.tuples(st.integers(-(10**12), 10**12), st.integers(-(10**6), 10**6)),
    min_size=2,
    max_size=60,
    unique=True,
)


@_few
@given(rows=_zorder_rows, method=st.sampled_from(["minmax", "rank"]))
def test_zorder_bucket_monotone_per_dimension(spark, rows, method):
    """For BOTH quantization methods, each dimension's extracted bucket is
    non-decreasing in the dimension's value (order preservation is what
    makes min/max file skipping sound), and the interleave keeps each
    dimension's bits disjoint (corner keys recover their buckets)."""
    data = [(i, x, y) for i, (x, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id LONG, x LONG, y LONG")
    out = df.transform(
        t("layout_zorder", cols=["x", "y"], bits_per_col=8, method=method,
          sort=False)
    )
    got = {r["id"]: r["zorder_key"] for r in out.collect()}

    def dim(z, ci):
        return sum(((z >> (j * 2 + ci)) & 1) << j for j in range(8))

    xs = sorted((x, i) for i, (x, y) in enumerate(rows))
    # x strictly sorted -> buckets non-decreasing
    bx = [dim(got[i], 0) for _, i in xs]
    assert bx == sorted(bx), (method, bx)
    ys = sorted((y, i) for i, (_, y) in enumerate(rows))
    by = [dim(got[i], 1) for _, i in ys]
    assert by == sorted(by), (method, by)
    assert all(0 <= b <= 255 for b in bx + by)


_wp_words = st.lists(
    st.text(alphabet="abcdex#", min_size=1, max_size=10).filter(
        lambda w: not w.startswith("#")
    ),
    min_size=1,
    max_size=12,
)
_wp_vocab = st.sets(
    st.one_of(
        st.text(alphabet="abcdex", min_size=1, max_size=3),
        st.text(alphabet="abcdex", min_size=1, max_size=3).map(
            lambda p: "##" + p
        ),
    ),
    min_size=1,
    max_size=25,
)


@given(words=_wp_words, vocab=_wp_vocab)
@_few
def test_wordpiece_reconstructs_or_unks(spark, words, vocab):
    """For every document: each word's pieces either concatenate (modulo
    the ## prefix) back to the word EXACTLY, or the word is the single
    [UNK]; piece counts are consistent; and the Spark result equals the
    pure-Python scanner on every word."""
    from lakehouse_engine_spark.datapipes.bpe import wordpiece_py

    text = " ".join(words)
    vdf = spark.createDataFrame([(p,) for p in sorted(vocab)], "piece STRING")
    row = (
        spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
        .transform(t("wordpiece_encode", vocab=vdf))
        .collect()[0]
    )
    got = row["wp_tokens"]
    expect = []
    for w in words:
        expect.extend(wordpiece_py(w, vocab))
    assert got == expect
    # reconstruction property, word by word
    i = 0
    for w in words:
        ref = wordpiece_py(w, vocab)
        seg = got[i:i + len(ref)]
        i += len(ref)
        if seg == ["[UNK]"]:
            continue
        assert "".join(p[2:] if p.startswith("##") else p for p in seg) == w


_gopher_docs = st.lists(
    st.text(
        alphabet="ab #.\n…-*x",
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=_gopher_docs)
@_few
def test_gopher_flags_match_python_reference(spark, texts):
    """Every Gopher flag equals a direct Python evaluation of the stated
    integer cross-multiplication semantics on adversarial text soup
    (bullets, ellipses, hashes, unicode ellipsis, newlines)."""
    import re

    rows = [(i, s) for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r
        for r in df.transform(t("text_gopher_rules", min_words=2)).collect()
    }
    for i, s in rows:
        wtoks = [w for w in re.split(r"\s+", s.strip()) if w]
        n_words = len(wtoks)
        sum_wl = sum(len(w) for w in wtoks)
        lines = [l for l in s.split("\n") if l.strip()]
        n_lines = len(lines)
        n_sym = s.count("#") + len(re.findall(r"(\.\.\.|…)", s))
        bullets = sum(
            1 for l in lines if re.match(r"^[-*•]", l.lstrip())
        )
        ells = sum(
            1 for l in lines if re.search(r"(\.\.\.|…)$", l.rstrip())
        )
        alpha = sum(1 for w in wtoks if re.search("[A-Za-z]", w))
        r = got[i]
        assert r["rule_word_count"] == (2 <= n_words <= 100_000)
        assert r["rule_mean_word_len"] == (
            n_words > 0 and 3 * n_words <= sum_wl <= 10 * n_words
        )
        assert r["rule_symbol_ratio"] == (1000 * n_sym <= 100 * n_words)
        assert r["rule_bullet_lines"] == (1000 * bullets <= 900 * n_lines)
        assert r["rule_ellipsis_lines"] == (1000 * ells <= 300 * n_lines)
        assert r["rule_alpha_words"] == (1000 * alpha >= 800 * n_words)


_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0,
    max_size=60,
)


@_few
@given(edges=_edges)
def test_connected_components_matches_union_find_property(spark, edges):
    """graph_connected_components == union-find min-labels on arbitrary
    random multigraphs (self-loops, duplicates, reversed edges included),
    with all touched nodes present in the output exactly once."""
    nodes = sorted({n for e in edges for n in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    ref = {n: min(ms) for ms in comp.values() for n in ms}

    if not edges:
        df = spark.createDataFrame([], "src LONG, dst LONG")
    else:
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["node"]: r["component"]
        for r in df.transform(t("graph_connected_components")).collect()
    }
    assert got == ref


_corpus = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
             min_size=0, max_size=12),
    min_size=1,
    max_size=25,
)


@_few
@given(docs=_corpus, support=st.sampled_from([0.05, 0.2, 0.5]))
def test_frequent_terms_exact_filter_property(spark, docs, support):
    """text_frequent_terms output == the exact {term: count >= ceil(s*N)}
    filter for arbitrary corpora and supports — the MG candidate pass is
    invisible when correct (superset + exact recount)."""
    from collections import Counter

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(3)
    cnt = Counter(w for ws in docs for w in ws)
    total = sum(cnt.values())
    ref = (
        {w: c for w, c in cnt.items() if c >= math.ceil(support * total)}
        if total
        else {}
    )
    got = {
        r["term"]: r["n"]
        for r in df.transform(
            t("text_frequent_terms", min_support=support)
        ).collect()
    }
    assert got == ref


_vec_corpus = st.lists(
    st.lists(
        st.floats(-2.0, 2.0, allow_nan=False, allow_infinity=False),
        min_size=3,
        max_size=3,
    ),
    min_size=3,
    max_size=20,
)


@_few
@given(
    bits=st.integers(1, 6),
    pts=st.lists(
        st.tuples(st.integers(0, 63), st.integers(0, 63)),
        min_size=1,
        max_size=30,
    ),
)
def test_hilbert_matches_xy2d_property(spark, bits, pts):
    """layout_hilbert == the classic xy2d recursion for random grid
    points at random curve orders (coordinates reduced mod 2^bits; the
    dims span the full bucket range via an injected corner point so the
    minmax quantization is the identity)."""

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 1 << bits
    pts = [(x % n, y % n) for x, y in pts] + [(0, 0), (n - 1, n - 1)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id LONG, x LONG, y LONG"
    )
    got = {
        r["id"]: r["hilbert_key"]
        for r in df.transform(
            t("layout_hilbert", cols=["x", "y"], bits_per_col=bits, sort=False)
        ).collect()
    }
    assert got == {i: xy2d(n, x, y) for i, (x, y) in enumerate(pts)}


@_few
@given(vecs=_vec_corpus)
def test_pca_projection_invariants(spark, vecs):
    """embedding_pca invariants on arbitrary 3-dim corpora: projections
    are centered, per-component variances are non-increasing, and total
    projected variance never exceeds the input's total variance (energy
    conservation under an orthonormal projection of centered data)."""
    import numpy as np

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = df.transform(t("embedding_pca", n_components=3)).collect()
    P = np.array([r["pca"] for r in out])
    assert np.abs(P.mean(axis=0)).max() < 1e-9
    var = P.var(axis=0, ddof=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))
    q = np.floor(np.array(vecs) * 1024 + 0.5) / 1024
    total_in = q.var(axis=0, ddof=0).sum()
    assert var.sum() <= total_in + 1e-9


_batch_rows = st.lists(
    st.one_of(
        # clean int64 rows, including magnitudes past 2^53 where a
        # float64 round-trip would silently round
        st.lists(
            st.integers(-(2**62), 2**62), min_size=3, max_size=3
        ),
        # dirty rows: a null element (object path) or NaN (float path)
        st.lists(
            st.integers(-100, 100), min_size=3, max_size=3
        ).map(lambda v: [v[0], None, v[2]]),
        st.lists(
            st.integers(-100, 100), min_size=3, max_size=3
        ).map(lambda v: [float(v[0]), float("nan"), float(v[2])]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=50, deadline=None)
@given(rows=_batch_rows)
def test_clean_int_rows_exact_past_2_53(rows):
    """_clean_int_rows (the shared kmeans/PQ dirty-batch router) must
    return EXACT int64 values for every clean row — even when a dirty
    row in the same Arrow batch would have promoted the stacked matrix
    to float64 (rounding magnitudes past 2^53) — and a keep-mask that
    flags exactly the rows containing a null/NaN element."""
    import numpy as np

    from lakehouse_engine_spark.datapipes.clustering import _clean_int_rows

    def is_clean(row):
        return all(
            x is not None and not (isinstance(x, float) and math.isnan(x))
            for x in row
        )

    # mimic the Arrow delivery: per-row ndarrays inside an object array
    arr = np.empty(len(rows), dtype=object)
    for i, row in enumerate(rows):
        if is_clean(row):
            arr[i] = np.array(row, dtype=np.int64)
        else:
            arr[i] = np.array(row, dtype=object)
    X, good = _clean_int_rows(arr)
    clean = [row for row in rows if is_clean(row)]
    if good is None:
        assert len(rows) == len(clean)
    else:
        assert list(good) == [is_clean(row) for row in rows]
    assert X.dtype == np.int64 or len(X) == 0
    assert [[int(x) for x in r] for r in X] == [
        [int(x) for x in row] for row in clean
    ]


# ---------------------------------------------------------------------------
# round-11 continuation ops: linear_fit_normal vs numpy lstsq,
# event_pattern_match vs Python re, winnowing guarantee
# ---------------------------------------------------------------------------

_designs = st.lists(
    st.tuples(
        st.integers(0, 50), st.integers(0, 50), st.integers(-20, 20)
    ),
    min_size=8,
    max_size=60,
)


@_few
@given(rows=_designs)
def test_linear_fit_matches_numpy_lstsq(spark, rows):
    """OLS weights (l2=0) from the exact-moment Cramer solve must agree
    with numpy's lstsq on any (possibly collinear) random integer
    design; collinear designs yield NULLs instead of garbage."""
    import numpy as np

    df = spark.createDataFrame(
        [(float(a), float(b), 1.0 + 2.0 * a - b + 0.5 * c) for a, b, c in rows],
        "x1 DOUBLE, x2 DOUBLE, y DOUBLE",
    )
    got = df.transform(
        t("linear_fit_normal", feature_cols=["x1", "x2"], y_col="y")
    ).first()
    X = np.array([[1.0, a, b] for a, b, _ in rows])
    yv = np.array([1.0 + 2.0 * a - b + 0.5 * c for a, b, c in rows])
    # rank-deficient (constant column / collinear) -> operator must NULL
    if np.linalg.matrix_rank(X.T @ X) < 3:
        assert got["w0"] is None
        return
    ref, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert got["w0"] == pytest.approx(ref[0], abs=1e-6)
    assert got["w1"] == pytest.approx(ref[1], abs=1e-6)
    assert got["w2"] == pytest.approx(ref[2], abs=1e-6)


_event_seqs = st.lists(
    st.sampled_from(["view", "click", "purchase", "error"]),
    min_size=1,
    max_size=60,
)


@_few
@given(seq=_event_seqs)
def test_event_pattern_matches_python_re(spark, seq):
    """n_matches/first_match must equal Python re on the folded symbol
    string — Java and Python regex agree on this operator's
    symbol-alphabet pattern class."""
    import datetime as dt
    import re

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, T0 + dt.timedelta(minutes=i), i, ev) for i, ev in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING"
    )
    got = df.transform(
        t("event_pattern_match", on=["user_id"],
          symbols={"view": "v", "click": "c", "purchase": "p", "error": "e"},
          pattern="vc*p", tiebreak_col="event_id")
    ).first()
    s = "".join({"view": "v", "click": "c", "purchase": "p", "error": "e"}[e] for e in seq)
    ms = list(re.finditer("vc*p", s))
    assert got["seq"] == s
    assert got["n_matches"] == len(ms)
    assert got["first_match"] == (ms[0].group(0) if ms else None)


_texts = st.text(alphabet="abc xyz.,", min_size=0, max_size=80)


@_few
@given(a=_texts, b=_texts, shared=st.text(alphabet="abcxyz", min_size=8, max_size=16))
def test_winnow_guarantee_shared_run_shares_fingerprint(spark, a, b, shared):
    """The winnowing guarantee: two docs containing the same >= w+k-1
    normalized-char run (k=5, w=4 -> 8 chars) share at least one
    fingerprint VALUE."""
    df = spark.createDataFrame(
        [(0, a + " " + shared + " " + b), (1, b + "! " + shared + ". " + a)],
        "doc_id INT, text STRING",
    )
    rows = df.transform(t("text_winnow_fingerprint", k=5, window=4)).collect()
    f0 = {r["fp"] for r in rows if r["doc_id"] == 0}
    f1 = {r["fp"] for r in rows if r["doc_id"] == 1}
    assert f0 & f1


_para_docs = st.lists(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=5),
    min_size=1,
    max_size=12,
)


@_few
@given(docs=_para_docs)
def test_paragraph_dedup_reassembly_identity(spark, docs):
    """With globally-unique paragraphs (disjoint token vocabularies per
    paragraph), nothing dedups and every document reassembles to its
    exact original text — the reconstruction path is lossless."""
    rows = []
    uid = 0
    for i, paras in enumerate(docs):
        text = "\n".join(
            " ".join(f"tok{uid * 100 + j}" for j in range(6))
            for uid in range(uid, uid + len(paras))
        )
        uid += len(paras)
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["doc_id"]: r
        for r in df.transform(t("text_paragraph_dedup")).collect()
    }
    for i, text in rows:
        assert out[i]["text_dedup"] == text
        assert out[i]["n_kept"] == out[i]["n_paragraphs"]


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abc XY.!?{}\n\r\t\"'–…") + ["п", "р", "и", "好", "世", "ひ"]
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=25,
)


def _c4_ref(texts, min_line_words, min_sentences):
    """Reference model of text_c4_rules' line retention + page flags."""
    import re

    out = []
    for txt in texts:
        t_ = txt or ""
        kept = []
        for line in t_.split("\n"):
            r = line.rstrip()
            words = [w for w in re.split(r"\s+", line.strip()) if w]
            if (
                r[-1:] in (".", "!", "?", '"', "”", "'")
                and len(words) >= min_line_words
                and "javascript" not in line.lower()
            ):
                kept.append(line)
        cleaned = "\n".join(kept)
        out.append(
            (
                len(kept),
                len(re.findall(r"[.!?]", cleaned)) >= min_sentences,
                "{" not in t_,
                "lorem ipsum" not in t_.lower(),
            )
        )
    return out


@_few
@given(texts=_texts)
def test_c4_rules_matches_reference_model(spark, texts):
    rows = [(i, txt) for i, txt in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {
        r["doc_id"]: (
            r["n_lines_kept"], r["rule_sentences"],
            r["rule_no_brace"], r["rule_no_lorem"],
        )
        for r in df.transform(
            t("text_c4_rules", min_line_words=2, min_sentences=1)
        ).collect()
    }
    ref = _c4_ref(texts, 2, 1)
    for i, expected in enumerate(ref):
        assert got[i] == expected, (i, texts[i])


_RANGES = [
    ("latin", (0x41, 0x5A), (0x61, 0x7A)),
    ("cyrillic", (0x0400, 0x04FF)),
    ("greek", (0x0370, 0x03FF)),
    ("arabic", (0x0600, 0x06FF)),
    ("hebrew", (0x0590, 0x05FF)),
    ("devanagari", (0x0900, 0x097F)),
    ("cjk", (0x4E00, 0x9FFF)),
    ("hangul", (0xAC00, 0xD7A3)),
    ("kana", (0x3040, 0x30FF)),
]


def _script_ref(txt):
    counts = {}
    for name, *spans in _RANGES:
        counts[name] = sum(
            1 for ch in (txt or "")
            if any(lo <= ord(ch) <= hi for lo, hi in spans)
        )
    total = sum(counts.values())
    mx = max(counts.values()) if total else 0
    dominant = next(
        (n for n, *_ in _RANGES if mx > 0 and counts[n] == mx), ""
    )
    permille = math.floor(1000 * (total - mx) / total) if total else 0
    return counts, total, dominant, permille


@_few
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",),
                max_codepoint=0xD7A3,
            ),
            max_size=50,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_script_mix_matches_reference_model(spark, texts):
    rows = [(i, txt) for i, txt in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r for r in df.transform(t("text_script_mix")).collect()}
    for i, txt in enumerate(texts):
        counts, total, dominant, permille = _script_ref(txt)
        r = out[i]
        for name, *_ in _RANGES:
            assert r[f"script_{name}"] == counts[name], (i, name, txt)
        assert r["script_chars"] == total
        assert r["script_dominant"] == dominant, (i, txt)
        assert r["script_mix_permille"] == permille
