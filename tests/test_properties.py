"""Property-based tests (hypothesis) — beyond the reference's test
methodology (SURVEY.md §5: "no property-based testing"). Each property
runs a batch of generated inputs through the real Spark expressions and
checks an independent Python model or an algebraic invariant."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.functions.distance import EARTH_RADIUS_KM, haversine_km

_SETTINGS = dict(max_examples=10, deadline=None)


def _py_day_part(hour: int, minute: int) -> str:
    hhmm = f"{hour * 100 + minute:04d}"
    if "0500" <= hhmm <= "1159":
        return "morning"
    if "1200" <= hhmm <= "1659":
        return "afternoon"
    if "1700" <= hhmm <= "2059":
        return "evening"
    return "night"


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 23), st.integers(0, 59)), min_size=1, max_size=40))
def test_day_part_binning_matches_python_model(spark, times):
    from pyspark_big_data_spark.queries.q2_time_bins import _day_part

    df = spark.createDataFrame(times, ["h", "m"])
    hhmm = F.lpad((F.col("h") * 100 + F.col("m")).cast("string"), 4, "0")
    got = df.select("h", "m", _day_part(hhmm).alias("bin")).collect()
    for r in got:
        assert r["bin"] == _py_day_part(r["h"], r["m"])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(-85, 85), st.floats(-180, 180), st.floats(-85, 85), st.floats(-180, 180)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_haversine_invariants(spark, coords):
    df = spark.createDataFrame(coords, ["la1", "lo1", "la2", "lo2"])
    d12 = haversine_km(F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2"))
    d21 = haversine_km(F.col("la2"), F.col("lo2"), F.col("la1"), F.col("lo1"))
    d11 = haversine_km(F.col("la1"), F.col("lo1"), F.col("la1"), F.col("lo1"))
    rows = df.select(d12.alias("d12"), d21.alias("d21"), d11.alias("d11")).collect()
    for r in rows:
        assert 0.0 <= r["d12"] <= math.pi * EARTH_RADIUS_KM + 1e-6
        assert abs(r["d12"] - r["d21"]) < 1e-9  # symmetry
        assert r["d11"] < 1e-9  # identity


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=" aAbB\t.", min_size=0, max_size=30), min_size=1, max_size=30))
def test_normalize_idempotent_and_fingerprint_ws_invariant(spark, texts):
    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, ["t"])
    out = df.select(
        TX.normalize_text(F.col("t")).alias("n1"),
        TX.normalize_text(TX.normalize_text(F.col("t"))).alias("n2"),
        TX.fingerprint(F.col("t")).alias("f1"),
        TX.fingerprint(F.concat(F.lit("  "), F.col("t"), F.lit(" \t"))).alias("f2"),
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"]  # idempotent
        assert r["f1"] == r["f2"]  # whitespace-invariant fingerprint


def test_minhash_identical_docs_estimate_one(spark):
    from pyspark_big_data_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different string of words here")],
        ["doc_id", "text"],
    )
    sigs = DD.minhash_signatures(DD.shingles(docs))
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in DD.estimated_jaccard(cand, sigs).collect()}
    assert est[(1, 2)] == 1.0
    assert est[(1, 3)] < 0.5


@given(
    st.binary(min_size=0, max_size=400),
    st.integers(1, 12),
    st.integers(1, 12),
)
def test_stub_resize_properties(payload, w, h):
    from pyspark_big_data_spark.operators.multimodal import _stub_resize

    out = _stub_resize(payload, w, h)
    assert len(out) == w * h  # exact target size for ANY input
    if payload:
        # nearest-neighbor sampling: every output byte exists in the input,
        # and the index map is monotone (order-preserving resample)
        assert set(out) <= set(payload)
        idxs = [(i * len(payload)) // (w * h) for i in range(w * h)]
        assert idxs == sorted(idxs)
        assert out == bytes(payload[i] for i in idxs)


@given(st.binary(min_size=0, max_size=600), st.integers(1, 64), st.integers(1, 5))
def test_frame_splitter_partition_properties(payload, frame_bytes, every):
    # the default splitter must tile the payload exactly: concatenating
    # all frames reproduces it, and sampled indices step by `every`
    frames = [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)] or [b""]
    assert b"".join(frames) == payload
    kept = list(range(0, len(frames), every))
    assert kept[0] == 0 and all(b - a == every for a, b in zip(kept, kept[1:]))


@settings(**_SETTINGS)
@given(
    st.lists(st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=20),
    st.lists(st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=20),
)
def test_hashed_doc_vectors_are_additive(spark, toks_a, toks_b):
    """Feature-hash embedding is linear over token multisets: the vector
    of the concatenated document equals the sum of the parts' vectors
    (integer arithmetic, so equality is exact)."""
    from pyspark_big_data_spark.queries.embed_hash import hashed_doc_vectors

    a, b = " ".join(toks_a), " ".join(toks_b)
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, f"{a} {b}")], "doc_id long, text string"
    )
    vecs = {r["doc_id"]: list(r["embedding"]) for r in hashed_doc_vectors(df).collect()}
    assert vecs[3] == [x + y for x, y in zip(vecs[1], vecs[2])]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=200),
        min_size=1,
        max_size=10,
    )
)
def test_chunker_matches_python_model(spark, texts):
    """doc_chunk_overlap's chunk math vs an independent Python model on
    arbitrary generated text (empty docs, whitespace runs, short docs —
    the cases fixture corpora miss)."""
    import hashlib

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.queries.corpus_ops import CHUNK_STRIDE, CHUNK_W

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    toks_df = df.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    n_chunks = (
        F.ceil(
            F.greatest(F.size("toks") - CHUNK_W, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        ).cast("long")
        + 1
    )
    spans = toks_df.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no")
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_no") * CHUNK_STRIDE + 1, CHUNK_W)
    got = {
        (r["doc_id"], r["chunk_no"]): (r["n"], r["md5"])
        for r in spans.select(
            "doc_id",
            "chunk_no",
            F.size(chunk).alias("n"),
            F.md5(F.concat_ws(" ", chunk)).alias("md5"),
        ).collect()
    }

    # independent Python model (normalize + split the same way)
    import math
    import re

    want = {}
    for doc_id, text in enumerate(texts):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        nc = math.ceil(max(len(toks) - CHUNK_W, 0) / CHUNK_STRIDE) + 1
        for c in range(nc):
            piece = toks[c * CHUNK_STRIDE : c * CHUNK_STRIDE + CHUNK_W]
            want[(doc_id, c)] = (
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    assert got == want


# ---------------------------------------------------------------------------
# Mutation operators vs a driver-side dict model
# ---------------------------------------------------------------------------

_ops = st.lists(
    st.lists(
        st.tuples(st.integers(0, 6), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=4,
        unique_by=lambda kv: kv[0],  # upsert contract: one row per key
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(_ops)
def test_upsert_sequence_matches_dict_model(spark, tmp_path_factory, batches):
    """Any sequence of keyed upsert batches must leave the dataset equal
    to a plain dict replay (last batch wins per key, inserts appear)."""
    from pyspark_big_data_spark.operators.upsert import upsert_parquet

    root = str(tmp_path_factory.mktemp("upsert_prop"))
    path = f"{root}/ds"
    model: dict[int, float] = {0: 0.0, 1: 1.0}
    spark.createDataFrame(list(model.items()), "k long, x double").write.mode(
        "overwrite"
    ).parquet(path)
    for batch in batches:
        stats = upsert_parquet(
            spark, path, spark.createDataFrame(batch, "k long, x double"), "k"
        )
        before = len(model)
        model.update(dict(batch))
        assert stats["total"] == len(model)
        assert stats["inserted"] == len(model) - before
    got = {(r["k"], r["x"]) for r in spark.read.parquet(path).collect()}
    assert got == set(model.items())


@settings(max_examples=5, deadline=None)
@given(_ops)
def test_versioned_chain_matches_list_model(spark, tmp_path_factory, batches):
    """Every committed version must replay exactly its snapshot at
    commit time, regardless of how many versions follow."""
    from pyspark_big_data_spark.operators.versioned import (
        read_version,
        write_version,
    )

    root = str(tmp_path_factory.mktemp("versioned_prop"))
    snapshots = []
    for i, batch in enumerate(batches):
        assert write_version(
            spark.createDataFrame(batch, "k long, x double"), root
        ) == i
        snapshots.append(set(batch))
    for i, snap in enumerate(snapshots):
        got = {(r["k"], r["x"]) for r in read_version(spark, root, i).collect()}
        assert got == snap


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 9), st.floats(-50, 50, allow_nan=False)),
             min_size=1, max_size=30),
    st.lists(st.integers(0, 9), min_size=1, max_size=10, unique=True),
)
def test_salted_join_equals_plain_join(spark, rows, dim_keys):
    """salted_join must be semantics-invisible for any data: identical
    row multiset to the plain equi-join, for every salt width."""
    from pyspark_big_data_spark.operators.joins import salted_join

    facts = spark.createDataFrame(rows, "k long, x double")
    dim = spark.createDataFrame([(k, f"d{k}") for k in dim_keys], "k long, name string")
    plain = sorted((r["k"], r["x"], r["name"]) for r in facts.join(dim, "k").collect())
    for n_salts in (1, 4):
        got = sorted(
            (r["k"], r["x"], r["name"])
            for r in salted_join(facts, dim, "k", num_salts=n_salts).collect()
        )
        assert got == plain


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.booleans()), min_size=1, max_size=20))
def test_read_evolved_null_fills_missing_columns(spark, tmp_path_factory, rows):
    """Any mix of old-schema and new-schema files must read back merged
    with typed nulls exactly where the old generation lacked the column."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pyspark_big_data_spark.io import read_evolved

    root = str(tmp_path_factory.mktemp("evolve_prop"))
    old_rows = [(k,) for k, new in rows if not new]
    new_rows = [(k, f"v{k}") for k, new in rows if new]
    wrote = False
    if old_rows:
        spark.createDataFrame(old_rows, "k long").write.mode("append").parquet(root)
        wrote = True
    if new_rows:
        spark.createDataFrame(new_rows, "k long, extra string").write.mode(
            "append"
        ).parquet(root)
        wrote = True
    assert wrote
    canonical = StructType(
        [StructField("k", LongType()), StructField("extra", StringType())]
    )
    key = lambda t: (t[0], t[1] is not None, t[1] or "")  # noqa: E731
    got = sorted(
        ((r["k"], r["extra"]) for r in read_evolved(spark, root, canonical).collect()),
        key=key,
    )
    want = sorted([(k, None) for (k,) in old_rows] + new_rows, key=key)
    assert got == want
