"""Property-based tests (hypothesis) for operator invariants, plus
skew-handling operator equivalence checks."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import dedup as dedup_ops
from delta_lake_gcp_implementation_spark.operators import joins as join_ops

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),          # key
        st.integers(min_value=0, max_value=50),        # version
        st.text(alphabet="abc", min_size=0, max_size=4),  # payload
    ),
    min_size=1,
    max_size=25,
)


@_slow
@given(rows=rows_strategy)
def test_keep_latest_is_argmax_per_key(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v", "p"])
    out = dedup_ops.keep_latest(
        df, ["k"], "v", [F.col("p").desc()]
    ).collect()
    # exactly one row per key present in the input
    assert len(out) == len({r[0] for r in rows})
    for r in out:
        cands = [(v, p) for (k, v, p) in rows if k == r.k]
        best = max(cands, key=lambda t: (t[0], t[1]))
        assert (r.v, r.p) == best


@_slow
@given(rows=rows_strategy)
def test_keep_first_version_unique_keys(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v", "p"])
    out = dedup_ops.keep_first_version(df, ["k", "v"]).collect()
    keys = [(r.k, r.v) for r in out]
    assert len(keys) == len(set(keys)) == len({(k, v) for (k, v, _) in rows})


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=30),
        min_size=2, max_size=6, unique=True,
    )
)
def test_jaccard_bounds_and_identity(spark, texts):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # identical doc pair always scores 1.0; all scores within [0, 1]
    dup = spark.createDataFrame(
        rows + [(len(rows), texts[0])], ["doc_id", "text"]
    )
    out = dedup_ops.ngram_jaccard_pairs(
        dup, "text", "doc_id", k=2, threshold=0.0
    ).collect()
    for r in out:
        assert -1e-12 <= r.jaccard <= 1 + 1e-12
    pair = [r for r in out if (r.id_a, r.id_b) == (0, len(rows))]
    if texts[0].strip():  # empty text has an empty shingle set
        assert pair and abs(pair[0].jaccard - 1.0) < 1e-12


def test_salted_join_equals_plain_join(spark):
    import random

    rng = random.Random(7)
    # skewed: 80% of rows share one key
    big = spark.createDataFrame(
        [("hot" if rng.random() < 0.8 else f"k{rng.randint(0, 9)}", i)
         for i in range(5000)],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k2", 3)], ["k", "dim"]
    )
    got = join_ops.salted_join(big, small, "k", n_salts=4)
    expect = big.join(small, "k")
    assert got.count() == expect.count()
    assert (
        got.groupBy("k").count().orderBy("k").collect()
        == expect.groupBy("k").count().orderBy("k").collect()
    )


def test_two_phase_aggregate_equals_plain(spark):
    import random

    rng = random.Random(11)
    df = spark.createDataFrame(
        [("hot" if rng.random() < 0.7 else f"k{rng.randint(0, 5)}",
          round(rng.uniform(1, 100), 2)) for i in range(3000)],
        ["k", "amount"],
    )
    got = {
        r.k: (r.cnt, r.total)
        for r in join_ops.two_phase_aggregate(df, "k", "amount", n_salts=4).collect()
    }
    expect = {
        r.k: (r.cnt, r.total)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("amount").cast("decimal(30,2)"))
            .cast("decimal(30,2)")
            .alias("total"),
        )
        .collect()
    }
    assert got == expect
    assert all(isinstance(v[1], Decimal) for v in got.values())


# ------------------------------------------------- pure-Python codecs


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    """BMP encode/decode is lossless for every (w, h), including the
    widths whose 3-byte rows need stride padding (w % 4 != 0)."""
    import numpy as np

    from delta_lake_gcp_implementation_spark.operators import codecs

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=4000),
    channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_any_shape(n, channels, rate, seed):
    import numpy as np

    from delta_lake_gcp_implementation_spark.operators import codecs

    s = np.random.default_rng(seed).integers(
        -32768, 32767, (n, channels), dtype=np.int16
    )
    got, got_rate = codecs.decode_wav(codecs.encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(got, s)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    k=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_segments_partition_samples(n, k, seed):
    """Segment sampling is a partition: re-decoded segments concatenate
    back to the original sample stream."""
    import numpy as np

    from delta_lake_gcp_implementation_spark.operators import codecs

    s = np.random.default_rng(seed).integers(-32768, 32767, (n, 1), dtype=np.int16)
    blob = codecs.encode_wav(s, 16000)
    parts = [codecs.decode_wav(b)[0] for b in codecs.wav_segments(blob, k)]
    assert np.array_equal(np.concatenate(parts), s)
