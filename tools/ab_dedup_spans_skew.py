"""Interleaved A/B: remove_duplicate_spans window form (r04) vs the
skew-proof agg+AQE-join form (r05), on (a) the sf0.1 documents corpus
and (b) a synthetic hot-gram stress where one 8-gram occupies ~25% of
all gram positions. Run from /root/repo."""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feast_spark.pipeline.dedup_text import (
    _span_grams,
    _span_scrub_output,
    _span_words_base,
)
from feast_spark.session import get_spark


def span_dedup(df, form: str, ngram=8, min_count=2):
    base = _span_words_base(df, "text")
    grams = _span_grams(base, "doc_id", ngram)
    if form == "agg_join_persist":
        grams = grams.persist()
        form = "agg_join"
    if form == "window":
        w = Window.partitionBy("gh")
        marked = (
            grams.withColumn("c", F.count(F.lit(1)).over(w))
            .withColumn("first", F.min(F.struct(F.col("__id"), F.col("pos"))).over(w))
            .filter(F.col("c") >= min_count)
        )
    else:
        stats = (
            grams.groupBy("gh")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min(F.struct(F.col("__id"), F.col("pos"))).alias("first"),
            )
            .filter(F.col("c") >= min_count)
        )
        marked = grams.join(stats, "gh", "inner")
    marked = marked.filter(
        ~((F.col("__id") == F.col("first.__id")) & (F.col("pos") == F.col("first.pos")))
    )
    return _span_scrub_output(
        base, marked, "doc_id", ngram, span_count_col="n_dup_spans", out_col="out"
    )


def bench(df, form, runs=5):
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        span_dedup(df, form).write.format("noop").mode("overwrite").save()
        samples.append(time.monotonic() - t0)
    return samples


def main():
    spark = get_spark("ab_dedup_spans", parallelism=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    # hot-gram stress: 200k docs, 25% are "hot boiler " * 3 + unique tail
    hot = (
        spark.range(200_000)
        .withColumn(
            "text",
            F.when(
                F.col("id") % 4 == 0,
                F.concat(
                    F.lit("alpha beta gamma delta epsilon zeta eta theta "),
                    F.lit("alpha beta gamma delta epsilon zeta eta theta "),
                    F.col("id").cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("unique words only here "),
                    F.md5(F.col("id").cast("string")),
                    F.lit(" "),
                    F.md5((F.col("id") + 1).cast("string")),
                    F.lit(" trailing tail words one two three four five"),
                )
            ),
        )
        .withColumn("doc_id", F.col("id").cast("string"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )

    for label, frame in (("sf0.1_docs", docs), ("hot_gram_stress", hot)):
        res = {"window": [], "agg_join": [], "agg_join_persist": []}
        # warmup both
        for form in res:
            span_dedup(frame, form).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        for _ in range(5):  # interleaved alternation
            for form in res:
                t0 = time.monotonic()
                span_dedup(frame, form).write.format("noop").mode("overwrite").save()
                res[form].append(time.monotonic() - t0)
                spark.catalog.clearCache()
        for form, s in res.items():
            print(
                f"{label:17s} {form:9s} median={statistics.median(s):6.2f}s "
                f"min={min(s):6.2f}s runs={[round(x,2) for x in s]}"
            )


if __name__ == "__main__":
    main()
