"""Stage-level wall profile of the streaming span-cut ingest (the
`streaming_span_cut_corpus` contract query) at an arbitrary SF dir.

Runs the same two-batch lifecycle but times each sub-step by forcing
materialization boundaries the real path also has (writes / isEmpty).
Usage: python tools/profile_ingest.py [sf_dir]
"""
import atexit
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from ig_etl_sync_spark.session import get_spark  # noqa: E402
from ig_etl_sync_spark.operators.dedup import (  # noqa: E402
    MinhashDedupIndex,
    exact_dedup,
    near_dup_pairs_minhash,
)
from ig_etl_sync_spark.operators.textops import normalized_text  # noqa: E402
from ig_etl_sync_spark.sources.catalog import load_table  # noqa: E402
from ig_etl_sync_spark.sources.versioned import (  # noqa: E402
    assert_epoch_replay,
    make_table,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_ingest")
spark.sparkContext.setLogLevel("ERROR")

root = tempfile.mkdtemp(prefix="profile_ingest_")
atexit.register(shutil.rmtree, root, ignore_errors=True)

docs = load_table(spark, sf_dir, "documents")
b1 = docs.where(F.col("source") != "src0").select("doc_id", "text")
b2 = docs.where(F.col("source") == "src0").select("doc_id", "text")

idx = MinhashDedupIndex(spark, f"{root}/idx", backend="txnlog")
corpus = make_table(spark, f"{root}/corpus", "txnlog")
from ig_etl_sync_spark.operators.spans import SpanDupIndex  # noqa: E402

span_idx = SpanDupIndex(spark, f"{root}/spans", backend="txnlog", k=8, min_docs=2)

T = [time.time()]


def tick(label):
    now = time.time()
    print(f"  {label:<28s} {now - T[0]:6.2f}s")
    T[0] = now


for bid, batch in ((0, b1), (1, b2)):
    print(f"batch {bid}:")
    id_col, text_col = idx.id_col, idx.text_col
    b = exact_dedup(
        batch.withColumn("_fp", F.md5(normalized_text(F.col(text_col)))),
        keys=["_fp"],
        tiebreak=[id_col],
    ).drop("_fp")
    pairs = near_dup_pairs_minhash(
        b, id_col, text_col, idx.num_hashes, idx.bands, idx.shingle_k, 0.7
    )
    pairs = pairs.cache()
    pairs.count()
    tick("in-batch exact+minhash")
    b = b.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    hits = idx.probe(b, threshold=0.7).cache()
    hits.count()
    tick("index probe")
    b = b.join(
        hits.where(F.col("new_id") != F.col("ref_id"))
        .select(F.col("new_id").alias(id_col))
        .distinct(),
        id_col,
        "left_anti",
    )
    cur = corpus.read()
    if cur is not None:
        b = b.join(cur.select(id_col), id_col, "left_anti")
    b = shared = b.cache()
    empty = b.isEmpty()
    tick("filters + isEmpty")
    if empty:
        shared.unpersist(blocking=False)
        continue
    epoch = int(bid) + 1
    assert_epoch_replay(corpus, "cepoch", epoch, b, id_col)
    tick("epoch replay guard")
    idx.extend(b, epoch=epoch)
    tick("minhash index extend")
    sid, stext = span_idx.id_col, span_idx.text_col
    span_idx.extend(b, epoch=epoch)
    tick("span index extend")
    cut = (
        span_idx.probe(b)
        .where(F.col("covered_tokens") > 0)
        .select(F.col(sid), F.col("clean_text"))
    )
    b = (
        b.join(cut, sid, "left")
        .withColumn(stext, F.coalesce(F.col("clean_text"), F.col(stext)))
        .drop("clean_text")
    )
    corpus.write_incremental(
        b.withColumn("cepoch", F.lit(epoch).cast("int")), "cepoch", {str(epoch)}
    )
    tick("span probe + corpus write")
    shared.unpersist(blocking=False)

n = corpus.read().count()
tick("final corpus read")
print("corpus rows:", n)
