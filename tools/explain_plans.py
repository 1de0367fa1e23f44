"""Plan audit: prints formatted physical plans for the key operators and
greps for the properties that matter at 100 TB — predicate/column
pushdown into the parquet scan, broadcast joins on small sides, and
whole-stage codegen coverage. Run:  python tools/explain_plans.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gliner_spark.kernels.scorer import SOUP_LABELS  # noqa: E402
from gliner_spark.operators.linking import (  # noqa: E402
    entity_surfaces,
    lsh_links,
)
from gliner_spark.operators.ner import extract_mentions  # noqa: E402
from gliner_spark.operators.relations import extract_relations  # noqa: E402
from gliner_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan_of(df) -> str:
    """Final (post-AQE) physical plan — the only place codegen `*(n)`
    markers appear once adaptive execution is on. Must execute THIS
    df's own QueryExecution (collect), not a write command's."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def check(name: str, plan: str, expects: dict[str, bool]):
    print(f"\n=== {name} ===")
    ok = True
    for needle, want in expects.items():
        has = needle in plan
        status = "OK " if has == want else "BAD"
        if has != want:
            ok = False
        print(f"  [{status}] {'contains' if want else 'absent '} {needle!r}"
              f" -> {has}")
    if not ok:
        print(plan)
    return ok


def main() -> int:
    spark = build_session(cores=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bad = 0

    # 1. NER: column pruning — only doc_id+text read; the operator adds
    # no shuffle ABOVE the Python stage (the Exchange below it is the
    # local-file parallelism guard, absent on real multi-split scans)
    m = extract_mentions(docs, SOUP_LABELS, id_col="doc_id")
    p = plan_of(m)
    above_map = p.split("MapInPandas")[0]
    bad += not check(
        "ner_mentions (column pruning, shuffle-free above Python stage)",
        p,
        {"ReadSchema: struct<doc_id:bigint,text:string>": True,
         "ArrowEvalPython": False},  # mapInPandas, not per-row python
    )
    bad += not check(
        "ner_mentions (no shuffle above mapInPandas)",
        above_map,
        {"Exchange": False},
    )

    # 2. filter pushdown reaches the scan through mapInPandas inputs
    flt = docs.where(F.col("lang") == "en").select("doc_id", "text")
    p = plan_of(flt)
    bad += not check(
        "filtered scan (predicate pushdown)",
        p,
        {"PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]": True},
    )

    # 3. relations: rule table broadcast; single doc_id shuffle reused;
    # codegen markers only visible on the executed (final) AQE plan
    t = extract_relations(m.repartition("doc_id"))
    p = executed_plan_of(t)
    bad += not check(
        "ner_triples (broadcast rules, codegen join)",
        p,
        {"BroadcastHashJoin": True, "*(": True},
    )

    # 4. linking LSH: JVM-only signature computation (no Python stage)
    links = lsh_links(entity_surfaces(m))
    p = executed_plan_of(links)
    bad += not check(
        "kg_links_lsh (JVM-side minhash)",
        p,
        {"ArrowEvalPython": False, "BatchEvalPython": False, "*(": True},
    )

    # 5. bpe token counting: pure Catalyst (regexp_extract_all inside
    # codegen — zero Python stage)
    from gliner_spark.operators.textstats import bpe_token_stats

    p = executed_plan_of(bpe_token_stats(docs))
    bad += not check(
        "bpe_token_stats (JVM-side regex, codegen)",
        p,
        {"ArrowEvalPython": False, "BatchEvalPython": False,
         "MapInPandas": False, "*(": True},
    )

    # 6. salted surface aggregation: exactly ONE exchange more than the
    # plain form (partial by (label, surface, salt) + final by
    # (label, surface); any exchanges below the Python stage — the
    # local-file parallelism guard — appear in both plans)
    n_plain = plan_of(entity_surfaces(m)).count("Exchange (")
    n_salted = plan_of(entity_surfaces(m, salt_buckets=8)).count(
        "Exchange ("
    )
    print("\n=== salted entity_surfaces (two-phase agg) ===")
    ok6 = n_salted == n_plain + 1
    print(f"  [{'OK ' if ok6 else 'BAD'}] salted exchanges == plain+1 "
          f"-> {n_salted} vs {n_plain}")
    bad += not ok6

    # 7. md5-gram cosine twin: pure Catalyst end to end — the embedding
    # votes, norms, bucket-join dot product and threshold must all run
    # JVM-side (no Python stage of any kind), with codegen spans
    from gliner_spark.operators.embed import cosine_links_md5

    surf = spark.createDataFrame(
        [("a", "kyiv city"), ("b", "kyiv cty")],
        "sid string, surface string",
    )
    cands = spark.createDataFrame([("a", "b")], "src string, dst string")
    p = executed_plan_of(cosine_links_md5(surf, cands, threshold=-1.0))
    bad += not check(
        "cosine_links_md5 (pure Catalyst, codegen)",
        p,
        {"ArrowEvalPython": False, "BatchEvalPython": False,
         "MapInPandas": False, "*(": True},
    )

    # 8. paragraph dedup: pure Catalyst (segmentation, first-occurrence
    # window, reassembly agg — zero Python), column-pruned scan
    from gliner_spark.operators.dedup import paragraph_dedup

    p = executed_plan_of(paragraph_dedup(docs, window_words=10))
    bad += not check(
        "paragraph_dedup (pure Catalyst, codegen)",
        p,
        {"ArrowEvalPython": False, "BatchEvalPython": False,
         "MapInPandas": False, "*(": True},
    )

    # 8b. incremental admission scale shape, structurally: (a) the
    # signature pass is row-local — shingle hashing stays JVM-side and
    # the 128-permutation min runs in ONE vectorized Arrow stage
    # (r7: replaced the explode + map-side-combined min agg; zero
    # shuffle now, and the Arrow stage is the guide-§4.2 batch-numpy
    # pattern, not a row-at-a-time UDF), (b) the persisted store schema
    # is exactly (doc_id, sig): the state a 10^12-doc admission
    # re-reads carries no text by CONSTRUCTION, not by pruning
    import tempfile

    from pyspark.sql import functions as _F

    from gliner_spark.plans.incremental import (
        batch_minhash_signatures,
        dedup_admit_batch,
    )

    p = executed_plan_of(batch_minhash_signatures(docs.limit(50)))
    bad += not check(
        "batch_minhash_signatures (row-local Arrow stage, no shuffle, "
        "no row-at-a-time Python)",
        p,
        {"BatchEvalPython": False, "MapInPandas": True,
         "Exchange hashpartitioning": False},
    )
    import shutil

    adm_store = tempfile.mkdtemp(prefix="gs_plan_admit_")
    try:
        dedup_admit_batch(docs.where(_F.col("doc_id") % 2 == 0),
                          adm_store)
        store_cols = spark.read.parquet(adm_store).columns
    finally:
        shutil.rmtree(adm_store, ignore_errors=True)
    store_ok = store_cols == ["doc_id", "sig"]
    print(f"  [{'OK ' if store_ok else 'BAD'}] admission store schema "
          f"== [doc_id, sig] -> {store_cols}")
    bad += not store_ok

    # 8c. temporal family: the hot-key discipline is structural.
    # latest_snapshot must be a partial-aggregated max(struct) groupBy
    # — NO window (a row_number window would single-task hot urls);
    # same for kg_asof.
    from gliner_spark.operators.temporal import (
        asof_join,
        latest_snapshot,
        synthesize_recrawls,
    )

    # checkpoint: the synthesizer's own version-counter window must not
    # leak into the operator plans under audit
    pages = synthesize_recrawls(spark, n_urls=300).localCheckpoint(eager=True)
    p = executed_plan_of(latest_snapshot(pages))
    bad += not check(
        "latest_snapshot (partial-agg max(struct), no window)",
        p,
        {"Window": False, "partial_max": True,
         "ArrowEvalPython": False, "MapInPandas": False},
    )

    # 8d. asof_join: union-tag plan — the right side attaches via ONE
    # sort-shuffle + running window, never a range-expanded join (no
    # nested-loop/cartesian product anywhere)
    dic = spark.createDataFrame(
        [("https://site-1.example/", "2024-05-01 00:30:00", 2)],
        "url string, valid_from string, dict_ver int",
    ).select("url", _F.to_timestamp("valid_from").alias("valid_from"),
             "dict_ver")
    p = executed_plan_of(
        asof_join(pages, dic, key="url", left_ts="warc_ts",
                  right_ts="valid_from")
    )
    bad += not check(
        "asof_join (union-tag window, no range-expanded join)",
        p,
        {"Window": True, "BroadcastNestedLoopJoin": False,
         "CartesianProduct": False, "SortMergeJoin": False,
         "MapInPandas": False},
    )

    # 8e. label_propagation round: both levels partial-aggregated
    # (hot nodes combine map-side), no window, no Python
    from gliner_spark.operators.graph import lpa_round, undirected_edges

    kg_edges = pages.select(
        (_F.abs(_F.xxhash64("url")) % 50).alias("src_entity"),
        (_F.abs(_F.xxhash64("url", _F.lit(1))) % 50).alias("dst_entity"),
    )
    und = undirected_edges(kg_edges)
    sym = und.unionByName(
        und.select(_F.col("b").alias("a"), _F.col("a").alias("b"))
    )
    labels0 = sym.select(_F.col("a").alias("node")).distinct().withColumn(
        "label", _F.col("node")
    )
    p = executed_plan_of(lpa_round(sym, labels0))
    bad += not check(
        "label_propagation (partial-agg rounds, no window, no Python)",
        p,
        {"Window": False, "partial_count": True, "partial_max": True,
         "ArrowEvalPython": False, "MapInPandas": False},
    )

    # 9. TPC-H-style join: small dim broadcast without hints
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.sum("o_totalprice").alias("rev"))
    p = plan_of(j)
    bad += not check(
        "orders x customer (auto broadcast)",
        p,
        {"BroadcastHashJoin": True},
    )

    spark.stop()
    print(f"\n{'ALL PLANS OK' if not bad else f'{bad} PLAN CHECKS FAILED'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
