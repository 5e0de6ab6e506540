package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Accumulator, Dedup, Iterators, Relational, RelationalTpch}

/** Physical-plan assertions: these encode the 100 TB design rules
  * from SURVEY §5 — if a refactor reintroduces a full-width scan, a
  * lost broadcast, or a global single-partition sort on the fact
  * path, these fail long before any benchmark notices. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Count shuffle-exchange NODES only: lines whose node name (tree
    * art stripped) is `Exchange …`. A bare `Exchange` substring count
    * would also hit `ReusedExchange` (same work, not a reshuffle —
    * and its line repeats the referenced exchange's description) and
    * `BroadcastExchange`. */
  private def shuffleExchanges(p: String): Int =
    p.linesIterator.count(_.dropWhile(c => !c.isLetter).startsWith("Exchange "))

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_filter_project pushes predicates and prunes columns at the scan") {
    val p = formatted(Relational.qFilterProject(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"), p)
    assert(p.contains("LessThan(l_quantity,10.0)"), p)
    // 16-column table, 6 needed (4 projected + 2 filter-only)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q5 six-table join broadcasts every dimension") {
    val p = plan(RelationalTpch.q5RegionVolume(spark, sfDir))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 4, s"want >=4 broadcast joins, got $nBroadcast\n$p")
    // the only shuffle join permitted is lineitem ⋈ orders (fact-fact)
    val nSortMerge = "SortMergeJoin".r.findAllIn(p).length
    assert(nSortMerge <= 1, s"dims must broadcast, got $nSortMerge merge joins\n$p")
  }

  test("q1 aggregation is map-side partial (two HashAggregate stages)") {
    val p = plan(RelationalTpch.q1PricingSummary(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("accumulator size-flush ranks per key two-phase, never one task per batchId") {
    val p = plan(Accumulator.accSizeFlush(spark, sfDir))
    // row-bearing shuffle is keyed (event_type, bucket) — a hot
    // batchId spreads across buckets
    assert(p.contains("hashpartitioning(event_type"), p)
    // every window over row-bearing data must include the bucket id
    // in its spec; a window on the low-cardinality batch key alone is
    // a single-task sort per batchId. (The offsets prefix-sum window
    // IS keyed by event_type alone, but runs over the per-(key, pid)
    // counts — identified by its __graft_cnt input.)
    val rowWindows = p.linesIterator
      .filter(l => l.contains("Window [row_number()")).toList
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("__graft_pid")),
      s"arrival-rank window must be (key, pid)-partitioned:\n$p")
    assert(!p.contains("SinglePartition"), p)
  }

  test("iter_batches ranks per bucket, not a single-partition sort") {
    val p = plan(Iterators.iterBatches(spark, sfDir))
    val rowWindows = p.linesIterator
      .filter(l => l.contains("Window [row_number()")).toList
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("__graft_pid")),
      s"rank window must be bucket-partitioned:\n$p")
    // the only SinglePartition stage allowed is the numPartitions-row
    // offset prefix sum, never the row-bearing side
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toList
    assert(single.size <= 1, s"unexpected single-partition stages:\n${single.mkString("\n")}")
  }

  test("iter_progress prefix sum is two-phase, row-bearing stages never single-partition") {
    val p = plan(Iterators.iterProgress(spark, sfDir))
    // offset prefix sums are the only SinglePartition stages, and each
    // must sit directly above a pid-keyed aggregate (numPartitions
    // rows) — never above row-bearing data
    val lines = p.linesIterator.toVector
    val idxs = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") => i
    }
    assert(idxs.nonEmpty, p)
    idxs.foreach { i =>
      assert(lines(i + 1).contains("HashAggregate(keys=[__graft_pid"),
        s"SinglePartition over non-pid data:\n${lines.slice(i, i + 2).mkString("\n")}")
    }
  }

  test("dedup_exact shuffles once on the content hash") {
    val p = plan(Dedup.dedupExact(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_"), p) // map-side combine before the shuffle
  }

  test("dedup_embedding plan is equi-joins only — no cartesian, no nested loop") {
    // audit the BUILD plan (embeddingPairs memoizes to a staged
    // artifact, so the registered query's plan is a parquet read)
    val p = plan(Dedup.embeddingPairsUncached(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus_drift is corpus-linear — no cartesian, no nested loop, no vocab spine") {
    val p = plan(graft.operators.Pipeline.corpusDrift(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_point_in_interval is a binned equi-join — no nested loop, no cartesian") {
    val p = plan(Relational.qPointInInterval(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("bin"), p) // the theta join became a bin equi-join
  }

  test("q_percentiles_dist ranks per bucket, no percentile agg buffer") {
    val p = plan(Relational.qPercentilesDist(spark, sfDir))
    val rowWindows = p.linesIterator
      .filter(l => l.contains("Window [row_number()")).toList
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("__q_pid")),
      s"rank window must be (group, bucket)-partitioned:\n$p")
    assert(!p.toLowerCase.contains("percentile("),
      s"must not fall back to the unbounded percentile aggregate:\n$p")
  }

  test("sample_stratified broadcasts the rate table; corpus side never shuffle-joins") {
    val p = plan(graft.operators.Pipeline.sampleStratified(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the corpus scan reads only the three needed columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"), readSchema)
  }

  test("token_ids builds a bounded vocab (TakeOrdered) and broadcasts it") {
    val p = plan(graft.operators.Pipeline.tokenIds(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("quality_filter canon ids are partial-aggregated, never a per-hash window") {
    val p = plan(graft.operators.Pipeline.qualityFilter(spark, sfDir))
    // mass-dup hash groups must collapse map-side (partial_min) before
    // any exchange; a min-window over text_hash would hand a hash's
    // whole group — where crawl mass-duplication lives — to one task
    assert(p.contains("partial_min"), p)
    assert(!p.contains("Window"),
      s"canonical ids must come from groupBy+join, not a window over text_hash:\n$p")
    // the canon-side scan is (doc_id, text)-only — scoring columns are
    // never computed twice
    val canonSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(canonSchemas.forall(s => !s.contains("source") && !s.contains("n_chars")),
      s"scans must prune to the needed columns:\n$canonSchemas")
  }

  test("decontaminate broadcasts eval shingles; corpus never shuffles on shingles") {
    val p = plan(graft.operators.Pipeline.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("corpus_ngrams aggregates map-side and takes top-N without a global sort") {
    val p = plan(graft.operators.Pipeline.corpusNgrams(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("incremental probe reads the persisted index exchange-free") {
    val s = spark
    Dedup.buildMinhashIndex(s, sfDir)
    // disable dynamic broadcast so the assertion pins the big-corpus
    // shape (at 100 TB neither side broadcasts): the ONLY exchange is
    // the incoming shard hashing onto the index's bucket layout
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val p = plan(Dedup.incrementalProbePlan(s, sfDir))
      assert(p.contains("Bucketed: true"), p)
      assert(p.contains("SelectedBucketsCount"), p)
      assert("Exchange".r.findAllIn(p).length == 1,
        s"index side must not reshuffle — one probe-side exchange only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("hybrid BM25 side probes the persisted postings index exchange-free") {
    val s = spark
    graft.operators.HybridSearch.buildBm25Index(s, sfDir)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      // the query-term side is EXPLICITLY broadcast; disabling
      // auto-broadcast pins that the postings side joins without any
      // planner rescue (the 100 TB shape)
      s.conf.set(key, "-1")
      val p = plan(graft.operators.HybridSearch.bm25Tscores(s, sfDir))
      assert(p.contains("graft_bm25_postings_idx"), p)
      assert(p.contains("Bucketed: true"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      // the ONLY shuffle is the matched-rows (query, doc) partial agg:
      // the postings never reshuffle and no corpus statistic (df, dl,
      // avgdl, N) is recomputed at query time
      assert(shuffleExchanges(p) == 1,
        s"one matched-rows agg exchange only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("semantic decontamination broadcasts the eval side; the corpus is never pair-joined with itself") {
    val s = spark
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1") // pin: the eval broadcast must be EXPLICIT
      val p = plan(graft.operators.Pipeline.decontaminateSemantic(s, sfDir))
      assert("BroadcastExchange".r.findAllIn(p).nonEmpty,
        "the bounded eval side must broadcast:\n" + p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "no all-pairs stage anywhere:\n" + p)
    } finally s.conf.set(key, orig)
  }

  test("batch span family probes the persisted duplicated-window index exchange-free") {
    val s = spark
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val p = plan(Dedup.spanProbePlan(s, sfDir))
      // the gram side hashes onto the index's bucket layout; the index
      // itself (the n_occ>=2 occurrence count the trio used to
      // re-derive live) is read, never recomputed — no aggregate
      // anywhere in the probe plan
      assert(p.contains("graft_dup_span_idx"), p)
      assert(p.contains("Bucketed: true"), p)
      assert(!p.contains("HashAggregate"),
        s"the duplicated-window count must come from the index, not a live agg:\n$p")
      assert("Exchange".r.findAllIn(p).length == 1,
        s"index side must not reshuffle — one probe-side exchange only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("perceptual-gate probe reads the persisted band index exchange-free") {
    val s = spark
    graft.operators.Multimodal.buildMmNearIndex(s, sfDir)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val p = plan(graft.operators.Multimodal.mmNearProbePlan(s, sfDir))
      assert(p.contains("Bucketed: true"), p)
      assert("Exchange".r.findAllIn(p).length == 1,
        s"index side must not reshuffle — one probe-side exchange only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("sample_reservoir tops-k per group on the bounded heap — no window, no per-group sort") {
    val p = plan(graft.operators.Pipeline.sampleReservoir(spark, sfDir))
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), p)
  }

  test("sample_weighted tops-k priorities per group on the bounded heap") {
    val p = plan(graft.operators.Pipeline.sampleWeighted(spark, sfDir))
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_skew_join keys the shuffle on (user_id, salt) and replicates the build side") {
    val p = plan(Relational.skewJoinPlan(spark, sfDir))
    // the join must be a shuffled join whose key includes the salt —
    // that's the whole point: a hot user_id spreads over S reducers
    val joins = p.linesIterator.filter(l =>
      l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin")).toList
    assert(joins.nonEmpty, s"salted join must not broadcast:\n$p")
    assert(joins.head.contains("salt"), s"join key must include salt:\n${joins.head}")
    // build side replicates via a row-local Generate (explode), not a shuffle
    assert(p.contains("Generate explode"), p)
  }

  test("dedup_substring exchanges the 64-bit gram hash, never the gram text") {
    val p = plan(Dedup.dedupSubstring(spark, sfDir))
    // every hash-partitioning exchange keys on gh (or doc_id for the
    // per-doc rollup) — the gram string itself must not ride a shuffle
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(l => l.contains("gh") || l.contains("doc_id")),
      s"gram text must not be a shuffle key:\n${exchanges.mkString("\n")}")
    assert(!exchanges.exists(_.contains("gram#")),
      s"raw gram rides an exchange:\n${exchanges.mkString("\n")}")
  }

  test("q6 pushes every predicate to the parquet scan") {
    val p = formatted(RelationalTpch.q6ForecastRevenue(spark, sfDir))
    assert(p.contains("PushedFilters"), p)
    // the discount band and quantity cap must reach the scan, not
    // evaluate post-read
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"), p)
    assert(p.contains("LessThan(l_quantity,24.0)"), p)
    assert(!p.contains("Exchange hashpartitioning"), "scalar agg needs no hash exchange:\n" + p)
  }

  test("q7 broadcasts every dimension side — one fact-fact exchange pair only") {
    val p = plan(RelationalTpch.q7NationTrade(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // supplier + both nation copies ride broadcasts; the only shuffle
    // exchanges belong to the lineitem⋈orders(/customer) fact joins
    // and the final bounded aggregate/sort
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"supplier and both nation dims must broadcast:\n$p")
  }

  test("q10 tops-20 with a bounded heap, aggregates before the customer join") {
    val p = plan(RelationalTpch.q10ReturnedRevenue(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not be a global sort:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    // revenue aggregates on (orderkey-joined) lineitem BEFORE customer
    // attaches: the customer join input is the per-customer aggregate
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0, p)
  }

  test("q19's OR-of-brackets stays a broadcast hash join with a codegen'd residual") {
    val p = plan(RelationalTpch.q19BracketRevenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the disjunction must ride the equi-join as a residual, not force a nested loop:\n" + p)
  }

  test("q_percentiles_grouped buffers no group's values — ranks per bucket, no percentile agg") {
    val p = plan(graft.operators.Behavioral.qPercentilesGrouped(spark, sfDir))
    assert(!p.contains("percentile"), s"must not fall back to the buffering aggregate:\n$p")
    // the rank window partitions by (group, bucket), never by group alone
    assert(p.contains("__q_pid"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sample_entity selects row-locally — no shuffle before the audit aggregate") {
    val p = plan(graft.operators.Pipeline.sampleEntity(spark, sfDir))
    // membership filter must sit under the scan side of the single
    // aggregate exchange (plus the bounded output sort)
    assert(shuffleExchanges(p) <= 3, s"selection must not add exchanges:\n$p")
    assert(p.contains("2654435761"), s"threshold hash must be in the scan-side filter:\n$p")
  }

  test("embed_covariance formats the staged moment artifact — no corpus scan") {
    // the n·d² expansion runs ONCE inside embedMoments' staging pass
    // (row-local explode, partial agg before its single shuffle);
    // the covariance query itself only formats the d(d+1)/2-row
    // artifact: a broadcast mean join and the bounded output sort
    val p = plan(graft.operators.Similarity.embedCovariance(spark, sfDir))
    assert(!p.contains("embeddings.parquet"),
      s"covariance readout must not rescan the corpus:\n$p")
    assert(shuffleExchanges(p) == 1,
      s"expected the bounded output-sort exchange only:\n$p")
    assert(p.contains("BroadcastExchange"), "means must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("indexed pagerank round reads the persisted edge table exchange-free") {
    val s = spark
    graft.operators.Graph.buildPagerankIndex(s, sfDir)
    // pin the big-graph shape: at scale the node state doesn't
    // broadcast, so the round must be (state → bucket layout) + the
    // dst mass sum — the edge table itself never re-shuffles
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val p = plan(graft.operators.Graph.pagerankRoundPlan(s))
      assert(p.contains("Bucketed: true"), p)
      assert(shuffleExchanges(p) == 2,
        s"edge side must not reshuffle — state-probe + dst-agg exchanges only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("indexed embedding-cluster round reads the persisted edge table exchange-free") {
    val s = spark
    graft.operators.Dedup.buildEmbedClusterIndex(s, sfDir)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val p = plan(graft.operators.Dedup.embedClusterRoundPlan(s))
      assert(p.contains("Bucketed: true"), p)
      assert(shuffleExchanges(p) == 2,
        s"edge side must not reshuffle — label-probe + min-agg exchanges only:\n$p")
    } finally s.conf.set(key, orig)
  }

  test("corpus_shuffle positions come from bucketed ranks, not a one-task sort") {
    val p = plan(graft.operators.Pipeline.corpusShuffle(spark, sfDir))
    val rowWindows = p.linesIterator
      .filter(l => l.contains("Window [row_number()")).toList
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("__graft_pid")),
      s"rank window must be bucket-partitioned:\n$p")
    // the only SinglePartition stage allowed is the numPartitions-row
    // offset prefix sum, never the corpus
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toList
    assert(single.size <= 1, s"unexpected single-partition stages:\n${single.mkString("\n")}")
  }

  test("dedup_paragraph df-counts partial-aggregate; no per-chunk window") {
    val p = plan(Dedup.dedupParagraph(spark, sfDir))
    // chunk document-frequencies collapse map-side before any exchange
    assert(p.contains("partial_"), p)
    // and no stage hands a chunk's whole occurrence set to one task
    assert(!p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("table upsert never shuffles the snapshot — broadcast anti join only") {
    val p = plan(Relational.qTableUpsert(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("text_search broadcasts the query set and tops-k on the bounded-heap operator") {
    val p = plan(graft.operators.TextAnalysis.textSearch(spark, sfDir))
    // the posting lists never reshuffle to meet the bounded query set
    assert(p.contains("BroadcastHashJoin"), p)
    // final ranking is the native per-group heap — a query matching
    // the whole corpus ships k rows per partition, not the corpus
    assert(p.contains("TopKPerGroup"), p)
    assert(p.contains("partial_"), p)
  }

  test("indexed search prunes to the query terms' buckets") {
    val s = spark
    graft.operators.TextAnalysis.buildPostingsIndex(s, sfDir)
    val p = plan(graft.operators.TextAnalysis.textSearchIndexed(s, sfDir))
    // the bucketed posting scan prunes on the literal term set —
    // only buckets holding query terms are read
    assert(p.contains("Bucketed: true"), p)
    assert(p.contains("SelectedBucketsCount"), p)
    // and the postings never reshuffle to meet the broadcast queries
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bloom prejoin filters the probe side before its exchange") {
    val s = spark; import s.implicits._
    val df = Relational.qBloomPrejoin(s, sfDir)
    val p = plan(df)
    assert(p.contains("might_contain"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    // the bloom filter must sit UNDER the probe exchange: the scan-side
    // filter line carrying might_contain appears after (deeper than)
    // the exchange line in the tree rendering
    val lines = p.linesIterator.toVector
    val exch = lines.indexWhere(_.contains("Exchange hashpartitioning(l_suppkey"))
    val filt = lines.indexWhere(_.contains("might_contain"))
    assert(exch >= 0 && filt > exch, p)
    // and it actually prunes: at 25 nations the one-nation supplier
    // set passes well under a fifth of lineitem through the shuffle
    val total = graft.sources.Tables.lineitem(s, sfDir).count()
    val passed = Relational.bloomProbeSide(s, sfDir).count()
    assert(passed > 0 && passed * 5 < total, s"passed=$passed total=$total")
  }

  test("profile computes all distinct-aggs in one Expand pass") {
    val p = plan(Relational.qProfile(spark, sfDir))
    assert(p.contains("Expand"), p)
    // one scan: a single lineitem FileScan in the whole plan
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("decorrelated brand-average join broadcasts the aggregate side") {
    val p = plan(Relational.qDecorrelate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed fact-fact join plans with zero exchanges") {
    val df = Relational.bucketedJoinPlan(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(p.contains("Bucketed: true"), p)
  }

  test("minhash banding join carries no raw shingle arrays through the shuffle") {
    val p = plan(Dedup.dedupMinhash(spark, sfDir))
    // signatures are row-local: the only wide arrays crossing an
    // exchange are the k=64 signature, never the shingle set
    assert(!p.contains("shingles#") ||
      !p.linesIterator.exists(l => l.contains("Exchange") && l.contains("shingles#")), p)
  }

  test("dedup_jaccard_prefix: shuffled prefix join, never a broadcast of the corpus side") {
    // the eager checkpoints hide stage plans from the final frame —
    // audit the candidate stage directly
    val p = plan(Dedup.jaccardPrefixCand(Dedup.jaccardPrefixDocs(spark, sfDir)))
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_matryoshka: both ranking stages run on the bounded-heap top-k, no per-query global sort") {
    val p = plan(graft.operators.Similarity.annMatryoshkaFrame(spark, sfDir))
    // each stage plans a partial + final TopKPerGroup pair
    assert("TopKPerGroup \\[".r.findAllIn(p).length >= 4,
      s"expected two bounded-heap stages (4 nodes):\n$p")
    assert(!p.contains("Window [row_number()"), p)
  }

  test("q_asof_nearest pays one exchange: both direction windows share the per-user sort") {
    val p = plan(Relational.qAsofNearest(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    val sorts = "Sort \\[user_id".r.findAllIn(p).size
    assert(sorts <= 1, s"both windows must reuse one sort:\n$p")
  }

  test("corpus_keywords ranks per doc on the bounded heap") {
    val p = plan(graft.operators.TextAnalysis.corpusKeywords(spark, sfDir))
    assert(p.contains("TopKPerGroup ["), p)
    assert(!p.contains("Window [row_number()"), p)
  }

  test("q18 tops-100 on a bounded heap after the one fact aggregate") {
    val p = plan(RelationalTpch.q18LargeOrders(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must never be a global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_hamming bounds exchanged rows: partial WindowGroupLimit before the shuffle") {
    val p = plan(graft.operators.Similarity.annHammingFrame(spark, sfDir))
    // Spark 4's WindowGroupLimit caps each task at k rows per query
    // BEFORE the rank exchange — the corpus-sized scored set never
    // rides the shuffle
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected partial per-task top-k before the exchange:\n$p")
    // the only join is the 10-row query-code broadcast against the
    // corpus scan (a nested loop over a bounded build side IS the
    // intended quantized-scan shape); nothing may sort-merge
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q17 correlated scalar avg decorrelates to one broadcast threshold join") {
    val p = plan(RelationalTpch.q17SmallQtyRevenue(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"per-row subquery shape leaked into the plan:\n$p")
    // the per-part threshold table arrives broadcast, with the
    // quantity comparison as the join residual — never a re-run of
    // the aggregate per outer row
    assert(p.contains("BroadcastHashJoin") && p.contains("qty_limit"), p)
    // partkey threshold agg + the final single-row rollup
    assert(shuffleExchanges(p) <= 2, s"expected <=2 shuffles:\n$p")
  }

  test("q20 nested IN chain is bounded aggregates + broadcast semi-join") {
    val p = plan(RelationalTpch.q20ExcessSuppliers(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the supplier probe is a broadcast LEFT SEMI — the IN never
    // becomes a row-multiplying join
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"),
      s"everything after the pair aggregate must broadcast:\n$p")
  }

  test("span decontamination probes a broadcast eval set — the corpus never self-joins or merge-joins") {
    val p = plan(graft.operators.Pipeline.decontaminateSpan(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the window probe itself must be broadcast, not a corpus-wide
    // shuffle on 13-gram strings
    assert(!p.linesIterator.exists(l =>
      l.dropWhile(c => !c.isLetter).startsWith("Exchange ") &&
        l.contains("[w")), s"corpus windows must not ride a shuffle:\n$p")
  }

  test("bpe encoding ships the piece table broadcast — the corpus side never carries the merge chain") {
    val p = plan(graft.operators.Bpe.tokenIdsBpe(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"the distinct-word piece table must broadcast:\n$p")
    // the 30-deep replace chain must hang off the DISTINCT-word frame
    // (one 'replace(' appearance per merge on that side), never be
    // re-evaluated per corpus token position
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q2 correlated MIN decorrelates to one pair aggregate — fact scanned once, no merge joins after") {
    val p = plan(RelationalTpch.q2MinCostSupplier(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // everything downstream of the (checkpointed) pair aggregate is
    // pair-sized and broadcasts; the region-supplier LEFT SEMI prune
    // lives inside the checkpointed build
    assert(!p.contains("SortMergeJoin"),
      s"post-aggregate joins must broadcast:\n$p")
    // the pair aggregate is checkpointed once (pair-sized), so the
    // visible plan consumes the materialized artifact — the fact
    // never re-scans for the second (MIN-rollup) consumer
    val factScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("l_extendedprice"))
    assert(factScans == 0 && p.contains("ExistingRDD"),
      s"lineitem must feed ONE checkpointed pair aggregate, got $factScans live scans:\n$p")
  }

  test("q11 HAVING-vs-global-scalar rolls the total up from the per-part aggregate, never a second fact scan") {
    val p = plan(RelationalTpch.q11ImportantValue(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    // the per-part aggregate is checkpointed once (part-sized), so
    // the fact never re-scans for the second (global-total) consumer
    val factScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("l_extendedprice"))
    assert(factScans == 0 && p.contains("ExistingRDD"),
      s"lineitem must feed ONE checkpointed per-part aggregate, got $factScans live scans:\n$p")
    // the only row-bearing shuffles: the 1-row total rollup and the
    // final ordering (the per-part aggregate shuffled pre-checkpoint)
    assert(shuffleExchanges(p) <= 2, s"expected <=2 shuffles:\n$p")
  }

  test("q12 priority split is a CASE inside the partial aggregate, not a second pass") {
    val p = plan(RelationalTpch.q12PriorityLateness(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p)
    // one equi-join + one aggregate exchange + the final order — the
    // CASE split must not add a shuffle
    assert(shuffleExchanges(p) <= 3, s"expected <=3 shuffles:\n$p")
  }

  test("t-closeness runs on the bounded group×segment spine — the fact feeds one checkpointed cell aggregate") {
    val p = plan(Relational.qTCloseness(spark, sfDir))
    // cells are checkpointed once; groups/global/total all roll up
    // from that artifact — the customer fact never re-scans
    val factScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("c_acctbal"))
    assert(factScans == 0 && p.contains("ExistingRDD"),
      s"customer must feed ONE checkpointed cell aggregate, got $factScans live scans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21 double quantifier is one fact aggregation cascade, not two self-joins") {
    val p = plan(RelationalTpch.q21SoleLateSuppliers(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // EXISTS/NOT-EXISTS collapse into per-order flags: exactly one
    // (order, supplier) aggregate and one per-order rollup over it —
    // the lineitem fact is scanned ONCE, never self-joined
    val factScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("l_suppkey"))
    assert(factScans == 1, s"lineitem must scan exactly once, got $factScans:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("HashAggregate(keys=[l_orderkey") && l.contains("l_suppkey")), p)
  }
  test("embed_jl is one broadcast pass: the corpus never shuffle-exchanges") {
    val df = graft.operators.Similarity.embedJl(spark, sfDir)
    val pl = plan(df)
    // the basis rides a broadcast; the only shuffles are the output
    // presentation sort and the 16-row basis rollup — the CORPUS path
    // is scan -> project -> join with no exchange (asserted below by
    // the stream-side shape)
    assert(pl.contains("BroadcastNestedLoopJoin"), pl.take(2000))
    assert(shuffleExchanges(pl) <= 2, s"unexpected reshuffle:\n$pl")
    assert(!pl.contains("SortMergeJoin"), pl.take(2000))
    // the embeddings scan feeds the join through projections only
    val scanIdx = pl.linesIterator.indexWhere(_.contains("FileScan parquet [vec_id"))
    val joinIdx = pl.linesIterator.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    // guard against vacuous passes: both lines must exist, scan below join
    assert(joinIdx >= 0 && scanIdx > joinIdx, s"plan shape changed:\n$pl")
    val between = pl.linesIterator.slice(joinIdx, scanIdx).toSeq
    assert(!between.exists(_.contains("Exchange rangepartitioning")) &&
      !between.exists(_.contains("Exchange hashpartitioning")),
      s"corpus must reach the join exchange-free:\n${between.mkString("\n")}")
  }

  test("ann_hard_negatives fuses the label inequality into the join, not a post-filter") {
    val df = graft.operators.Similarity.annHardNegatives(spark, sfDir)
    val pl = plan(df)
    // broadcast-nested-loop join with BOTH inequalities in its
    // condition: mismatched pairs never materialize into a Filter
    val joinLine = pl.linesIterator.find(_.contains("BroadcastNestedLoopJoin")).getOrElse("")
    assert(joinLine.contains("label"), s"label filter must sit in the join condition:\n$pl")
    assert(joinLine.contains("vec_id"), joinLine)
  }

  test("q_changepoint and the forecast family aggregate the fact table before any window or fold") {
    for (df <- Seq(
        graft.operators.Behavioral.qChangepoint(spark, sfDir),
        graft.operators.Behavioral.qHoltWinters(spark, sfDir),
        graft.operators.Behavioral.qForecastBacktest(spark, sfDir))) {
      val pl = plan(df)
      // two HashAggregate stages (partial + final) below everything:
      // the event-sized frame collapses to day-sized with map-side
      // combine before the day-sized window/fold runs
      val aggs = "HashAggregate".r.findAllIn(pl).length
      assert(aggs >= 2, s"need partial+final aggregation:\n$pl")
      assert(!pl.contains("CartesianProduct"), pl.take(2000))
    }
  }

  test("sample_dsir: broadcast ratio table, global top-N without a full sort") {
    val pl = plan(graft.operators.Pipeline.sampleDsir(spark, sfDir))
    // the 4096-row bucket-ratio table rides back as a broadcast — the
    // corpus-sized (doc, bucket) frame never reshuffles for it
    assert(pl.contains("BroadcastHashJoin"), pl.take(3000))
    // top-dsirN is TakeOrderedAndProject, not a global sort
    assert(pl.contains("TakeOrderedAndProject"), pl.take(3000))
    assert(!pl.contains("CartesianProduct"), pl.take(2000))
  }

  test("search_rerank: pair texts fetched via broadcast joins, corpus never shuffle-joined") {
    val pl = plan(graft.operators.HybridSearch.searchRerankLive(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(pl).length >= 2,
      s"both text fetches must broadcast the bounded id side:\n${pl.take(3000)}")
    assert(!pl.contains("SortMergeJoin"),
      s"corpus shuffle-joined for a queries x k id list:\n${pl.take(3000)}")
  }
}
