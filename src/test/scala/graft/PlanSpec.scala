package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the scale properties PLANS.md documents
  * must survive refactors. These assert on the optimized physical plan,
  * not on results. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q02 pushes predicates and prunes columns at the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    // pruned: only the 6 needed columns in ReadSchema, not e.g. l_comment-ish extras
    assert(!p.contains("l_returnflag"))
  }

  test("q03 star join broadcasts dims and has no cartesian stage") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q05 top-k plans TakeOrderedAndProject, not a global sort+limit") {
    val p = plan("q05_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q12 minhash pipeline has no cartesian or nested-loop stage") {
    val p = plan("q12_dedup_minhash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q16 brute-force keeps the product on the broadcast side only") {
    val p = plan("q16_ann_bruteforce")
    // the deliberate product over the 10-row query set is nested-loop
    // with a broadcast build; anything shuffling the corpus for it would
    // show as CartesianProduct
    assert(!p.contains("CartesianProduct"))
  }

  test("q17 bucketed ANN joins on the bucket code with hash joins") {
    val p = plan("q17_ann_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q17 candidates: single subplan (explode mirror) + runtime exchange reuse") {
    // the both-directions mirror must NOT be a union of two selects over
    // the candidate subplan — that embeds (and runs) every scan/shuffle
    // twice. Static check: exactly one parquet scan of the embeddings
    // table in the whole candidate plan...
    val cand = graft.operators.Similarity.annLshCandidates(spark, sf)
    val statics = cand.queryExecution.executedPlan.toString
    // (left + right of the bucket self-join = 2 scans; a union-duplicated
    // plan had 4)
    assert("embeddings\\.parquet".r.findAllIn(statics).size <= 2, statics.take(500))
    // ...dynamic check: after execution, AQE reuses the bucket-code
    // exchange between the self-join's left and salted-right sides
    cand.queryExecution.toRdd.foreach(_ => ())
    val fin = cand.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange"), fin.take(800))
  }

  test("q19 scoring projection stays inside whole-stage codegen (no interpreted HOFs)") {
    val p = plan("q19_quality")
    // the feature projection must not use the interpreted higher-order
    // functions (aggregate/transform/filter lambdas) NOTES bans from hot
    // paths — every expression left is codegen'd (string/collection ops).
    // (AQE's formatted explain doesn't print WholeStageCodegen spans
    // pre-execution, so absence-of-lambdas IS the codegen assertion.)
    assert(!p.contains("lambdafunction"), p.take(600))
  }

  test("q01 wordcount aggregates with map-side partial aggregation") {
    val p = plan("q01_wordcount")
    // two HashAggregates (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("q59 passage dedup prunes the documents scan to (doc_id, text)") {
    val p = plan("q59_passage_dedup")
    // lang/source/n_chars must never be read — every ReadSchema line is
    // the two-column projection
    val schemas = p.split("\n").filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach(s =>
      assert(s.contains("struct<doc_id:bigint,text:string>"), s))
  }

  test("q64 funnel pushes event-type equality into the parquet scan") {
    val p = plan("q64_funnel")
    assert(p.contains("EqualTo(event_type,view)"), p.take(400))
    assert(p.contains("EqualTo(event_type,click)"))
    assert(p.contains("EqualTo(event_type,purchase)"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q62 graph ANN search hops read the materialized adjacency, not its pipeline") {
    val p = plan("q62_ann_hnsw")
    // the localCheckpoint cut: hops scan the checkpointed edge RDD;
    // without it each hop re-embeds the whole candidate pipeline and the
    // embeddings table appears many more times
    assert(p.contains("Scan ExistingRDD"), p.take(400))
    assert("embeddings\\.parquet".r.findAllIn(p).size <= 8, "adjacency pipeline re-embedded")
    assert(!p.contains("CartesianProduct"))
  }

  test("q34 tfidf is one lazy plan: no data-scan job at construction/planning") {
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        js.stageInfos.foreach(si => stages.add(si.name))
    }
    spark.sparkContext.addSparkListener(listener)
    // the lazy-construction contract is asserted under a NON-adaptive
    // session: tfidf's termCounts checkpoint is eager = false, so
    // building + physically planning runs no job — but an AQE session
    // materializes an adaptive plan's shuffle stages inside toRdd
    // (Spark behavior for ANY lazily-checkpointed adaptive subplan,
    // not a driver-side collect in the operator), which would show up
    // here as stage-materialization jobs unrelated to the contract
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // building AND physically planning the query must not run any
      // data-path job (the corpus count is a broadcast 1-row aggregate
      // inside the plan, not a driver-side .count()); the only jobs
      // spark.read itself fires are parquet footer/schema reads at
      // Tables.table, which are metadata, not data
      val df = graft.operators.TextAnalysis.tfidf(spark, sf)
      df.queryExecution.executedPlan // force full planning
      Thread.sleep(1000) // listener bus is async; let stray jobs surface
      val dataJobs = stages.toArray(Array.empty[String])
        .filterNot(_.startsWith("parquet at Tables.scala"))
      assert(dataJobs.isEmpty, s"plan construction ran data jobs: ${dataJobs.mkString(", ")}")
      // and the count lives in the plan as a broadcast aggregate column
      assert(df.queryExecution.optimizedPlan.toString.contains("n_docs"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("q34 tfidf ranks via the string top-k aggregate, not a window") {
    val p = plan("q34_tfidf")
    assert(p.contains("ObjectHashAggregate"), "top_k_str_by_score aggregate missing")
    assert(!p.contains("Window"), "a giant doc would sort all its terms in one window task")
    // the corpus explode lives behind the termCounts lazy checkpoint
    // (Scan ExistingRDD), shared by all three consumers — the only
    // Generate left in the outer plan is the final posexplode; a second
    // one means a consumer re-derived terms from the documents scan
    assert("- Generate \\(".r.findAllIn(p).size <= 1,
      "termCounts checkpoint not shared — corpus explode duplicated")
    assert(p.contains("Scan ExistingRDD"), "termCounts checkpoint missing")
  }

  test("q69 domain cap ranks via the typed top-k aggregate, not a window") {
    val p = plan("q69_domain_cap")
    assert(p.contains("ObjectHashAggregate"), "top_k_by_score aggregate missing")
    assert(!p.contains("Window"), "a flooded source would sort in one window task")
  }

  test("q70/q75/q79 text aggregations keep map-side partial aggregation") {
    Seq("q70_vocab_oov", "q75_bm25", "q79_lm_score").foreach { q =>
      val p = plan(q)
      // partial + final pairs: at least two HashAggregate levels
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q lost partial aggregation")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q72 inverted index reads only (doc_id, text) and never windows") {
    val p = plan("q72_inverted_index")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(!p.contains("Window"))
  }

  test("q78 promo revenue broadcasts the part dim and prunes both scans") {
    val p = plan("q78_promo_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("struct<p_partkey:bigint,p_type:string>"), "part scan unpruned")
  }

  test("q68 PQ search joins encoded codes against a broadcast lookup table") {
    val p = plan("q68_ann_pq")
    assert(p.contains("BroadcastHashJoin"), "ADC lut join must broadcast")
    assert(!p.contains("Window"), "PQ path must stay window-free")
    assert(!p.contains("CartesianProduct"))
  }

  test("q76 pagerank rounds are keyed joins over the checkpointed edges") {
    val p = plan("q76_pagerank")
    assert(!p.contains("CartesianProduct"))
    // the LSH pair pipeline is cut by the localCheckpoint: the final
    // plan scans the checkpoint, not the documents table again
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 1, "edges not checkpointed")
  }

  test("q82/q73 cell assignment is group-bounded, not a flat centroid product") {
    // the composed hierarchical assignment ranks a vector only against
    // its probed coarse groups' fine centroids: the fine-ranking join
    // must be an equi-join keyed on grp_id (hash join), with no
    // corpus×k-centroid nested-loop product
    import org.apache.spark.sql.functions.col
    val v = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = v.count()
    val k = math.max(operators.Similarity.IvfMinCentroids,
      math.ceil(math.sqrt(n.toDouble)).toInt)
    val fine = operators.Similarity.trainCentroids(spark, v, n, k)
    val asg = operators.Similarity.hierCellAssignment(spark, v, fine, k)
    val p = asg.queryExecution.explainString(FormattedMode)
    assert("\\[grp_id#\\d+".r.findFirstIn(p).isDefined &&
      p.contains("BroadcastHashJoin"),
      s"fine-centroid ranking not keyed on grp_id:\n$p")
    assert(!p.contains("CartesianProduct"))
    // consumers read the MEMOIZED checkpointed assignment (the stored
    // index artifact), never a flat product over the codebook
    Seq("q82_ann_ivfpq", "q73_semdedup").foreach { q =>
      val cp = plan(q)
      assert(cp.contains("Scan ExistingRDD"), s"$q does not read the cell index")
      assert(!cp.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
  }

  test("q83 graph assignment walks the checkpointed centroid graph, window-free") {
    val p = plan("q83_ann_ivf_graph")
    // beam hops read the materialized frontier/adjacency, not their
    // build pipelines; ranking is the top-k aggregate, never a window
    assert(p.contains("Scan ExistingRDD"), "frontier/adjacency not checkpointed")
    assert(!p.contains("Window"), "graph search must stay window-free")
    assert(!p.contains("CartesianProduct"))
  }

  test("runtime bloom filter injects into the fact scan for a selective dim join") {
    // At test SF the injection never fires (the application-side scan
    // threshold is 10 GB), so force the thresholds to prove the 100 TB
    // behavior PLANS.md depends on: a filtered supplier dim (q55's
    // shape) plants bloom_filter_might_contain on the lineitem side.
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val forced = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // broadcast would bypass injection
    val saved = forced.map { case (k, _) => k -> conf.getOption(k) }
    forced.foreach { case (k, v) => conf.set(k, v) }
    try {
      assert(conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true",
        "GraftSession must pin bloom pruning on")
      val fact = graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_suppkey"), col("l_extendedprice"))
      val dim = graft.sources.Tables.supplier(spark, sf)
        .filter(col("s_nationkey") === 0).select(col("s_suppkey"))
      val p = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .queryExecution.explainString(FormattedMode)
      // creation side: a bloom_filter_agg over the filtered dim keys;
      // application side: might_contain guarding the fact scan
      assert(p.contains("bloom_filter_agg"), "no bloom filter built on the dim side")
      assert(p.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n$p")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  private def simplePlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q265 folds both aggregate levels onto the join's orderkey exchange") {
    val p = simplePlan("q265_waiting_suppliers")
    assert(p.contains("ShuffledHashJoin"), "order join must be shuffled-hash")
    assert(!p.contains("SortMergeJoin"), "no sort should precede the aggregates")
    assert(!p.contains("ObjectHashAggregate"), "no set-buffer aggregation")
    // one exchange per join side + one for the supplier rollup — the
    // two aggregate levels reuse the join's orderkey partitioning
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 3, s"expected 3 hash exchanges, plan had $hashEx:\n$p")
  }

  test("q287 computes rank and total in one window pass, no join-back") {
    val p = simplePlan("q287_trimmed_mean")
    assert(!p.contains("Join"), "bounds must not join back onto the histogram")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 2, s"expected 2 hash exchanges (histogram + window), got $hashEx")
  }

  test("q288 is a literal frame after the one transition-matrix job") {
    val p = simplePlan("q288_absorption")
    assert(p.contains("LocalTableScan") && !p.contains("Join"),
      "the types^2 unroll must be driver literals, not per-step joins")
  }

  test("q118 probes bloom and exact membership in ONE corpus pass") {
    val p = simplePlan("q118_bloom_decontam")
    val docScans = "FileScan parquet".r.findAllIn(p).length
    assert(docScans == 2,
      s"expected 2 documents scans (train probe + bench grams), got $docScans")
    assert(p.contains("BroadcastHashJoin"), "exact join must broadcast the bench gram set")
  }

  test("q171 dot products accumulate block-locally, never pairs x postings") {
    val p = simplePlan("q171_sparse_cosine")
    // the contribution self-join carries the salted (block, term) key;
    // no join on a bare pair-id column may reintroduce the posting fan-out
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("salt"), "the (block, term) self-join must be salted")
  }
}
