package graft

/** Physical/logical plan assertions — the 100 TB guardrails (SURVEY §5):
  * filters must reach the parquet scan, no forced broadcast of
  * scale-growing tables, and no Cartesian product anywhere in the
  * dedup/similarity family. */
class PlanSpec extends SparkSpec {

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def analyzed(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed.toString

  test("q1/q2: filters are pushed down to the parquet scan") {
    for (q <- Seq("q1_pricing_summary", "q2_revenue_filter")) {
      val plan = executed(q)
      assert(plan.contains("PushedFilters: ["), s"$q plan has no PushedFilters")
      assert(plan.contains("l_shipdate"), s"$q shipdate filter missing from scan")
      assert(!plan.contains("PushedFilters: []"), s"$q pushed-filter list is empty")
    }
  }

  test("q26: the disjunction pushes to BOTH scans (A27's reason to exist)") {
    val plan = executed("q26_disjunctive_revenue")
    // each scan must carry an Or-filter on its own columns — a plan
    // reading either table in full would ship the whole fact/dim to
    // the join at 100 TB
    val scans = plan.split("FileScan").toSeq.tail
    val partScan = scans.find(_.contains("p_brand")).getOrElse("")
    val lineScan = scans.find(_.contains("l_quantity")).getOrElse("")
    assert(partScan.contains("Or(") && partScan.contains("p_brand"),
      s"part scan lacks the pushed brand/size disjunction:\n$partScan")
    assert(lineScan.contains("Or(") && lineScan.contains("l_quantity"),
      s"lineitem scan lacks the pushed quantity disjunction:\n$lineScan")
  }

  test("scan prunes columns: q2 reads only the columns it needs") {
    val plan = executed("q2_revenue_filter")
    // ReadSchema must not include untouched wide columns like l_comment
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty, "no ReadSchema in scan")
    assert(!readSchema.contains("l_comment"), "q2 reads l_comment it never uses")
  }

  test("broadcast hints exist only for fixed-size dims (region/nation)") {
    // q5 keeps exactly 2 hints (nation, region); q3/q6 have none — the
    // customer/supplier joins must be left to AQE.
    def hintCount(q: String) = "ResolvedHint".r.findAllIn(analyzed(q)).size
    assert(hintCount("q5_region_volume") == 2)
    assert(hintCount("q3_shipping_priority") == 0)
    assert(hintCount("q6_top_customers") == 0)
    // per-user stage marks grow with the user population: never hinted
    assert(hintCount("q17_funnel") == 0)
  }

  test("dedup/similarity plans contain no CartesianProduct") {
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
        "dedup_embedding", "sim_search_lsh")) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q has a Cartesian product")
    }
  }

  test("sim_search_topk broadcasts only the query side") {
    val plan = executed("sim_search_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "brute-force top-k should be a broadcast nested-loop join of the tiny query set")
    assert(!plan.contains("CartesianProduct"))
  }

  test("ledger/zone-sync anti-joins stay key-only (no wide shuffle)") {
    val plan = executed("sync_zone_diff")
    assert(plan.contains("LeftAnti"), "sync plan must use anti-joins")
  }

  test("approx distinct: no Expand, and within 5% of exact counts") {
    val approxPlan = executed("q8_distinct_approx")
    assert(!approxPlan.contains("Expand"),
      "HLL variant must not multiply the input per distinct column")
    assert(executed("q8_distinct_stats").contains("Expand"),
      "sanity: the exact variant does pay the Expand")
    val exact = SparkEntry.queries("q8_distinct_stats")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q8_distinct_approx")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (p, o)) =>
      val (pe, oe) = exact(k)
      assert(math.abs(p - pe) <= math.max(1L, (pe * 0.05).toLong), s"supplier $k parts")
      assert(math.abs(o - oe) <= math.max(1L, (oe * 0.05).toLong), s"supplier $k orders")
    }
  }

  test("q12: date filter pushes to the lineitem scan, no forced broadcast") {
    val plan = executed("q12_promo_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate must reach the scan")
    assert("ResolvedHint".r.findAllIn(analyzed("q12_promo_revenue")).isEmpty)
  }

  test("native-expression queries stay inside whole-stage codegen") {
    for (q <- Seq("dedup_minhash", "text_langid", "mm_features", "dedup_embedding")) {
      // AQE prints codegen spans ("*(n) Op") only in the FINAL plan;
      // drive THIS QueryExecution (df.write would build a separate one)
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        s"$q lost its codegen span — a native expression fell back to interpreted")
    }
  }

  test("sample_mixture is shuffle-free up to the output sort") {
    val df = SparkEntry.queries("sample_mixture")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the mixture coin must stay a narrow projection:\n$plan")
  }

  test("text_contamination: the benchmark set joins by broadcast") {
    val df = SparkEntry.queries("text_contamination")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"membership test must broadcast the benchmark n-grams:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not shuffle for the membership test:\n$plan")
  }

  test("q13 pivot with explicit values scans events exactly once") {
    val df = SparkEntry.queries("q13_event_pivot")(spark, sfDir)
    df.queryExecution.toRdd.count()
    // AQE repeats the tree under "== Initial Plan ==" — count the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"explicit pivot values must not trigger a discovery scan ($scans scans):\n$plan")
  }

  test("q6 rank<=5 plans a partial WindowGroupLimit top-k") {
    // segment cardinality is tiny (few mktsegments), so without the
    // partial top-k every map task would ship ALL its customers to ~5
    // reducers and the final rank would run at parallelism 5; Spark 4's
    // WindowGroupLimit keeps only each task's top-5 before the exchange
    val df = SparkEntry.queries("q6_top_customers")(spark, sfDir)
    df.queryExecution.toRdd.count() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"q6 must push a partial top-k below the segment shuffle:\n$plan")
  }

  test("q21 EXISTS/NOT-EXISTS become semi/anti self-joins, no cartesian") {
    val df = SparkEntry.queries("q21_waiting_supplier")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"q21 must semi-join co-suppliers:\n$plan")
    assert(plan.contains("LeftAnti"), s"q21 must anti-join late co-suppliers:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the non-equi supplier predicate must ride the l_orderkey equi-join:\n$plan")
  }

  test("q21 semi/anti spelling equals the per-order aggregate spelling") {
    import org.apache.spark.sql.functions._
    // alternate face: one groupBy(l_orderkey) computing (n_supp,
    // n_late_supp), joined back — proves the correlated-subquery logic
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate")
    val l = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val perOrder = l.groupBy(col("l_orderkey").as("k"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late_supp"))
    val agg = l.where(col("is_late"))
      .join(perOrder, col("l_orderkey") === col("k"))
      .where(col("n_supp") > 1 && col("n_late_supp") === 1)
      .join(graft.sources.Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val semi = SparkEntry.queries("q21_waiting_supplier")(spark, sfDir)
      .collect().map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    assert(semi == agg, "the two q21 spellings must agree supplier-by-supplier")
  }

  test("q22 prunes the fact scan through a broadcast semi-join, one lineitem scan") {
    val df = SparkEntry.queries("q22_dominant_supplier")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("LeftSemi"), s"part filter must semi-join the fact:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the filtered part dim must broadcast:\n$plan")
    val factScans = "Scan parquet".r.findAllIn(plan).size
    // lineitem once + part once + supplier once = 3 scans total
    assert(factScans <= 3, s"per-part total must re-aggregate, not re-scan ($factScans scans)")
  }

  test("q28 prunes the fact scan first, broadcasts all dims, one lineitem scan") {
    val df = SparkEntry.queries("q28_market_share")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("LeftSemi"), s"part filter must semi-join the fact:\n$plan")
    // one scan each: lineitem, part, orders, customer, supplier, nation ×2, region
    val factScans = "Scan parquet".r.findAllIn(plan).size
    assert(factScans <= 8, s"share must be a window over the aggregated frame, " +
      s"not a re-aggregate that duplicates the fact subtree ($factScans scans)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q30 pushes both fact filters, broadcasts nation, plans a TakeOrdered top-20") {
    val df = SparkEntry.queries("q30_returned_revenue")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered over the aggregate, not a global sort:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"return-flag filter must reach the lineitem scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window must reach the orders scan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q31 aggregates orders per custkey BEFORE the left join (no raw-fact join)") {
    val df = SparkEntry.queries("q31_cust_distribution")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // exactly two scans (customer + orders), and the orders side must be
    // aggregated before joining: the join's build/stream inputs both sit
    // above HashAggregate nodes, so a plan where the raw orders rows meet
    // customer directly would show the join BELOW the first aggregate
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected 2 scans, got $scans:\n$plan")
    // the tree prints top-down, so the per-custkey aggregate sitting
    // INSIDE the join's subtree appears after the join line
    val joinAt = plan.indexOf("Join")
    assert(joinAt >= 0 &&
      plan.indexOf("HashAggregate(keys=[o_custkey", joinAt) > joinAt,
      s"orders must pre-aggregate per custkey under the join:\n$plan")
    assert(plan.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"exclusion predicate must reach the orders scan:\n$plan")
    // the histogram keeps a genuine left join (zero-order bucket)
    assert(plan.contains("LeftOuter"), s"left join required for the 0 bucket:\n$plan")
  }

  test("IVF assignment is shuffle-free: no corpus exchange keyed on vec_id") {
    val plan = executed("sim_search_ivf")
    // the old join+window spelling exchanged n·k rows on vec_id twice
    // (assignment + probes); the native argmax projection must leave NO
    // vec_id-keyed exchange anywhere before the posting-list join
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"IVF still shuffles the corpus on vec_id:\n$plan")
    assert(plan.contains("nearest_centroids"),
      "assignment must be the native narrow argmax projection")
  }

  test("sessionization shuffles once on user_id (windows + both aggs reuse it)") {
    val plan = executed("stream_sessionize")
    val dataShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataShuffles == 1,
      s"lag window, session agg and user agg must share one user_id shuffle:\n$plan")
  }

  test("q35 sessions: session rollup reuses the user_id window shuffle") {
    val plan = executed("q35_sessions")
    // (user_id, sess) clustering is satisfied by the window's user_id
    // hash partitioning, so the only OTHER exchange is the tiny
    // day-level aggregate over the session-sized frame.
    val dataShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataShuffles == 2,
      s"expected user_id shuffle (windows + session rollup) + day agg only:\n$plan")
  }

  test("q37 grouping sets: both report granularities come from ONE Expand pass") {
    val plan = executed("q37_grouping_sets")
    assert("Expand".r.findAllIn(plan).size == 1,
      s"grouping sets must expand once, not once per set:\n$plan")
    // one scan of orders feeds both granularities
    assert("orders.parquet".r.findAllIn(plan).size == 1,
      s"the fact must be scanned exactly once:\n$plan")
  }

  test("dedup_edit: the Levenshtein confirm stays equi-join-bounded (no cartesian)") {
    val plan = executed("dedup_edit")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the DP confirm must run on the LSH candidate list via equi-joins only:\n$plan")
    assert(plan.contains("levenshtein"),
      "the confirm predicate must be the codegen'd built-in")
  }

  test("corpus_overlap_kmv: the corpus pass runs once; the S^2 stage is sketch-sized") {
    val plan = executed("corpus_overlap_kmv")
    // both pairwise sides must read the ONE persisted sketch frame (the
    // corpus explode+aggregate executes once, at cache materialization)
    assert("InMemoryTableScan".r.findAllIn(plan).size == 2,
      s"both join sides must read the cached sketch frame:\n$plan")
    // above the cache reads (the pairwise region) nothing may shuffle
    // content: the only exchanges are the broadcast of one sketch side
    // and the final S^2-sized output sort
    val pairwiseRegion = plan.substring(0, plan.indexOf("InMemoryTableScan"))
    assert(!pairwiseRegion.contains("Exchange hashpartitioning"),
      s"the pairwise stage must not re-shuffle content:\n$plan")
    assert(pairwiseRegion.contains("BroadcastNestedLoopJoin"),
      "the S^2 stage joins broadcast-tiny sketch frames")
  }

  test("dsir_select: top-k plans as TakeOrdered, ratio table broadcasts") {
    val plan = executed("dsir_select")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the Gumbel top-k must be a per-partition-heap TakeOrdered, not a global sort:\n$plan")
    // the 1024-row log-ratio table joins by broadcast — the corpus-side
    // bucket counts never shuffle for it
    assert(plan.contains("BroadcastHashJoin"),
      s"the B-row ratio table must broadcast into the scoring join:\n$plan")
  }

  test("ExactSubstr family: no cartesian, scans pruned to the text columns") {
    for (q <- Seq("dedup_exact_substr", "text_remove_dup_spans",
        "dedup_incremental_spans")) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
      // the documents scan must not read lang/n_chars the faces never use
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchemas.contains("n_chars"), s"$q reads n_chars it never uses")
    }
  }

  test("dedup_incremental_spans probes with a semi-join (history never re-pairs)") {
    val plan = executed("dedup_incremental_spans")
    assert(plan.contains("LeftSemi"),
      s"the standing-set probe must be a semi-join:\n$plan")
  }

  test("text_contamination_bloom: scan-local might_contain ahead of the confirm join") {
    val plan = executed("text_contamination_bloom")
    assert(plan.contains("might_contain"),
      s"the bloom prefilter must appear in the physical plan:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the exact confirm must remain a semi-join:\n$plan")
  }

  test("cached serve faces read their persisted artifacts, not retrain plans") {
    // force artifacts to exist, then check the SERVE plan scans them
    graft.ops.ArtifactStore.rootOverride = Some(tmpDir("planspec-artifacts"))
    try {
      for ((q, artifact) <- Seq(
          "sim_search_ivfpq_cached" -> "ivfpq_postings",
          "text_perplexity_quantized_cached" -> "qlm_seen",
          "quality_ccnet_cached" -> "ccnet_lm",
          "dedup_semantic_pq_cached" -> "sempq_codes",
          "dedup_semantic_incremental_cached" -> "vcodes")) {
        val plan = executed(q)
        assert(plan.contains(artifact),
          s"$q serve plan must scan the persisted $artifact table:\n$plan")
      }
    } finally graft.ops.ArtifactStore.rootOverride = None
  }

  test("PQ semantic dedup family: no cartesian beyond broadcast literals") {
    for (q <- Seq("dedup_semantic_pq", "dedup_semantic_incremental")) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
    }
  }

  test("dedup_span_origin: no cartesian, scan pruned to the used columns") {
    val plan = executed("dedup_span_origin")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("n_chars"), "reads n_chars it never uses")
  }

  test("mixture_effective + contamination_items: no cartesian, pruned scans") {
    for (q <- Seq("mixture_effective", "contamination_items")) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchemas.contains("n_chars"), s"$q reads n_chars it never uses")
      assert(!readSchemas.contains("lang"), s"$q reads lang it never uses")
    }
  }

  test("dedup_chunk_origin: no cartesian, scan pruned to the used columns") {
    val plan = executed("dedup_chunk_origin")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("n_chars"), "reads n_chars it never uses")
    assert(!readSchemas.contains("lang"), "reads lang it never uses")
  }

  test("contamination_semantic: eval side broadcasts, no per-item window shuffle") {
    val plan = executed("contamination_semantic")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the eval side must broadcast:\n$plan")
    // the argmax is two partial-agg passes by design — a window here
    // would shuffle the whole scored frame into |items| partitions
    assert(!plan.contains("WindowExec") && !plan.contains("RunningWindowFunction"),
      s"no window over the scored frame:\n$plan")
  }

  test("corpus_batch_drift + pack_efficiency: no cartesian, pruned scans") {
    for ((q, banned) <- Seq(
        "corpus_batch_drift" -> Seq("lang"),
        "pack_efficiency" -> Seq("lang", "n_chars", "source", "doc_id"))) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
      banned.foreach(c =>
        assert(!readSchemas.contains(c), s"$q reads $c it never uses"))
    }
  }

  test("dedup_curve: counts the keeper out — no window/row_number, no cartesian") {
    val plan = executed("dedup_curve")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("row_number"),
      s"dup mass needs per-content counts only — a window here is waste:\n$plan")
  }

  test("text_contamination_triage: bloom prefilter + semi-join confirm survive the triage cut") {
    val plan = executed("text_contamination_triage")
    assert(plan.contains("might_contain"),
      s"the bloom prefilter must appear in the physical plan:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the exact confirm must remain a semi-join:\n$plan")
  }

  test("search_bm25: query side broadcasts, corpus never cartesians, scans pruned") {
    val plan = executed("search_bm25")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // the postings join must see the eval-sized query-term frame as the
    // broadcast side — a shuffled hash join there reshuffles the corpus
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"query terms must broadcast into the postings join:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("n_chars"), "reads n_chars it never uses")
    assert(!readSchemas.contains("lang"), "reads lang it never uses")
    // the per-item top-10 rank must prune MAP-SIDE (Partial
    // WindowGroupLimit): the final |items|-partition window then sees
    // <= 10 rows per map partition, not the whole candidate set — the
    // difference between a straggler and a constant at 100 TB
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank<=10 must push a partial WindowGroupLimit below the exchange:\n$plan")
  }

  test("search_hybrid: both arms stay cartesian-free; semantic arm broadcasts the queries") {
    val plan = executed("search_hybrid")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the cosine arm must broadcast the query set:\n$plan")
  }

  test("dedup_minhash_tuning: band-equi joins only, one signature aggregate feeds all configs") {
    val plan = executed("dedup_minhash_tuning")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // every pair join must be keyed on (band_idx, band_key) — the
    // reused cached signature frame appears once per config explode
    assert(plan.contains("band_key"), s"band-keyed joins missing:\n$plan")
  }
}
