package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable scale-properties audit: these assertions pin the physical
  * plans to the shapes that survive a 100 TB deployment — filters and
  * projections reaching the parquet scan, small dimensions broadcast,
  * whole-stage codegen covering the hot path. A regression here is a
  * performance bug even when every value is still correct.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Final (post-AQE) plan text only — `toString` appends the pre-AQE
    * "Initial Plan" section, which would double-count operators.
    */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q_filter_project pushes predicates and prunes columns at the scan") {
    val plan = executedPlan("q_filter_project")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed to parquet in:\n$plan")
    // projection pruning: unreferenced lineitem columns must not reach
    // the scan (the plan text truncates ReadSchema, so check by absence)
    Seq("l_partkey", "l_suppkey", "l_quantity", "l_tax").foreach { c =>
      assert(!plan.contains(c), s"scan reads unreferenced column $c — pruning lost")
    }
  }

  test("q_join_broadcast broadcasts both dimension tables") {
    val plan = executedPlan("q_join_broadcast")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast == 2, s"expected 2 broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge in:\n$plan")
  }

  test("q_multi_join_agg never shuffles the fact on a dimension key") {
    val plan = executedPlan("q_multi_join_agg")
    // customer/nation joins must broadcast; the only hash exchanges
    // allowed are the lineitem⋈orders join key and the final groupBy
    assert(!"Exchange hashpartitioning\\((c_custkey|c_nationkey|n_nationkey)".r
      .findFirstIn(plan).isDefined,
      s"fact shuffled on a dimension key in:\n$plan")
  }

  test("q_agg_pricing aggregates inside whole-stage codegen") {
    val plan = executedPlan("q_agg_pricing")
    assert(plan.contains("HashAggregate"), s"no hash aggregate in:\n$plan")
    // partial (map-side) aggregation must run before the exchange:
    // the partial_ functions appear in the pre-shuffle stage
    assert(plan.contains("partial_sum") || plan.contains("partial_count")
      || plan.contains("Partial"),
      s"no map-side partial aggregation in:\n$plan")
  }

  test("ann_bruteforce keeps the probe side broadcast (no n×n shuffle)") {
    val plan = executedPlan("ann_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"probe set not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"ANN fell back to a cartesian shuffle product in:\n$plan")
  }

  test("dedup_minhash_lsh candidate join is an equi-join on band signatures") {
    val plan = executedPlan("dedup_minhash_lsh")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate generation degenerated to a cross product in:\n$plan")
  }

  test("f_hashed_features is a shuffle-free projection (sort excepted)") {
    val plan = executedPlan("f_hashed_features")
    // the only exchange allowed is the output ORDER BY's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"hashing-trick projection shuffled in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("ml_kmeans_assign broadcasts seeds and centroids, never shuffles the full rows") {
    val plan = executedPlan("ml_kmeans_assign")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroids not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"assignment degenerated to a cartesian shuffle in:\n$plan")
  }

  test("ann_pq_search: literal-codebook projection, broadcast tables, bounded top-k") {
    val plan = executedPlan("ann_pq_search")
    // the codebook is inlined, so the ONLY join is the tiny probe
    // distance-table broadcast against the code scan
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"probe distance tables not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"ADC join degenerated to a shuffled cartesian in:\n$plan")
    // code assignment is a projection: no aggregate anywhere in the plan
    assert(!plan.contains("HashAggregate"),
      s"PQ code assignment still aggregates (literal codebook lost) in:\n$plan")
    // the per-probe top-k is truncated before its exchange
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not group-limited before the shuffle in:\n$plan")
  }

  test("q_range_window shuffles once on user_id and prunes events columns") {
    val plan = executedPlan("q_range_window")
    val hashEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected exactly 1 user_id exchange, plan:\n$plan")
    assert(!plan.contains("props"), s"scan reads unreferenced column props in:\n$plan")
  }

  test("q_funnel reuses one user_id partitioning across the stage cascade") {
    val plan = executedPlan("q_funnel")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel joins degenerated in:\n$plan")
    assert(!plan.contains("props") && !plan.contains("value"),
      s"scan reads unreferenced events columns in:\n$plan")
  }

  test("q_chi_square broadcasts the totals, one fact aggregation pass") {
    val plan = executedPlan("q_chi_square")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"1-row totals not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"totals join degenerated to a cartesian shuffle in:\n$plan")
  }

  test("ann_rerank expands probes and equi-joins on bucket (no theta join)") {
    val plan = executedPlan("ann_rerank")
    assert(plan.contains("BroadcastHashJoin"),
      s"expanded probe set not broadcast-equi-joined in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"multi-probe join degenerated past the bucket equi-join in:\n$plan")
  }

  test("dedup_doc_chunk pairs via hash equi-join, never doc×doc") {
    val plan = executedPlan("dedup_doc_chunk")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"chunk-pair join degenerated in:\n$plan")
    Seq("lang", "source", "n_chars").foreach { c =>
      assert(!plan.contains(s"$c#"), s"scan reads unreferenced documents column $c")
    }
  }

  test("text_char_entropy is a shuffle-free projection (sort excepted)") {
    val plan = executedPlan("text_char_entropy")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0, s"entropy projection should not hash-shuffle:\n$plan")
  }

  test("f_lag_features shuffles the facts exactly once, on user_id") {
    val plan = executedPlan("f_lag_features")
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userEx == 1, s"expected exactly 1 user_id exchange:\n$plan")
    assert(!plan.contains("props"), "scan reads unreferenced events columns")
  }

  test("text_bigram_lm windows over the aggregated bigram table, not the corpus") {
    val plan = executedPlan("text_bigram_lm")
    assert(!plan.contains("CartesianProduct"))
    // the w1-totals window must consume the (w1,w2)-aggregate output:
    // its exchange partitions on w1 AFTER a partial_count aggregate ran
    assert(plan.contains("partial_count"), s"bigram counts lost map-side partials:\n$plan")
  }

  test("q_running_distinct: one fact shuffle on user_id, day window over the tiny aggregate") {
    val plan = executedPlan("q_running_distinct")
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userEx == 1, s"expected exactly 1 user_id exchange:\n$plan")
    assert(!plan.contains("value#") && !plan.contains("props"),
      "scan reads unreferenced events columns")
  }

  test("ann_centroid_ivf assigns cells as a projection: no Window, no cross join on the data side") {
    val plan = executedPlan("ann_centroid_ivf")
    // the codebook is a collected literal — assignment must fold over it
    // per row, never explode n·cells rows through a Window argmin
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows <= 1, s"expected only the final top-k Window, got $windows in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cell assignment degenerated to a cross join in:\n$plan")
  }

  test("graph_pagerank message passing stays on equi-joins") {
    val plan = executedPlan("graph_pagerank")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pagerank propagation degenerated:\n$plan")
  }

  test("mm_chunk_dedup materializes the frame-hash table once (no double explode+hash scan)") {
    val df = SparkEntry.queries("mm_chunk_dedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // both sides of the self-join must be served from the persisted
    // 16 B/row (doc_id, h) table — exactly one documents scan feeds it
    assert(plan.contains("InMemoryTableScan"),
      s"frame-hash table not served from cache in:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"explode+hash scan runs more than once in:\n$plan")
  }

  test("headline queries stay inside their pinned shuffle-byte budgets") {
    // under a drifted config (codec/partition-count/Spark bump) the
    // budgets measure a different environment — advisory there, see
    // ShuffleBudget.fingerprint
    assume(ShuffleBudget.enforced(spark, sf),
      s"budget gate advisory: ${ShuffleBudget.mismatches(spark, sf).mkString("; ")}")
    val budget = ShuffleBudget.forDir(sf).getOrElse(
      fail(s"no shuffle budget table for $sf"))
    val over = Bench.headline.flatMap { name =>
      val bytes = Telemetry.measure(SparkEntry.queries(name)(spark, sf))
        .shuffleBytesWritten
      budget.get(name).collect {
        case b if bytes > b => s"$name: $bytes bytes > budget $b"
      }
    }
    assert(over.isEmpty,
      s"shuffle-byte regression (plan got >2x heavier):\n${over.mkString("\n")}")
  }

  test("bench/budget config is closed: every headliner is a real query with budgets at both SFs") {
    // config-drift guard: a renamed query or a forgotten budget pin must
    // fail HERE with the missing name, not silently un-gate the query
    val qs = SparkEntry.queries.keySet
    val phantom = Bench.headline.filterNot(qs.contains)
    assert(phantom.isEmpty, s"headline names not in SparkEntry.queries: $phantom")
    Seq("sf0.001" -> ShuffleBudget.atSf0001, "sf0.1" -> ShuffleBudget.atSf01)
      .foreach { case (sfName, table) =>
        val unpinned = Bench.headline.filterNot(table.contains)
        assert(unpinned.isEmpty, s"headliners without a $sfName budget: $unpinned")
        val stray = table.keySet.filterNot(qs.contains)
        assert(stray.isEmpty, s"$sfName budgets for nonexistent queries: $stray")
      }
    // the extended (metered-only) sweep: real queries, none already in
    // the headline timing set
    val ext = ShuffleBudget.extendedAtSf01.keySet
    assert(ext.filterNot(qs.contains).isEmpty,
      s"extended budgets for nonexistent queries: ${ext.filterNot(qs.contains)}")
    assert(ext.intersect(Bench.headline.toSet).isEmpty,
      s"extended budgets duplicate headline entries: ${ext.intersect(Bench.headline.toSet)}")
  }
}
