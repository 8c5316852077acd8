package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan-shape assertions — the 100-TB safety properties the
  * row-level gates cannot see. A query can be value-correct with a plan
  * that dies at scale (quadratic joins, forced broadcasts of unbounded
  * tables, unpushed scans); these tests pin the plan shapes.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE to finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q_join_range never nested-loops (banded equi-join rewrite)") {
    val p = planOf(SparkEntry.queries("q_join_range")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString)
    assert(!p.contains("CartesianProduct"))
  }

  test("q_scan_proj prunes columns at the parquet scan") {
    val df = SparkEntry.queries("q_scan_proj")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema"))
    // only the three projected lineitem columns may be read
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice"),
      s"unpruned scan: $readSchema")
  }

  test("q_scan_range pushes the key predicate into the scan") {
    val df = SparkEntry.queries("q_scan_range")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_orderkey"), s"filter not pushed: $pushed")
  }

  test("x_winnow is single-pass map-side: zero Exchange, zero Sort") {
    // the whole MOSS derivation is per-document and runs inside the
    // native winnow_sels expression — the plan must be scan -> project,
    // with none of the gram-explode shuffle/sort the composed form paid
    val p = planOf(SparkEntry.queries("x_winnow")(spark, sf))
    assert(!p.contains("Exchange"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("Sort "), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("winnow_sels"))
  }

  test("x_repetition is single-pass map-side: zero Exchange") {
    // both gram orders come from the native gram_stats expression in
    // one projection — no explode, no per-gram groupBy, no order join
    val p = planOf(SparkEntry.queries("x_repetition")(spark, sf))
    assert(!p.contains("Exchange"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("gram_stats"))
  }

  test("q_topk plans as TakeOrderedAndProject (bounded heap, no full sort)") {
    val p = SparkEntry.queries("q_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(3).mkString)
  }

  test("q_common_nbrs_topk truncates map-side via WindowGroupLimit") {
    // the rank-filter must compile to a partial WindowGroupLimit ahead
    // of the node exchange — each map task forwards at most k rows per
    // node, so the truncation rides the shuffle instead of adding one
    val p = planOf(SparkEntry.queries("q_common_nbrs_topk")(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      p.linesIterator.take(5).mkString("\n"))
  }

  test("x_dedup_near contains no cartesian/nested-loop stage") {
    val p = planOf(SparkEntry.queries("x_dedup_near")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_dedup_simhash contains no cartesian/nested-loop stage") {
    val p = planOf(SparkEntry.queries("x_dedup_simhash")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_dedup_ngram contains no cartesian/nested-loop stage") {
    val p = planOf(SparkEntry.queries("x_dedup_ngram")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_dedup_suffix: every stage is an equi-join/range sort — no " +
      "cartesian, no nested loop, no single-partition window") {
    val p = planOf(SparkEntry.queries("x_dedup_suffix")(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // EVERY window in the plan must partition by doc_id — one global
    // (empty-partition-spec) window would pull the corpus through one
    // task, and a presence-check on the doc window alone could not
    // catch a second global one sneaking in
    val specs = p.split("windowspecdefinition\\(").drop(1)
    assert(specs.nonEmpty && specs.forall(_.startsWith("doc_id")),
      "non-doc_id-partitioned window in the x_dedup_suffix plan")
  }

  test("x_unigram_apply: corpus-proportional work is tokenize + one " +
      "doc-key aggregate; Viterbi runs on distinct words only") {
    val p = planOf(SparkEntry.queries("x_unigram_apply")(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_sim_ivf: only the bounded centroid set nested-loops; the probe->corpus search is an equi-join") {
    val p = planOf(SparkEntry.queries("x_sim_ivf")(spark, sf))
    assert(!p.contains("CartesianProduct"), "unbounded cartesian in IVF")
    // the cell-assignment BNLJ pairs vectors with the broadcast sqrt(n)
    // centroid set — bounded by construction; vector x vector never happens,
    // which the equi-join on cell (hash-joinable) witnesses.
    assert(p.contains("cell"), "expected the cell equi-join")
  }

  test("x_quality and x_sample_strat are single-scan, shuffle-free") {
    for (q <- Seq("x_quality", "x_sample_strat")) {
      val p = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("Exchange"), s"$q shuffles:\n${p.linesIterator.take(8).mkString("\n")}")
      assert(!p.contains("CartesianProduct") && !p.contains("Join"), s"$q joins")
    }
  }

  // the "gram aggregations share the doc_id partitioning" pin retired
  // with the gram_stats fusion: x_repetition no longer aggregates at
  // all — the zero-Exchange pin above is its strictly-stronger successor

  test("x_decontam broadcasts the benchmark set; corpus side never nested-loops") {
    val p = planOf(SparkEntry.queries("x_decontam")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "benchmark shingle set should broadcast")
  }

  test("x_chunk is single-scan, shuffle-free") {
    val p = planOf(SparkEntry.queries("x_chunk")(spark, sf))
    assert(!p.contains("Exchange"), s"x_chunk shuffles:\n${p.linesIterator.take(8).mkString("\n")}")
    assert(!p.contains("Join"), "x_chunk joins")
  }

  test("x_pack shuffles only on the shard key (no global sort, no join)") {
    val p = planOf(SparkEntry.queries("x_pack")(spark, sf))
    assert(!p.contains("Join"), "x_pack joins")
    // a single-partition global window would appear as Exchange SinglePartition
    assert(!p.contains("SinglePartition"),
      "x_pack must not funnel through one partition")
  }

  test("x_dedup_incr contains no cartesian/nested-loop stage") {
    val p = planOf(SparkEntry.queries("x_dedup_incr")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_bm25 plans the global top-k as TakeOrderedAndProject") {
    val p = planOf(SparkEntry.queries("x_bm25")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "bm25 top-k must not be a full global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_mix_domain never sorts; the rate join is broadcast") {
    val p = planOf(SparkEntry.queries("x_mix_domain")(spark, sf))
    assert(!p.contains("Sort "), "rate-based mixing must not sort")
    assert(p.contains("BroadcastHashJoin"),
      "per-domain rate table should broadcast back")
  }

  test("q_cdc_merge does partial aggregation before the key exchange") {
    val p = planOf(SparkEntry.queries("q_cdc_merge")(spark, sf))
    assert(!p.contains("Window"), "cdc merge must not window the changelog")
    // max_by(struct) plans as SortAggregate — partial (pre-Exchange) +
    // final, so the shuffle carries one row per key per partition
    assert("SortAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final aggregate pair")
  }

  test("x_dedup_para: boilerplate set equi-joins back (no nested loop)") {
    val p = planOf(SparkEntry.queries("x_dedup_para")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_dedup_substr contains no cartesian/nested-loop stage") {
    val p = planOf(SparkEntry.queries("x_dedup_substr")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_bpe_stats: top-k is TakeOrderedAndProject over the vocab aggregate") {
    val p = planOf(SparkEntry.queries("x_bpe_stats")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "pair top-k must not be a full global sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_pmi: pair top-k is bounded; only the 1-row totals nested-loop") {
    val p = planOf(SparkEntry.queries("x_pmi")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "pair top-k must not be a full global sort")
    assert(!p.contains("CartesianProduct"))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      "only the broadcast 1-row totals may nested-loop")
  }

  test("x_vocab plans the vocabulary top-k as TakeOrderedAndProject") {
    val p = planOf(SparkEntry.queries("x_vocab")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("x_rank_fusion: both source lists plan bounded top-k, no cartesian") {
    val p = planOf(SparkEntry.queries("x_rank_fusion")(spark, sf))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "both the lexical and dense lists must be bounded-heap top-k")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_knn_graph: only the bounded centroid set nested-loops; the neighbor join is an equi-join on cell") {
    val p = planOf(SparkEntry.queries("x_knn_graph")(spark, sf))
    assert(!p.contains("CartesianProduct"), "unbounded cartesian in knn graph")
    assert(p.contains("cell"), "expected the cell equi-join")
  }

  test("q_tpch_q6 pushes its filters into the parquet scan") {
    val df = SparkEntry.queries("q_tpch_q6")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_discount") || pushed.contains("l_quantity"),
      s"filters not pushed: $pushed")
  }

  test("q_tpch_q22: anti-join stays hash-based; only the 1-row global aggregate nested-loops") {
    val p = planOf(SparkEntry.queries("q_tpch_q22")(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // AQE's toString prints the final plan then repeats the initial plan —
    // count only the final section, or the one intentional BNLJ doubles.
    val finalPlan = p.split("== Initial Plan ==").head
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      "only the broadcast 1-row aggregate may nested-loop")
    assert(finalPlan.contains("LeftAnti"), "expected a hash-based anti-join")
  }

  test("q_tpch_q21: both correlations stay hash-based (semi + anti, no nested loop)") {
    val p = planOf(SparkEntry.queries("q_tpch_q21")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"))
    assert(!finalPlan.contains("BroadcastNestedLoopJoin"),
      "the supplier-inequality + lateness residuals must ride inside the " +
        "hash semi/anti joins, not a nested loop")
    assert(finalPlan.contains("LeftSemi"), "expected hash-based EXISTS")
    assert(finalPlan.contains("LeftAnti"), "expected hash-based NOT EXISTS")
  }

  test("q_tpch_q20: nested semi-join chain stays hash-based") {
    val p = planOf(SparkEntry.queries("q_tpch_q20")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"))
    // the broadcast 1-row (S, n) threshold aggregate is the only
    // permitted nested loop — the q22 discipline
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      "only the broadcast 1-row aggregate may nested-loop")
    assert(finalPlan.contains("LeftSemi"), "expected hash-based semi-joins")
  }

  test("q_tpch_q16: NOT-IN exclusion stays a hash anti-join") {
    val p = planOf(SparkEntry.queries("q_tpch_q16")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"))
    assert(finalPlan.contains("LeftAnti"), "expected hash-based NOT IN")
  }

  test("q_tpch_q2: correlated argmin join-back stays hash-based") {
    val p = planOf(SparkEntry.queries("q_tpch_q2")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      "the min-price join-back must be the (partkey, unit_mc) equi-join")
  }

  test("x_sample_diverse: only the bounded centroid set nested-loops") {
    val p = planOf(SparkEntry.queries("x_sample_diverse")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"))
    // assignCells' broadcast against the bounded sqrt(n) centroid set is
    // the one intentional nested loop; the centrality join is an
    // equi-join on the cell id
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
      "only the bounded centroid broadcast may nested-loop")
  }

  test("q_join_bucket: bucketed co-located join + per-key agg run with ZERO exchanges") {
    val p = planOf(SparkEntry.queries("q_join_bucket")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("SortMergeJoin"),
      "the co-located join must be the merge join that exploits bucketing")
    assert(!finalPlan.contains("Exchange"),
      s"bucketed join must not shuffle or broadcast:\n${finalPlan.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("q_group_agg does map-side partial aggregation (combiner)") {
    val p = planOf(SparkEntry.queries("q_group_agg")(spark, sf))
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("partitionBy layout gives partition-pruned reads") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables.events(spark, sf)
      .withColumn("route", org.apache.spark.sql.functions.col("event_type"))
      .write.mode("overwrite").partitionBy("route").parquet(out)
    val read = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("route") === "click")
    val scan = read.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("route"), s"route filter not pruned: $pf")
  }

  test("x_decontam_embed: benchmark broadcasts; corpus never cartesians") {
    val p = planOf(SparkEntry.queries("x_decontam_embed")(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    // the bounded benchmark side rides a broadcast (the intentional NLJ —
    // same contract as x_sim_brute); an unbroadcast cartesian would be the
    // O(n·m) shuffle that dies at corpus scale
    assert(finalPlan.contains("BroadcastNestedLoopJoin")
      || finalPlan.contains("BroadcastHashJoin"), finalPlan.linesIterator.take(8).mkString("\n"))
    assert(!finalPlan.contains("CartesianProduct"))
    // per-vector max reduces map-side: partial+final aggregate pair
    assert("HashAggregate".r.findAllIn(finalPlan).size >= 2,
      "expected partial+final max aggregation")
  }

  test("x_shuffle_epochs: one balanced range sort, no single-partition stage") {
    val finalPlan = planOf(SparkEntry.queries("x_shuffle_epochs")(spark, sf))
      .split("== Initial Plan ==").head
    // position = total order (TotalOrderPartitioner contract); a global
    // row_number would show as Exchange SinglePartition and serialize
    assert(!finalPlan.contains("SinglePartition"),
      finalPlan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    val ex = finalPlan.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("rangepartitioning")),
      s"only the range sort may shuffle:\n${ex.mkString("\n")}")
  }

  test("x_curriculum: quality scan + one range sort, nothing else shuffles") {
    val finalPlan = planOf(SparkEntry.queries("x_curriculum")(spark, sf))
      .split("== Initial Plan ==").head
    assert(!finalPlan.contains("SinglePartition"))
    val ex = finalPlan.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(ex.nonEmpty && ex.forall(_.contains("rangepartitioning")),
      s"only the schedule sort may shuffle:\n${ex.mkString("\n")}")
  }

  test("q_window_range: range frame rides the user_id partitioning") {
    val finalPlan = planOf(SparkEntry.queries("q_window_range")(spark, sf))
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("Window"), "expected a Window operator")
    assert(!finalPlan.contains("SinglePartition"),
      "per-user frames must not serialize to one partition")
  }

  test("q_funnel: all three stage windows ride ONE user_id shuffle") {
    val finalPlan = planOf(SparkEntry.queries("q_funnel")(spark, sf))
      .split("== Initial Plan ==").head
    // events must cross the wire once: the three window passes and the
    // per-user rollup share the user_id hash partitioning; only the
    // 1-row global report may add its tiny SinglePartition exchange
    val hashEx = finalPlan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 1,
      s"funnel re-shuffled events:\n${hashEx.mkString("\n")}")
  }

  test("q_sessionize: window + per-session rollup ride ONE user_id shuffle") {
    val finalPlan = planOf(SparkEntry.queries("q_sessionize")(spark, sf))
      .split("== Initial Plan ==").head
    // groupBy(user_id, session_idx) must be satisfied by the window's
    // user_id hash clustering (subset rule) — a second Exchange here
    // would double the wire cost of sessionizing a 100-TB event log
    val hashEx = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 1,
      s"sessionize re-shuffled events:\n${hashEx.mkString("\n")}")
    assert(!finalPlan.contains("SinglePartition"),
      "per-user sessions must not serialize to one partition")
  }

  test("q_scd2: change detection and interval stitch share one shuffle") {
    val finalPlan = planOf(SparkEntry.queries("q_scd2")(spark, sf))
      .split("== Initial Plan ==").head
    val hashEx = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 1,
      s"scd2 re-shuffled events:\n${hashEx.mkString("\n")}")
  }

  test("q_pagerank: every iteration is equi-join + hash agg, no cartesian") {
    val finalPlan = planOf(SparkEntry.queries("q_pagerank")(spark, sf))
    assert(!finalPlan.contains("CartesianProduct")
      && !finalPlan.contains("BroadcastNestedLoopJoin"), "non-equi stage")
  }

  test("x_embed_quantize: bounded-probe broadcast + partial top-k agg") {
    val finalPlan = planOf(SparkEntry.queries("x_embed_quantize")(spark, sf))
      .split("== Initial Plan ==").head
    // the probe side must broadcast (the =!= residual makes this the same
    // intentional bounded BNLJ contract as x_sim_brute); the corpus must
    // never shuffle pre-aggregation — ObjectHashAggregate partial+final
    // is the TopKByScore pair
    assert(finalPlan.contains("BroadcastNestedLoopJoin")
      || finalPlan.contains("BroadcastHashJoin"),
      finalPlan.linesIterator.take(8).mkString("\n"))
    assert(!finalPlan.contains("CartesianProduct"))
    assert("ObjectHashAggregate".r.findAllIn(finalPlan).size >= 2,
      "expected partial+final typed top-k aggregation")
  }

  test("x_outlier_mad: no per-group value buffer (distribution walk only)") {
    val finalPlan = planOf(SparkEntry.queries("x_outlier_mad")(spark, sf))
    // the medians must come from the (grp, x) count table + windows —
    // a Percentile aggregate would be the buffer that OOMs at 100 TB
    assert(!finalPlan.contains("percentile"), "buffered percentile in plan")
    assert(!finalPlan.contains("CartesianProduct"))
  }

  test("q_join_fuzzy: candidates from the gram index, never all pairs") {
    val p = planOf(SparkEntry.queries("q_join_fuzzy")(spark, sf))
    // the entire point of the blocking: no cross product anywhere — the
    // pair stage must be an equi-join on (gram, occ)
    assert(!p.contains("CartesianProduct"), "fuzzy join fell back to cross")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "fuzzy join planned a nested loop")
  }

  test("q_basket: pairs expand from per-basket arrays, no cross product") {
    val p = planOf(SparkEntry.queries("q_basket")(spark, sf))
    // candidates expand map-side from each basket's sorted item set
    // (posexplode + suffix-slice explode) — never an item×item or
    // basket×basket cross product
    assert(!p.contains("CartesianProduct"), "cross-product pair stage")
    assert(p.contains("Generate"), "expected array pair expansion")
  }

  test("q_rfm: quantile windows stay nation-partitioned (no global window)") {
    val finalPlan = planOf(SparkEntry.queries("q_rfm")(spark, sf))
      .split("== Initial Plan ==").head
    // an unpartitioned quantile/score stage would single-partition the
    // customer table — the shape that dies on a 100-TB ledger. The 1-row
    // scalar aggregates (max orderdate) legitimately finalize on a
    // SinglePartition exchange AFTER partial agg; what must not exist is
    // a Window whose input collapses to one partition.
    val lines = finalPlan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val above = lines.slice(math.max(0, i - 4), i).mkString("\n")
        assert(!above.contains("Window"),
          s"single-partition Window stage at plan line $i:\n$above")
      }
    assert(!finalPlan.contains("CartesianProduct"))
  }

  test("q_sql_lateral decorrelates to a ranked join, not a per-row rescan") {
    val p = planOf(SparkEntry.queries("q_sql_lateral")(spark, sf))
    // Catalyst must rewrite the correlated LIMIT subquery into a window
    // rank over one shuffle of customer — a nested-loop per nation row
    // (or a cartesian) is the scale failure this pin guards against
    assert(!p.contains("CartesianProduct"), "lateral fell back to cartesian")
    assert(p.contains("row_number") || p.contains("Window"),
      s"expected decorrelated rank plan:\n${p.linesIterator.take(12).mkString("\n")}")
  }

  test("q_sql_recursive executes as a bounded loop, not a cartesian") {
    val finalPlan = planOf(SparkEntry.queries("q_sql_recursive")(spark, sf))
    assert(!finalPlan.contains("CartesianProduct")
      && !finalPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("q_triangles contains no cartesian/nested-loop stage") {
    // the whole point of the degree orientation: wedges and closing
    // edges are plain equi-joins — a BNLJ here is the O(n³) death
    val p = planOf(SparkEntry.queries("q_triangles")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_idx_lookup pushes the index predicate into the index scan") {
    val df = SparkEntry.queries("q_idx_lookup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("ival"),
      s"index probe not pushed to the index file scan: $pushed")
  }

  test("x_pq joins the codebook by hash, never nested-loop") {
    val p = planOf(SparkEntry.queries("x_pq")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "codebook should broadcast")
  }

  test("x_sample_weighted plans one scan + one per-group window") {
    val p = planOf(SparkEntry.queries("x_sample_weighted")(spark, sf))
    assert(!p.contains("Join"), "sampling must not join")
    assert(p.contains("Window"), "per-group top-k rides a rank window")
  }

  test("q_scan_partition prunes at the directory level (PartitionFilters)") {
    val df = SparkEntry.queries("q_scan_partition")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderpriority"),
      s"partition predicate not pruning directories: $pf")
  }

  test("q_join_bloom: bitmap probe adds no shuffle; exact join still runs") {
    val p = planOf(SparkEntry.queries("q_join_bloom")(spark, sf))
    // the one-row bitmap rides a broadcast nested loop (bounded by
    // construction — a single row); the fact side must not CartesianProduct
    // and the verify semi-join must be a hash join, not nested-loop on keys
    assert(!p.contains("CartesianProduct"), "unbounded cartesian in bloom probe")
    assert(p.contains("LeftSemi"), "exact verify semi-join missing")
  }

  test("q_bfs: every round is equi-join + hash agg, no cartesian") {
    val p = planOf(SparkEntry.queries("q_bfs")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_unpivot is single-scan, shuffle-free (stack is a map-side generator)") {
    val p = planOf(SparkEntry.queries("q_unpivot")(spark, sf))
    assert(!p.contains("Exchange"),
      s"q_unpivot shuffles:\n${p.linesIterator.take(8).mkString("\n")}")
    assert(!p.contains("Join"), "q_unpivot joins")
  }

  test("q_skyline: frontier join is hash-based, window partitions by brand") {
    val p = planOf(SparkEntry.queries("q_skyline")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "skyline must not fall back to the quadratic dominance join")
    // the prefix-max window runs per brand, never through one partition
    assert(!p.contains("SinglePartition"),
      "skyline must not funnel through one partition")
  }

  test("x_bpe_apply is single-scan, shuffle-free (merges ride as literals)") {
    val p = planOf(SparkEntry.queries("x_bpe_apply")(spark, sf))
    assert(!p.contains("Exchange"),
      s"x_bpe_apply shuffles:\n${p.linesIterator.take(8).mkString("\n")}")
    assert(!p.contains("Join"), "x_bpe_apply joins")
  }

  test("newest operators: no CartesianProduct anywhere, joins stay hash/broadcast") {
    // crossJoin(broadcast(1-row/bounded)) legitimately plans as BNLJ;
    // an unhinted CartesianProduct would be the scale-killer
    for (q <- Seq("q_transitions", "q_trending", "q_concurrency",
        "x_nb_langid", "x_centroid_classify", "x_eval_metrics",
        "x_sim_sparse", "x_oov_rate", "q_window_ratio", "q_cdc_diff",
        "q_quantile_ranged")) {
      val p = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("round-11 operators: video probe map-only; split/drift joins stay hashed") {
    // x_video_probe: the box walk is pure map work — the only exchange
    // allowed is the fixture synthesizer's single-split guard repartition
    val pv = planOf(SparkEntry.queries("x_video_probe")(spark, sf))
    assert(!pv.contains("CartesianProduct") && !pv.contains("SortMergeJoin"),
      "video probe must not join or sort")
    for (q <- Seq("x_split_nodup", "x_kl_drift")) {
      val p = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    // x_kl_drift's corpus-totals table is a 1-row broadcast, never a
    // shuffled join against the (group, term) table
    val pk = planOf(SparkEntry.queries("x_kl_drift")(spark, sf))
    assert(pk.contains("BroadcastNestedLoopJoin") ||
      pk.contains("BroadcastExchange"),
      "corpus totals must broadcast")
    // and the per-group KL total is FOLDED into the final aggregate
    // (Σ tf·ln(tf·n/ctf) identity) — the docstring's no-window-pass
    // claim, pinned so a refactor back to a per-group window total
    // (one extra corpus-vocabulary-sized sort+shuffle) fails here
    assert(!pk.contains("Window"),
      "x_kl_drift must not plan a window pass — the per-group total " +
        "folds into the aggregate")
  }

  test("q_concurrency and q_unpivot expand map-side (no join in the explode path)") {
    val p = planOf(SparkEntry.queries("q_concurrency")(spark, sf))
    assert(!p.contains("Join"), "bucket expansion must not join")
  }

  test("q_window_ratio: window rides the aggregate, no second join-back") {
    val p = planOf(SparkEntry.queries("q_window_ratio")(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), "expected the ratio window")
  }

  test("no forced broadcast of scale-proportional tables in the join tier") {
    // nation/region hints are fine (fixed 25/5 rows); part and customer
    // must not carry hints — their joins may still BE broadcast at tiny SF
    // by the size-based planner, which is exactly the point: the DECISION
    // stays with JoinSelection/AQE.
    val multi = SparkEntry.queries("q_join_multi")(spark, sf)
    val hinted = multi.queryExecution.logical.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size <= 2, s"more hints than the two fixed dims: $hinted")
  }
}
