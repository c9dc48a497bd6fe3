package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** One smoke+invariant spec per operator family (SURVEY.md §6).
  * DuckDB value parity is checked by tools/oracle_check.py + the
  * driver's gate; here we assert structural invariants and plan shape.
  */
class OperatorSpec extends GraftSpec {

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no query plans a CartesianProduct; nested-loop joins only where designed") {
    // BroadcastNestedLoopJoin is legitimate ONLY for broadcast-scalar or
    // non-equi-broadcast shapes; anything else is a scale killer.
    val bnljAllowed = Set(
      "a11_due_sources",       // 1-row as-of aggregate broadcast
      "q27_balance_gap",       // 1-row balance-average broadcast
      "d31_source_divergence", // 1-row corpus-total broadcast
      "d61_token_burstiness",  // 1-row corpus-doc-count broadcast
      "d63_collocations",      // 1-row corpus-token-total broadcast
      "d72_vocab_growth",      // 1-row bucket-width broadcast
      "a31_zone_map_audit",    // 8-row probe set × reduced zone-map frame
      "c31_active_users",      // 1-row max-day broadcast (span clip)
      "a36_incremental_agg",   // 1-row watermark-scalar broadcast
      "d85_bm25_topk",         // 1-row corpus-scalars (T, D) broadcast
      "q57_cardinality_audit", // 1-row fact-stats (|A|, ndv_A) broadcast
      "q59_basket_pairs",      // 1-row basket-count scalar broadcast
      "d9_cosine_topk",        // broadcast 10-row query set, =!= condition
      "d36_filtered_search",   // same broadcast-query shape as d9
      "d65_ann_recall",        // composes d9+d10, inherits their shape
      "c42_survival_km",       // 1-row corpus-end-day scalar broadcast
      "d92_mips_topk",         // broadcast 10-row query set, =!= condition (d9's shape)
      "d93_mips_lsh",          // 1-row max-norm scalar broadcast (the augmentation M2)
      "d98_vocab_coverage",    // 1-row corpus-totals scalar broadcast
      "d103_cluster_profile",  // 1-row corpus-doc-count broadcast (×2: hist + singleton row)
      "q73_anova_two_way",     // 1-row moment frames (tot×ma×mb×mc) combined for 5 effect rows
      "d114_novelty_curve",    // 1-row corpus-span scalar broadcast (d61 idiom)
      "q84_gk_gamma",          // ≤15×15 cross-tab cell pairs, non-equi (a31 precedent)
      "q90_theil_index")       // 1-row grand-totals broadcast (q27 idiom)
    // (q11/q15 left the list in r6: their scalar broadcasts became
    // unpartitioned windows over already-aggregated frames — one scan)
    val bnljSeen = scala.collection.mutable.Set[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (plan.contains("BroadcastNestedLoopJoin")) bnljSeen += name
    }
    val unexpected = bnljSeen.toSet -- bnljAllowed
    assert(unexpected.isEmpty, s"unexpected nested-loop joins in: $unexpected")
  }

  test("r6 plan shapes: single fact scans and map-side group limits hold") {
    // regression guard for the r6 scan-count sweep: the global-scalar /
    // agg-self-join forms quietly re-scan the fact table when edited
    def scanCount(df: org.apache.spark.sql.DataFrame, table: String): Int = {
      val s = df.queryExecution.executedPlan.toString
      s.split(java.util.regex.Pattern.quote(s"$table.parquet"), -1).length - 1
    }
    assert(scanCount(Analytics.q11GlobalThreshold(spark, sfDir), "lineitem") == 1)
    assert(scanCount(Analytics.q15Maxsub(spark, sfDir), "lineitem") == 1)
    assert(scanCount(Analytics.q24CorrAvg(spark, sfDir), "lineitem") == 1)
    assert(scanCount(Analytics.q33TopSupplier(spark, sfDir), "lineitem") == 1)
    assert(scanCount(TextOps.d31SourceDivergence(spark, sfDir), "documents") == 2,
      "d31 must stay at heavy-pipeline-once + cheap count scan")
    val d30plan = TextOps.d30DomainCap(spark, sfDir).queryExecution.executedPlan.toString
    assert(d30plan.contains("WindowGroupLimit"), d30plan.take(1500))
    // late-r6 additions: the reduce-first + window-over-reduced forms
    // must keep their single fact scan (no scalar-broadcast re-derivation)
    assert(scanCount(Etl.a18IncrementalPartitions(spark, sfDir), "events") == 1)
    assert(scanCount(Events.c9RfmSegments(spark, sfDir), "events") == 1)
    assert(scanCount(Events.c8InterEvent(spark, sfDir), "events") == 1)
    assert(scanCount(CorpusOps.d37LengthProfile(spark, sfDir), "documents") == 1)
    assert(scanCount(CorpusOps.d33TrainWindows(spark, sfDir), "documents") == 1)
    assert(scanCount(CorpusOps.d34IdfTerms(spark, sfDir), "documents") == 1)
    assert(scanCount(Analytics.q37BlameSupplier(spark, sfDir), "lineitem") == 1)
    assert(scanCount(Analytics.q38PartShare(spark, sfDir), "lineitem") == 1)
    // r7 additions: c19's sweep deltas via explode (a union of two segs
    // projections re-evaluated the whole session lineage per side) and
    // c21's boundary merges via lag (a (user, day+1) self-join re-ran
    // the scan+window three times)
    assert(scanCount(Events.c19PeakConcurrency(spark, sfDir), "events") == 1)
    assert(scanCount(Events.c21SessionizeSalted(spark, sfDir), "events") == 1)
    assert(scanCount(Events.c22AsofForward(spark, sfDir), "events") == 1)
    assert(scanCount(Analytics.q47OrderGaps(spark, sfDir), "orders") == 1)
    assert(scanCount(Analytics.q48DecileShift(spark, sfDir), "orders") == 1)
    assert(scanCount(TextOps.d62LexicalDiversity(spark, sfDir), "documents") == 1)
    assert(scanCount(Etl.a28LateDataAudit(spark, sfDir), "events") == 1)
  }

  test("q37 window form equals the textbook EXISTS/NOT-EXISTS formulation") {
    // independent reformulation: classic semi/anti joins instead of the
    // order-keyed window — different plan, must produce identical rows
    val perOS = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    val flag = perOS
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("last_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"), col("late"))
      .cache()
    val others = flag.select(col("ok").as("ok2"), col("sk").as("sk2"), col("late").as("late2"))
    val classic = flag.filter(col("late"))
      .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(others.filter(col("late2")),
        col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_anti")
      .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
    val expected = classic
      .join(Tables.supplier(spark, sfDir), col("sk") === col("s_suppkey"))
      .select("s_name", "numwait").orderBy(col("numwait").desc, col("s_name")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Analytics.q37BlameSupplier(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    flag.unpersist()
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q38 keeps only >20% shares from a single reduced fact scan") {
    val out = Analytics.q38PartShare(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("share") <= 0.2).count() == 0)
    // one (part, supplier) row at most — the reduce happened
    assert(out.groupBy("p_partkey", "s_name").count()
      .filter(col("count") > 1).count() == 0)
    out.unpersist()
    val plan = Analytics.q38PartShare(spark, sfDir).queryExecution.executedPlan.toString
    val scans = plan.split(java.util.regex.Pattern.quote("lineitem.parquet"), -1).length - 1
    assert(scans == 1, s"q38 must reduce lineitem in ONE scan, saw $scans")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = Analytics.q1Agg(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"), plan.take(2000))
  }

  test("q5 broadcasts dimension tables") {
    val plan = Analytics.q5Multijoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q3 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Analytics.q3JoinTopk(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("suite-wide sweep: no forced broadcast of SF-scaled frames (r8 verdict)") {
    // Generalizes the r7 q3/a23/d63 lock to EVERY query: walk each
    // optimized logical plan and inspect every join side carrying an
    // explicit BROADCAST hint (only `functions.broadcast` puts one
    // there — threshold-based broadcasts carry no hint, so this is
    // exactly the set of FORCED broadcasts). A hinted side may only
    // read SF-invariant dims (nation 25 rows, region 5 — fixed by the
    // schema, not the scale), read no files at all (literal lexicons /
    // registries), or be one of the adjudicated CAPACITY-BOUNDED
    // aggregates below — frames whose row count is bounded by a literal
    // (1-row scalars, k-row probe sets, top-N dicts, sketch candidate
    // sets) no matter which fact table feeds them. Anything else —
    // customer/supplier/part/fact-derived frames that scale with SF —
    // fails here, closing the class the r7/r8 verdicts flagged (a
    // forced broadcast of an SF-scaled frame OOMs at 100 TB where
    // un-hinted AQE would simply pick SMJ).
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sfInvariant = Set("nation", "region")
    // query -> fact tables allowed to feed that query's hinted
    // capacity-bounded frames (each bound is a literal in the operator;
    // the comment names the bound). Tightly scoped per query AND per
    // source table: a new hint over any other table still fails.
    val capacityBounded: Map[String, Set[String]] = Map(
      "q27_balance_gap"       -> Set("customer"),   // 1-row avg-balance scalar
      "q57_cardinality_audit" -> Set("orders"),     // 1-row (|A|, ndv) stats
      "q59_basket_pairs"      -> Set("orders"),     // 1-row basket-count scalar
      "a11_due_sources"       -> Set("events"),     // 1-row as-of scalar
      "a14_html_extract"      -> Set("events"),     // registry keyed by the event-type ENUM (value-space bounded)
      "a36_incremental_agg"   -> Set("orders"),     // 1-row watermark scalar
      "c31_active_users"      -> Set("events"),     // 1-row max-day scalar
      "d9_cosine_topk"        -> Set("embeddings"), // 10-row query set (literal id cut)
      "d10_ann_lsh"           -> Set("embeddings"), // 10-row query set
      "d12_ann_ivf"           -> Set("embeddings"), // K-centroid frame (literal K)
      "d17_ann_multiprobe"    -> Set("embeddings"), // 10-row query set
      "d31_source_divergence" -> Set("documents"),  // 1-row corpus total
      "d36_filtered_search"   -> Set("embeddings"), // 10-row query set
      "d44_embed_quantize"    -> Set("embeddings"), // per-dim stats (literal dim count)
      "d54_domain_affinity"   -> Set("documents"),  // 256-bucket DSIR class map (md5 2-hex key)
      "d59_oov_rate"          -> Set("documents"),  // top-OovVocabK vocab (literal limit)
      "d61_token_burstiness"  -> Set("documents"),  // 1-row corpus doc count
      "d63_collocations"      -> Set("documents"),  // 1-row corpus token total
      "d65_ann_recall"        -> Set("embeddings"), // composes d9+d10 query sets
      "d69_ann_pq"            -> Set("embeddings"), // K×M codebooks + bounded shortlist
      "d72_vocab_growth"      -> Set("documents"),  // 1-row bucket-width scalar (3 uses)
      "d73_affinity_curation" -> Set("documents"),  // composes d54's 256-bucket map
      "d78_heavy_hitters"     -> Set("documents"),  // HeavyCap-bounded sketch candidates
      "d84_dict_code"         -> Set("documents"),  // top-256 dictionary
      "d85_bm25_topk"         -> Set("documents"),  // 1-row (T, D) corpus scalars
      "c42_survival_km"       -> Set("events"),     // 1-row corpus-end scalar
      "d92_mips_topk"         -> Set("embeddings"), // 10-row query set (literal id cut)
      "d93_mips_lsh"          -> Set("embeddings"), // 1-row M2 scalar + 10-row probe set
      "d98_vocab_coverage"    -> Set("documents"),  // 1-row corpus-totals scalar
      "d114_novelty_curve"    -> Set("documents"),  // 1-row corpus-span scalar
      "q89_mahalanobis"       -> Set("lineitem"))   // ≤|flags|-row moment frame
    def factLeaves(p: LogicalPlan): Set[String] = p.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.getName.replaceAll("\\.(parquet|orc|csv|json)$", "")).toSeq
        case _ => Seq.empty[String]
      }
    }.flatten.toSet
    val violations = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      plan.collect { case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).flatMap {
          case (Some(h), side) if h.strategy.contains(BROADCAST) =>
            val scaled = factLeaves(side) -- sfInvariant -- capacityBounded.getOrElse(name, Set.empty)
            if (scaled.nonEmpty) Seq(s"$name hints broadcast over SF-scaled $scaled") else Nil
          case _ => Nil
        }
      }.flatten
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("StripScaledBroadcastHints: oversized forced broadcasts degrade to planner choice") {
    // the engine-side twin of the static hint sweep: a broadcast()
    // hint whose side exceeds spark.graft.broadcastHint.maxBytes is
    // stripped by the injected optimizer rule, so the planner (and
    // AQE) pick from real sizes instead of obeying a stale-scale hint
    val conf = spark.conf
    val saved = Seq("spark.graft.broadcastHint.maxBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    def hinted() = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString
    try {
      // disable size-based broadcasting: ONLY the hint can plan a BHJ
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.graft.broadcastHint.maxBytes", "-1") // rule disabled
      assert(hinted().contains("BroadcastHashJoin"),
        "with the rule off, the forced hint must still win")
      conf.set("spark.graft.broadcastHint.maxBytes", "1") // 1-byte bound
      val stripped = hinted()
      assert(!stripped.contains("BroadcastHashJoin"),
        "an oversized hint must be stripped:\n" + stripped.take(1500))
      assert(stripped.contains("SortMergeJoin") || stripped.contains("ShuffledHashJoin"))
      // sanctioned tiny hints survive the DEFAULT bound
      conf.unset("spark.graft.broadcastHint.maxBytes")
      assert(Analytics.q5Multijoin(spark, sfDir).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "nation/region hints must survive the default 512 MiB bound")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("threshold=-1: un-hinted fact joins fall back to shuffle joins") {
    // Physical counterpart of the sweep above for the adjudicated
    // un-hinted joins (r7: q3 customer, a23 custKeys, d63 vocab; r8:
    // the 12 TPC-H-family supplier/part joins). With the broadcast
    // threshold disabled, ONLY a forced hint can still plan a
    // BroadcastHashJoin on those sides — so q3/a23/d63 (whose only
    // dims were the un-hinted ones) must show none at all, and the
    // TPC-H reps must plan at least one SortMergeJoin for their
    // supplier/part side while keeping only nation/region broadcasts.
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      Seq(
        "q3" -> Analytics.q3JoinTopk(spark, sfDir),
        "a23" -> Etl.a23QualityRules(spark, sfDir),
        "d63" -> TextOps.d63Collocations(spark, sfDir)
      ).foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"),
          s"$name still forces a broadcast with threshold=-1:\n" + plan.take(2000))
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name lost its shuffle join under threshold=-1:\n" + plan.take(2000))
      }
      Seq(
        "q5" -> Analytics.q5Multijoin(spark, sfDir),
        "q28" -> Analytics.q28PromoShare(spark, sfDir),
        "q34" -> Analytics.q34ProfitByNation(spark, sfDir),
        "q36" -> Analytics.q36SupplierDiversity(spark, sfDir),
        "q42" -> Analytics.q42MinCostSupplier(spark, sfDir)
      ).foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name lost its shuffle join for supplier/part under threshold=-1:\n" + plan.take(2000))
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q11 global threshold keeps only above-share parts; q23 runs monotone") {
    val out = Analytics.q11GlobalThreshold(spark, sfDir).cache()
    val totalShare = out.count()
    assert(totalShare > 0)
    // every kept part individually exceeds total/2000
    val total = Tables.lineitem(spark, sfDir)
      .agg(sum(graft.Cols.dec2(col("l_quantity"))).cast("double")).head.getDouble(0)
    assert(out.filter(col("sum_qty") * 2000 <= total - 0.01).count() == 0)
    out.unpersist()
    // running total never decreases within a customer (prices > 0)
    val rt = Analytics.q23RunningTotal(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val bad = rt.withColumn("prev", lag(col("running_total"), 1).over(w))
      .filter(col("prev").isNotNull && col("running_total") < col("prev"))
    assert(bad.count() == 0)
  }

  test("d16 sampling: full-rate strata keep every doc; kept rows are stable") {
    val docs = Tables.documents(spark, sfDir)
      .groupBy("source").count().withColumnRenamed("count", "total")
    val kept = TextOps.d16StratifiedSample(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("kept"), max("rate_permille").as("rate"))
    val j = docs.join(kept, Seq("source"), "left_outer")
    // rate-1000 sources keep everything; no source keeps more than it has
    assert(j.filter(col("rate") === 1000 && col("kept") =!= col("total")).count() == 0)
    assert(j.filter(col("kept") > col("total")).count() == 0)
    // determinism: identical row set across runs
    val a = TextOps.d16StratifiedSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextOps.d16StratifiedSample(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("d14 subword counts: alternation partitions into its three classes") {
    val out = TextOps.d14SubwordTokens(spark, sfDir)
    val bad = out.filter(
      col("n_subwords") =!= col("n_alpha_runs") + col("n_digit_runs") + col("n_punct"))
    assert(bad.count() == 0)
    assert(out.filter(col("n_subwords") > 0).count() > 0)
  }

  test("d33 train windows: full coverage, overlap, and minimal window count") {
    val out = CorpusOps.d33TrainWindows(spark, sfDir).cache()
    assert(out.count() > 0)
    val perDoc = out.groupBy("doc_id").agg(
      min("start_tok").as("first_start"), max("end_tok").as("last_end"),
      max("n_tok").as("n_tok"), count(lit(1)).as("n_win"))
    // first window starts at 0; last ends exactly at n_tok
    assert(perDoc.filter(col("first_start") =!= 0 || col("last_end") =!= col("n_tok")).count() == 0)
    // no empty windows: every start strictly precedes its doc's end
    assert(out.filter(col("start_tok") >= col("end_tok")).count() == 0)
    // adjacent windows overlap (stride < size) and leave no gaps
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_id"))
    val gaps = out.withColumn("prev_end", lag(col("end_tok"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_tok") >= col("prev_end"))
    assert(gaps.count() == 0)
    // minimality: one fewer window could not reach n_tok
    val tooMany = perDoc.filter(col("n_win") > 1 &&
      (col("n_win") - 2) * CorpusOps.WinStride + CorpusOps.WinTokens >= col("n_tok"))
    assert(tooMany.count() == 0)
    out.unpersist()
  }

  test("d34 idf terms: exactly top-K per source, map-side group limit planned") {
    val out = CorpusOps.d34IdfTerms(spark, sfDir).cache()
    val sources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(out.count() == sources * CorpusOps.TopTerms)
    // ranks are 1..K dense per source; scores non-increasing in rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("rank"))
    val bad = out.withColumn("prev_score", lag(col("score"), 1).over(w))
      .filter(col("prev_score").isNotNull && col("score") > col("prev_score"))
    assert(bad.count() == 0)
    // score is the exact integer-division tf-idf
    assert(out.filter(col("score") =!=
      expr(s"(tf * ${CorpusOps.IdfScale}) div df")).count() == 0)
    out.unpersist()
    val plan = CorpusOps.d34IdfTerms(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("a19 lease reclaim: expiry rule, generation bump, full claimed coverage") {
    val out = Etl.a19LeaseReclaim(spark, sfDir).cache()
    val claimed = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O").count()
    assert(out.count() == claimed)
    // status follows expiry; generation bumps exactly on expiry
    assert(out.filter(col("expired") =!= (col("new_status") === "pending")).count() == 0)
    val base = pmod(col("item_id"), lit(12)) + 1
    assert(out.filter(col("retry_generation") =!=
      when(col("expired"), base + 1).otherwise(base).cast("int")).count() == 0)
    // an item with no heartbeat at all is always reclaimed
    assert(out.filter(col("last_beat").isNull && !col("expired")).count() == 0)
    // both branches occur
    assert(out.filter(col("expired")).count() > 0)
    assert(out.filter(!col("expired")).count() > 0)
    out.unpersist()
  }

  test("c10 session stats agree with c2's per-user session counts") {
    val out = Events.c10SessionStats(spark, sfDir).cache()
    // session grain reconciles exactly with c2's user grain
    val fromC10 = out.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val c2 = Events.c2Sessionize(spark, sfDir)
      .withColumnRenamed("n_sessions", "c2_sessions")
      .withColumnRenamed("n_events", "c2_events")
    val joined = fromC10.join(c2, "user_id")
    assert(joined.filter(col("n_sessions") =!= col("c2_sessions") ||
      col("n_events") =!= col("c2_events")).count() == 0)
    // sessions are dense 1..n per user; durations non-negative; both outcomes occur
    assert(out.filter(col("session_seq") < 1).count() == 0)
    assert(out.filter(col("duration_sec") < 0).count() == 0)
    assert(out.filter(col("converted")).count() > 0)
    assert(out.filter(!col("converted")).count() > 0)
    out.unpersist()
  }

  test("d40 url canonical: rules collapse noise, groups form, one canonical each") {
    val out = TextOps.d40UrlCanonical(spark, sfDir).cache()
    assert(out.count() == Tables.documents(spark, sfDir).count())
    // canonical urls carry none of the stripped noise
    val dirty = out.filter(col("canonical_url").contains(":443") ||
      col("canonical_url").contains("utm_") || col("canonical_url").rlike("[?&]$") ||
      col("canonical_url").rlike("/$") || col("canonical_url").rlike("[A-Z]"))
    assert(dirty.count() == 0)
    // real dedup happened (path sharing) and every group keeps exactly one canonical
    assert(out.filter(col("group_size") > 1).count() > 0)
    val perGroup = out.groupBy("canonical_url")
      .agg(count(when(col("is_canonical"), 1)).as("n_canon"), count(lit(1)).as("n"))
    assert(perGroup.filter(col("n_canon") =!= 1).count() == 0)
    // kept params survive: page=2 urls stay distinct from their paramless twins
    assert(out.filter(col("canonical_url").contains("page=2")).count() > 0)
    out.unpersist()
  }

  test("e3 shard stats: byte mass conserved, shard indices contiguous") {
    val out = MultimodalOps.e3ShardStats(spark, sfDir).cache()
    assert(out.count() > 0)
    val total = out.agg(sum("used_bytes")).head.getLong(0)
    val expected = Tables.documents(spark, sfDir)
      .agg(sum(octet_length(col("text").cast("binary")).cast("long"))).head.getLong(0)
    assert(total == expected)
    // shards run 0..max with no holes within a source
    val per = out.groupBy("source").agg(min("shard_idx").as("mn"),
      max("shard_idx").as("mx"), count(lit(1)).as("n"))
    assert(per.filter(col("mn") =!= 0 || col("n") =!= col("mx") + 1).count() == 0)
    out.unpersist()
  }

  test("q40 rolling revenue: window bounds respected, spot-check via re-aggregation") {
    val out = Analytics.q40RollingRevenue(spark, sfDir).cache()
    assert(out.count() > 0)
    // rolling ≥ same-day revenue, and a 90-day window never exceeds the year total
    assert(out.filter(col("rolling_90d_revenue") < col("day_revenue") - 1e-9).count() == 0)
    // independent check: re-derive one nation's rolling sums from its daily rows
    val nation = out.select("nation").head.getString(0)
    val daily = out.filter(col("nation") === nation)
      .select("o_date", "day_revenue").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
    val rolled = out.filter(col("nation") === nation)
      .select("o_date", "rolling_90d_revenue").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1))).toMap
    daily.foreach { case (day, _) =>
      val expect = daily.filter(d => d._1 <= day && d._1 >= day - 89).map(_._2).sum
      assert(math.abs(rolled(day) - expect) < 1e-6, s"day $day: ${rolled(day)} vs $expect")
    }
    out.unpersist()
  }

  test("q39 YoY growth: first year NULL, growth reproduces revenue ratios") {
    val out = Analytics.q39YoyGrowth(spark, sfDir).cache()
    assert(out.count() > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nation")).orderBy(col("o_year"))
    val checked = out.withColumn("rn", row_number().over(w))
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
    // exactly the first year per nation lacks growth
    assert(checked.filter((col("rn") === 1) =!= col("yoy_growth").isNull).count() == 0)
    // growth equals the double ratio of consecutive revenues
    val bad = checked.filter(col("yoy_growth").isNotNull &&
      abs(col("yoy_growth") - (col("revenue") - col("prev_rev")) / col("prev_rev")) > 1e-12)
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("d39 cross-source dups: pair mass conserved, sides ordered") {
    val out = DedupOps.d39CrossSourceDups(spark, sfDir).cache()
    assert(out.count() > 0)
    // every verified pair lands in exactly one (source_a, source_b) bucket
    val totalPairs = out.agg(sum("n_pairs")).head.getLong(0)
    assert(totalPairs == DedupOps.d6DedupMinhash(spark, sfDir).count())
    assert(out.filter(col("source_a") > col("source_b")).count() == 0)
    assert(out.filter(col("cross_source") =!= (col("source_a") =!= col("source_b"))).count() == 0)
    assert(out.filter(col("max_jaccard") < 0.5).count() == 0)
    out.unpersist()
  }

  test("d38 sensitivity sweep: monotone in tau and consistent with d6") {
    val out = DedupOps.d38DedupSensitivity(spark, sfDir).cache()
    val rows = out.orderBy("tau").collect()
    assert(rows.nonEmpty)
    // tighter thresholds can only shrink both counts
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b <= a })
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    // the tau=0.5 row IS d6's full pair set
    assert(rows.head.getAs[Double]("tau") == 0.5)
    assert(pairs.head == DedupOps.d6DedupMinhash(spark, sfDir).count())
    // a pair involves at most 2 new docs
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs")))
    out.unpersist()
  }

  test("d41 packing efficiency reconciles exactly with d24's manifest") {
    val out = CorpusOps.d41PackingEfficiency(spark, sfDir).cache()
    assert(out.count() > 0)
    // packing can never need more sequences than padding, and wastes less
    assert(out.filter(col("packed_seqs") > col("padded_seqs")).count() == 0)
    assert(out.filter(col("packed_waste") > col("padded_waste") + 1e-12).count() == 0)
    // packed_seqs agrees with the real d24 manifest (max last_seq + 1)
    val fromD24 = CorpusOps.d24SequencePack(spark, sfDir)
      .groupBy("source").agg((max("last_seq") + 1).as("seqs"))
    val j = out.join(fromD24, "source")
    assert(j.filter(col("packed_seqs") =!= col("seqs")).count() == 0)
    out.unpersist()
  }

  test("d37 length profile: percentile ordering and mass conservation") {
    val out = CorpusOps.d37LengthProfile(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("min_chars") > col("p10_chars") ||
      col("p10_chars") > col("p50_chars") || col("p50_chars") > col("p90_chars") ||
      col("p90_chars") > col("max_chars")).count() == 0)
    val total = out.agg(sum("total_chars")).head.getLong(0)
    val expected = Tables.documents(spark, sfDir).agg(sum("n_chars")).head.getLong(0)
    assert(total == expected)
    out.unpersist()
  }

  test("c9 RFM: quartiles balanced, segment composed, monetary conserved") {
    val out = Events.c9RfmSegments(spark, sfDir).cache()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.count() == users)
    // ntile(4) buckets differ in size by at most 1
    for (c <- Seq("r_q", "f_q", "m_q")) {
      val sizes = out.groupBy(c).count().collect().map(_.getLong(1))
      assert(sizes.length == 4 && sizes.max - sizes.min <= 1, s"$c: ${sizes.mkString(",")}")
    }
    assert(out.filter(col("segment") =!=
      concat(col("r_q"), col("f_q"), col("m_q"))).count() == 0)
    // most-recent users sit in r_q quartile 1
    val best = out.filter(col("r_q") === 1).agg(max("recency_days")).head.getInt(0)
    val worst = out.filter(col("r_q") === 4).agg(min("recency_days")).head.getInt(0)
    assert(best <= worst)
    out.unpersist()
  }

  test("a18 selects exactly the partitions inside the horizon") {
    val out = Etl.a18IncrementalPartitions(spark, sfDir).cache()
    assert(out.count() > 0)
    // every selected partition's last activity is within the horizon of the global max
    val asof = Tables.events(spark, sfDir).agg(max("ts")).head.getTimestamp(0)
    val cut = new java.sql.Timestamp(asof.getTime - Etl.IncrementalHorizonHours * 3600 * 1000)
    assert(out.filter(col("last_ts") <= lit(cut)).count() == 0)
    // and the selection is complete: no in-horizon partition missing
    val all = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), year(col("ts")), month(col("ts")),
        dayofmonth(col("ts")), hour(col("ts")))
      .agg(max(col("ts")).as("last_ts"))
      .filter(col("last_ts") > lit(cut)).count()
    assert(out.count() == all)
    out.unpersist()
  }

  test("d36 filtered search: neighbors all pass the filter, k per query") {
    val out = VectorOps.d36FilteredSearch(spark, sfDir).cache()
    val nQueries = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < VectorOps.NumQueries).count()
    assert(out.count() == nQueries * VectorOps.TopK)
    // every neighbor satisfies the relational predicate (filter-then-search)
    val ok = TextOps.d3QualityScore(spark, sfDir)
      .filter(col("quality_flag") === "ok").select(col("doc_id"))
    val leaked = out.join(ok, out("neighbor_id") === ok("doc_id"), "left_anti")
    assert(leaked.count() == 0)
    // dense 1..k ranks per query
    assert(out.groupBy("query_id").agg(min("rnk").as("mn"), max("rnk").as("mx"),
      countDistinct("rnk").as("nd"))
      .filter(col("mn") =!= 1 || col("mx") =!= VectorOps.TopK ||
        col("nd") =!= VectorOps.TopK).count() == 0)
    out.unpersist()
  }

  test("d35 corpus funnel: monotone stages, pct consistency, d15 agreement") {
    val out = CorpusOps.d35CorpusFunnel(spark, sfDir).cache()
    val rows = out.orderBy("stage_id").collect()
    assert(rows.length == 6)
    // cumulative stages can only shrink
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts.mkString(","))
    // pct = n/total, total row at 1.0
    val total = counts.head
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("pct") - r.getAs[Long]("n_docs").toDouble / total) < 1e-12)
    }
    // stage 4 (lang ∧ quality ∧ exact-canonical) IS d15's keep rule
    val d15Keep = TextOps.d15CorpusFilter(spark, sfDir).filter(col("keep")).count()
    assert(counts(3) == d15Keep, s"funnel stage 4 ${counts(3)} != d15 keep $d15Keep")
    out.unpersist()
  }

  test("c8 inter-event gaps: conservation, ordering, and percentile sanity") {
    val out = Events.c8InterEvent(spark, sfDir).cache()
    assert(out.count() > 0)
    // every user contributes (n_events - 1) gaps, attributed to later-event types
    val totalGaps = out.agg(sum("n_gaps")).head.getLong(0)
    val e = Tables.events(spark, sfDir)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(totalGaps == expected, s"gap conservation: $totalGaps != $expected")
    // events are chronologically ordered per user, so gaps are non-negative
    assert(out.filter(col("min_gap_us") < 0).count() == 0)
    assert(out.filter(col("p50_us") > col("p90_us") ||
      col("p90_us") > col("max_gap_us") || col("min_gap_us") > col("p50_us")).count() == 0)
    out.unpersist()
  }

  test("a17 retry schedule: exponential ladder, caps, and dead letters") {
    val out = Etl.a17RetrySchedule(spark, sfDir).cache()
    assert(out.count() > 0)
    // non-retryable errors and at-cap attempts dead-letter with no due time
    assert(out.filter(!col("retryable") && col("action") =!= "dead_letter").count() == 0)
    assert(out.filter(col("attempt") >= Etl.RetryMaxAttempts &&
      col("action") =!= "dead_letter").count() == 0)
    assert(out.filter(col("action") === "dead_letter" && col("next_due").isNotNull).count() == 0)
    // scheduled waits follow interval * 2^(attempt-1) exactly
    val bad = out.filter(col("action") === "retry_scheduled" &&
      col("wait_seconds") =!= lit(Etl.RetryIntervalSec) * pow(lit(2), col("attempt") - 1).cast("long"))
    assert(bad.count() == 0)
    // both branches occur on the test corpus
    assert(out.filter(col("action") === "retry_scheduled").count() > 0)
    assert(out.filter(col("action") === "dead_letter").count() > 0)
    out.unpersist()
  }

  test("a2 control merge keeps every base row exactly once") {
    val out = Etl.a2ControlMerge(spark, sfDir)
    val base = Tables.orders(spark, sfDir).count()
    assert(out.count() == base)
    assert(out.select("id").distinct().count() == base)
  }

  test("a7 cdc compact keeps one row per user") {
    val out = Etl.a7CdcCompact(spark, sfDir)
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("c2 sessionize: session count between 1 and event count") {
    val bad = Events.c2Sessionize(spark, sfDir)
      .filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events"))
    assert(bad.count() == 0)
  }

  test("c6 funnel stages are monotone and the plan has one user_id exchange") {
    val df = Events.c6Funnel(spark, sfDir)
    val r = df.head()
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2),
      s"funnel not monotone: $r")
    assert(r.getLong(0) > 0)
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("hashpartitioning(user_id")).toSeq
    assert(exchanges.nonEmpty) // both window passes share the one user_id shuffle
  }

  test("c3 as-of join: last_click_ts <= purchase ts") {
    val bad = Events.c3AsofJoin(spark, sfDir)
      .filter(col("last_click_ts") > col("ts"))
    assert(bad.count() == 0)
  }

  test("d2 lang id is total, deterministic, and lexicon-consistent") {
    // The synthetic corpus reuses one English-ish vocabulary for every
    // lang label, so label accuracy is meaningless here; we assert the
    // heuristic's contract instead: every doc classified, stable across
    // runs, and 'en' for text containing English stopwords.
    val out = TextOps.d2LangId(spark, sfDir).cache()
    val total = out.count()
    assert(out.filter(col("lang_pred").isNull).count() == 0)
    val again = TextOps.d2LangId(spark, sfDir)
    assert(out.join(again, Seq("doc_id"))
      .filter(out("lang_pred") =!= again("lang_pred")).count() == 0)
    val enDocs = Tables.documents(spark, sfDir)
      .filter(col("text").rlike("(^| )(the|a|of)( |$)"))
      .join(out, "doc_id")
    assert(enDocs.filter(col("lang_pred") === "en").count() == enDocs.count())
    assert(total > 0)
    out.unpersist()
  }

  test("d2 lang id accuracy >= 0.9 on the labeled 8-language fixture") {
    val path = getClass.getResource("/langid_fixture.csv").getPath
    val raw = spark.read.option("header", "true").csv(path)
      .withColumn("id", monotonically_increasing_id())
    val fx = TextOps.withLangPred(raw, "id", "text")
      .select(col("lang"), col("lang_pred"))
      .cache()
    val total = fx.count()
    val correct = fx.filter(col("lang") === col("lang_pred")).count()
    val acc = correct.toDouble / total
    val wrong = fx.filter(col("lang") =!= col("lang_pred")).collect().mkString("; ")
    assert(total == 40)
    assert(acc >= 0.9, s"accuracy $acc ($correct/$total); misses: $wrong")
    // every lexicon language is represented and predictable
    assert(fx.filter(col("lang") === col("lang_pred")).select("lang").distinct().count() == 8)
    fx.unpersist()
  }

  test("d5 exact dedup: canonical ids are unique and counts sum to corpus") {
    val out = TextOps.d5DedupExact(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.agg(sum("n_dups")).head.getLong(0) == docs)
    assert(out.select("canonical_id").distinct().count() == out.count())
  }

  test("minhash128 aggregate equals the column-based min(xxhash64(h,k)) formulation") {
    val sh = DedupOps.explodedShingleHashes(spark, sfDir)
    val viaAgg = DedupOps.minhashSignatures(spark, sfDir)
      .select(col("doc_id"), col("sig"))
    val aggs = (0 until DedupOps.NumHashes).map(k => min(xxhash64(col("shingle"), lit(k))).as(s"h$k"))
    val viaCols = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until DedupOps.NumHashes).map(i => col(s"h$i")): _*).as("sig2"))
    val joined = viaAgg.join(viaCols, "doc_id")
    assert(joined.filter(col("sig") =!= col("sig2")).count() == 0)
    assert(joined.count() > 0)
  }

  test("d6 minhash finds exactly the high-jaccard pairs (vs exhaustive)") {
    import TextOps.{jaccard, shingles, tokens}
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingles(tokens(col("text"))).as("s"))
      .filter(size(col("s")) > 0)
    val a = docs.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    val exhaustive = a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("j"))
      .filter(col("j") >= 0.5)
      .count()
    val lsh = DedupOps.d6DedupMinhash(spark, sfDir).count()
    assert(lsh == exhaustive, s"lsh=$lsh exhaustive=$exhaustive")
  }

  test("d7 salting: caps are zero at the default size and observable under a tiny one") {
    val dir01 = "/root/testdata/sf0.01" // enough docs for multi-member buckets
    val stats = DedupOps.d7CapStats(spark, dir01).head()
    assert(stats.getLong(0) == 0 && stats.getLong(1) == 0,
      s"default cap should never trigger at test scale: $stats")
    val defPairs = DedupOps.d7DedupSimhash(spark, dir01)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defPairs.nonEmpty)
    // cap=1 makes every multi-member bucket oversized → salting + backstop fire
    val tinyStats = DedupOps.d7CapStats(spark, dir01, maxBucket = 1).head()
    assert(tinyStats.getLong(0) > 0, "expected oversized buckets under cap=1")
    val tinyPairs = DedupOps.d7Pairs(spark, dir01, maxBucket = 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tinyPairs.subsetOf(defPairs), "salted/capped run must not invent pairs")
    DedupOps.release(spark, dir01)
  }

  test("native cosine_sim expression is bit-identical to the HOF fold") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(5000)
    val diff = pairs.select(
      VectorOps.cosine(col("ea"), col("eb")).as("native"),
      VectorOps.cosineHof(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("d9/d10/d12: approximate ANN recall vs brute force is sane") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.d9CosineTopk(spark, sfDir))
    val lsh = pairs(VectorOps.d10AnnLsh(spark, sfDir))
    val ivf = pairs(VectorOps.d12AnnIvf(spark, sfDir))
    assert(lsh.nonEmpty && ivf.nonEmpty)
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    // single-probe 16-bucket LSH: P[query and neighbor share a bucket]
    // = (1-θ/π)^4 ≈ 0.2 at this corpus's top-5 cosine (~0.55). The old
    // 0.2 floor was calibrated against the degenerate 2-bucket
    // planeWeights (half the corpus per probe); d17 multiprobe is the
    // recall path, asserted >= d10 below.
    assert(lshRecall > 0.1, s"lsh recall=$lshRecall")
    assert(ivfRecall > 0.2, s"ivf recall=$ivfRecall")
  }

  test("d17 multiprobe recall is at least single-bucket LSH recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.d9CosineTopk(spark, sfDir))
    val single = (brute & pairs(VectorOps.d10AnnLsh(spark, sfDir))).size
    val multi = (brute & pairs(VectorOps.d17AnnMultiprobe(spark, sfDir))).size
    assert(multi >= single, s"multiprobe recall $multi < single-bucket $single")
    assert(multi > 0)
  }

  test("PpmDecoder: real PPM pixels decode through the seam; e8/e14 price the measured dims") {
    import spark.implicits._
    def p6(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
      val head = s"P6\n# fixture comment\n$w $h\n255\n".getBytes("US-ASCII")
      head ++ Array.fill(w * h)(
        Array(rgb._1.toByte, rgb._2.toByte, rgb._3.toByte)).flatten
    }
    def p3(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] =
      (s"P3\n$w $h\n255\n" +
        Seq.fill(w * h)(s"${rgb._1} ${rgb._2} ${rgb._3}").mkString("\n"))
        .getBytes("US-ASCII")
    val blobs = Seq(
      (1L, p6(128, 128, (200, 100, 50))),
      (2L, p3(192, 96, (10, 20, 30))),
      (3L, p6(256, 144, (255, 0, 0))),
      (4L, "definitely not an image".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val decoded = MultimodalOps.decodeBatch(spark, blobs,
      decoder = MultimodalOps.PpmDecoder).collect().sortBy(_.doc_id)
    // the corrupt blob is dropped, the three real images decode their
    // MEASURED dims (the stub would have hash-derived both)
    assert(decoded.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(decoded.map(d => (d.width, d.height)).toSeq ==
      Seq((128, 128), (192, 96), (256, 144)))
    // uniform fixtures: channel means are the planted colors, all four
    // quadrant lumas equal the global luma
    val d1 = decoded(0)
    assert(d1.features(0) == (200.0 / 255.0).toFloat &&
      d1.features(1) == (100.0 / 255.0).toFloat &&
      d1.features(2) == (50.0 / 255.0).toFloat)
    val luma1 = ((200.0 + 100.0 + 50.0) / 3.0 / 255.0).toFloat
    assert(d1.features(3) == luma1 && (4 to 7).forall(d1.features(_) == luma1))
    val d2 = decoded(1)
    assert(d2.features(1) == (20.0 / 255.0).toFloat, "P3 ASCII pixels must parse")
    // e8 on the REAL dims: each fixture sits exactly on one target
    // ratio (key 0 by hand: 128·1=128·1, 192·1=96·2, 256·9=144·16)
    val buckets = MultimodalOps.e8AspectBucketsOf(
        spark.createDataFrame(decoded.toSeq.map(d => (d.doc_id, d.width, d.height)))
          .toDF("doc_id", "width", "height"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(buckets == Map(
      "1:1" -> ((1L, 0L, 1L)), "2:1" -> ((1L, 0L, 1L)), "16:9" -> ((1L, 0L, 1L))))
    // e14 on the REAL dims, reconciled against the hand-computed
    // pyramid: 128² halves once (64² ≥ 64), 192×96 stops at level 0
    // (48 < 64), 256×144 halves once (128×72); bytes = 3wh
    val ladder = MultimodalOps.e14ResolutionLadderOf(
        spark.createDataFrame(decoded.toSeq.map(d =>
          (if (d.doc_id <= 2) "s1" else "s2", d.width, d.height)))
          .toDF("source", "width", "height"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(ladder("s1") == ((2L, 3L, 1L, 128L * 128 * 3 + 192L * 96 * 3, 64L * 64 * 3,
      64L * 64 * 3 * 10000L / (128L * 128 * 3 + 192L * 96 * 3))))
    assert(ladder("s2") == ((1L, 2L, 1L, 256L * 144 * 3, 128L * 72 * 3, 2500L)))
  }

  test("ImageIoDecoder: real PNG/JPEG blobs decode through the seam; features match PPM's contract") {
    import spark.implicits._
    def img(w: Int, h: Int, rgb: (Int, Int, Int), fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val c = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
      (0 until h).foreach(y => (0 until w).foreach(x => bi.setRGB(x, y, c)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    // a split image: left half red, right half blue — quadrant features differ
    val split = {
      val bi = new java.awt.image.BufferedImage(64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 32).foreach(y => (0 until 64).foreach(x =>
        bi.setRGB(x, y, if (x < 32) 0xFF0000 else 0x0000FF)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      out.toByteArray
    }
    val blobs = Seq(
      (1L, img(128, 128, (200, 100, 50), "png")),
      (2L, img(192, 96, (10, 20, 30), "jpg")),
      (3L, img(256, 144, (255, 0, 0), "png")),
      (4L, split),
      (5L, "not an image at all".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val decoded = MultimodalOps.decodeBatch(spark, blobs,
      decoder = MultimodalOps.ImageIoDecoder).collect().sortBy(_.doc_id)
    // corrupt blob dropped; real formats decode their MEASURED dims
    assert(decoded.map(_.doc_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(decoded.map(d => (d.width, d.height)).toSeq ==
      Seq((128, 128), (192, 96), (256, 144), (64, 32)))
    // PNG is lossless: channel means are EXACTLY the planted color, all
    // quadrant lumas equal the global luma (the PpmDecoder contract)
    val d1 = decoded(0)
    assert(d1.features(0) == (200.0 / 255.0).toFloat &&
      d1.features(1) == (100.0 / 255.0).toFloat &&
      d1.features(2) == (50.0 / 255.0).toFloat)
    val luma1 = ((200.0 + 100.0 + 50.0) / 3.0 / 255.0).toFloat
    assert(d1.features(3) == luma1 && (4 to 7).forall(d1.features(_) == luma1))
    // JPEG is lossy: dims exact (asserted above), features NEAR the
    // planted color (uniform images compress almost perfectly)
    val d2 = decoded(1)
    Seq(10.0, 20.0, 30.0).zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(d2.features(i) - v / 255.0) < 0.02, s"jpeg ch$i ${d2.features(i)}")
    }
    // split image: left quadrants pure red luma, right quadrants pure
    // blue luma, global mean in between — quadrant split is measured
    val d4 = decoded(3)
    val third = (255.0 / 3.0 / 255.0).toFloat
    assert(d4.features(4) == third && d4.features(5) == third &&
      d4.features(6) == third && d4.features(7) == third)
    assert(d4.features(0) == 0.5f && d4.features(2) == 0.5f && d4.features(1) == 0f)
    // e8 pricing reconciled on the measured dims of the real formats
    val buckets = MultimodalOps.e8AspectBucketsOf(
        spark.createDataFrame(decoded.take(3).toSeq.map(d => (d.doc_id, d.width, d.height)))
          .toDF("doc_id", "width", "height"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets == Map("1:1" -> 1L, "2:1" -> 1L, "16:9" -> 1L))
    // the two codecs agree feature-for-feature on identical pixels
    val viaPpm = MultimodalOps.PpmDecoder.decode(Seq(9L ->
      (s"P6\n128 128\n255\n".getBytes("US-ASCII") ++
        Array.fill(128 * 128)(Array(200.toByte, 100.toByte, 50.toByte)).flatten))).next()
    assert(viaPpm.features.sameElements(d1.features),
      "PNG and PPM of the same pixels must produce identical features")
  }

  test("sampleFrames explodes blobs into bounded deterministic frame rows") {
    val blobs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val frames = MultimodalOps.sampleFrames(spark, blobs).cache()
    val perDoc = frames.groupBy("doc_id").count()
    assert(perDoc.count() == blobs.count())       // every blob yields >= 1 frame
    assert(perDoc.filter(col("count") > 8).count() == 0) // maxFrames bound
    val f = frames.orderBy(col("doc_id"), col("frame_idx")).head()
    assert(f.frame_idx == 0 && f.offset == 0 && f.features.length == 4)
    // deterministic across runs
    val again = MultimodalOps.sampleFrames(spark, blobs)
      .orderBy(col("doc_id"), col("frame_idx")).head()
    assert(again.features.sameElements(f.features))
    frames.unpersist()
  }

  test("d12: Lloyd refinement strictly improves recall over raw seeds") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.d9CosineTopk(spark, sfDir))
    val seeded = pairs(VectorOps.ivfWithCentroids(spark, sfDir,
      VectorOps.centroidVectors(spark, sfDir, iters = 0)))
    val refined = pairs(VectorOps.d12AnnIvf(spark, sfDir))
    val r0 = (brute & seeded).size.toDouble / brute.size
    val rN = (brute & refined).size.toDouble / brute.size
    assert(rN > r0, s"refined recall=$rN not above seed recall=$r0")
  }

  test("d12: hash-sampled Lloyd refinement keeps full-pass recall") {
    // the 100 TB refinement path: each round aggregates a deterministic
    // per-round hash sample instead of the full corpus; centroids are
    // means, so recall must hold at a fraction of the scan cost
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorOps.d9CosineTopk(spark, sfDir))
    val seeded = pairs(VectorOps.ivfWithCentroids(spark, sfDir,
      VectorOps.centroidVectors(spark, sfDir, iters = 0)))
    val full = pairs(VectorOps.d12AnnIvf(spark, sfDir))
    val sampled = pairs(VectorOps.ivfWithCentroids(spark, sfDir,
      VectorOps.centroidVectors(spark, sfDir, sampleRate = 0.5)))
    val r0 = (brute & seeded).size.toDouble / brute.size
    val rF = (brute & full).size.toDouble / brute.size
    val rS = (brute & sampled).size.toDouble / brute.size
    // at 500 test vectors a half-corpus sample can't be expected to BEAT
    // seeds the way a full pass does — the contract is no collapse:
    // within 10% of full-pass refinement and never below the raw seeds
    assert(rS >= r0, s"sampled recall=$rS regressed below seed recall=$r0")
    assert(rS >= rF * 0.9, s"sampled recall=$rS fell >10% below full-pass=$rF")
    // determinism: the hash sample is row-local state-free — same rows,
    // same centroids, bit-for-bit, on any rerun
    VectorOps.release(spark, sfDir)
    val again = pairs(VectorOps.ivfWithCentroids(spark, sfDir,
      VectorOps.centroidVectors(spark, sfDir, sampleRate = 0.5)))
    assert(again == sampled, "sampled refinement is not deterministic across reruns")
  }

  test("d69 PQ-ADC: rank shape, recall floor vs exact, deterministic rerun") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqDf = VectorOps.d69AnnPq(spark, sfDir)
    val rows = pqDf.collect()
    // per query: exactly TopK ranked rows, ranks dense 1..k, adc
    // non-increasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (_, qr) =>
      val byRank = qr.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to VectorOps.TopK).toSeq)
      val adcs = byRank.map(_.getDouble(2)).toSeq
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a >= b })
    }
    // ADC shortlists, exact cosine re-ranks: recall@5 is bounded by
    // ADC recall@50, measured 0.74 at sf0.01 — floor set conservatively
    val brute = pairs(VectorOps.d9CosineTopk(spark, sfDir))
    val pq = pairs(pqDf)
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.4, s"PQ recall@5 vs exact = $recall below floor")
    // determinism: retrain from scratch → bit-identical result set
    VectorOps.release(spark, sfDir)
    assert(pairs(VectorOps.d69AnnPq(spark, sfDir)) == pq,
      "PQ pipeline is not deterministic across retrains")
  }

  test("c25 burst detection: pure-Scala trailing-window replay") {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").count().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val expect = hourly.keys.toSeq.flatMap { case (t, h) =>
      val base = (h - Events.BurstBaselineHours to h - 1)
        .flatMap(hb => hourly.get((t, hb)))
      val cnt = hourly((t, h))
      if (base.size >= Events.BurstMinBaseline && cnt * base.size > 3 * base.sum)
        Some((t, h, cnt, base.size.toLong, base.sum))
      else None
    }.sortBy(x => (x._1, x._2))
    val got = Events.c25BurstDetect(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("a31 zone-map audit: Z layout prunes at least as well as id layout") {
    val rows = Etl.a31ZoneMapAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // at least one probe must land inside the observed key space —
    // a fully-vacuous probe set audits nothing
    assert(rows.exists(_.getLong(3) > 0), "all probes vacuous (no bins hit)")
    rows.foreach { r =>
      val (nBinsZ, nBinsId, hitZ, hitId) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hitZ <= nBinsZ && hitId <= nBinsId)
    }
    // the clustering claim, in aggregate: Z-ordered zone maps never
    // touch more bins or bytes than the naive id-order layout
    val (sumZ, sumId) = (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    val (byZ, byId) = (rows.map(_.getLong(5)).sum, rows.map(_.getLong(6)).sum)
    assert(sumZ <= sumId, s"Z layout touched MORE bins ($sumZ) than id layout ($sumId)")
    assert(byZ <= byId, s"Z layout touched MORE bytes ($byZ) than id layout ($byId)")
  }

  test("d13 finds planted exact and near duplicates above tau") {
    // filter, not limit(50): limit on a multi-partition scan picks an
    // arbitrary (layout-dependent) subset; the planted-dup audit wants
    // the stable first-50 id range regardless of scan partitioning
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
    // planted dups: +1000 = exact copy (cos = 1, identical buckets in
    // every table); +2000 = first component nudged (cos ≈ 0.9999)
    val exactCopy = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val nearCopy = base.select((col("vec_id") + 2000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, (x + lit(0.05f)).cast("float")).otherwise(x)).as("embedding"))
    val corpus = base.union(exactCopy).union(nearCopy)
    val pairs = VectorOps.embeddingDupPairs(corpus, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ids = base.select("vec_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      assert(pairs.contains((id, id + 1000)), s"missed exact dup of $id")
      assert(pairs((id, id + 1000)) > 0.999)
    }
    val nearFound = ids.count(id => pairs.contains((id, id + 2000)))
    assert(nearFound >= ids.length - 5,
      s"found only $nearFound/${ids.length} planted near-dups")
  }

  test("piiScrub redacts planted emails/phones and leaves clean text byte-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail-host.co.uk or 555-0199 thanks"),
      (2L, "two mails a@b.org c.d@e.io and phones 555-1234 555-9999"),
      (3L, "no pii here, 1234-555 and user at host dot com do not count")
    ).toDF("doc_id", "text")
    val r = TextOps.piiScrub(docs).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r(0) == ((1L, 1, 1, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(r(1) == ((2L, 2, 2, "two mails <EMAIL> <EMAIL> and phones <PHONE> <PHONE>")))
    assert(r(2)._2 == 0 && r(2)._3 == 0 && r(2)._4 == docs.filter($"doc_id" === 3).head.getString(1))
  }

  test("contaminationAgainst flags a verbatim copy of an eval doc with full overlap") {
    import spark.implicits._
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (10L, evalDoc),                                    // verbatim dup of eval
      (11L, "alpha beta gamma unrelated tail of words"), // partial overlap (1 shared 3-gram)
      (12L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val ev = Seq((900L, evalDoc)).toDF("doc_id", "text")
    val hits = TextOps.contaminationAgainst(corpus, ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hits(10L) == ((6L, 1L))) // 8 tokens -> 6 shingles, all shared
    assert(hits(11L) == ((1L, 1L)))
    assert(!hits.contains(12L))
  }

  test("d12: corpus assignment subplan has no vec_id exchange (in-row argmax)") {
    val plan = VectorOps.d12AnnIvf(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"), plan.take(3000))
    assert(!plan.contains("hashpartitioning(neighbor_id"), plan.take(3000))
  }

  test("ANN top-k merge is a bounded aggregate, not a #queries-partition window") {
    // the row_number().over(partitionBy(query_id)) form collapses the
    // merge to NumQueries tasks over the full candidate set; the TopKAgg
    // form must show a PARTIAL aggregate feeding the query_id exchange
    // (map-side reduction to <= k rows per query per partition) and no
    // Window node at all.
    val fams = Map(
      "d9" -> VectorOps.d9CosineTopk(spark, sfDir),
      "d10" -> VectorOps.d10AnnLsh(spark, sfDir),
      "d12" -> VectorOps.d12AnnIvf(spark, sfDir),
      "d17" -> VectorOps.d17AnnMultiprobe(spark, sfDir))
    fams.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name still ranks through a window")
      assert(plan.contains("partial_topk_by_score"),
        s"$name lacks the map-side partial top-k reduction")
    }
  }

  test("d13 auto-P: planes grow with corpus size from the floor") {
    assert(VectorOps.dupPlanesFor(0) == VectorOps.DupPlanes)
    assert(VectorOps.dupPlanesFor(2000) == VectorOps.DupPlanes)       // test scale
    assert(VectorOps.dupPlanesFor(16000 * VectorOps.DupTargetBucket) == 14)
    assert(VectorOps.dupPlanesFor(1000000000L) == 20)                 // 1e9 vectors
    // bucket population stays near target: n / 2^P <= 2 * target
    Seq(100000L, 10000000L, 1000000000L).foreach { n =>
      val p = VectorOps.dupPlanesFor(n)
      assert(n.toDouble / (1L << p) <= 2 * VectorOps.DupTargetBucket)
    }
  }

  test("d13 oversized-bucket backstop: rank cap bounds identical floods; stats observable") {
    // a flood of IDENTICAL vectors collides in every table bucket AND
    // every salt sub-bucket (salting cannot split what content dedup
    // should have collapsed) — the rank cap must bound the join.
    val one = Tables.embeddings(spark, sfDir).limit(1).select(col("embedding"))
    val flood = spark.range(120).select(col("id").as("vec_id")).crossJoin(one)
    val rows = VectorOps.dupBucketedRows(flood, "vec_id", "embedding",
      VectorOps.DupPlanes, maxBucket = 50)
    assert(rows.filter(col("salt") === -1).count() == 0, "flood buckets not salted")
    assert(rows.filter(col("rnk") > 50).count() > 0, "rank cap never engaged")
    val pairs = VectorOps.embeddingDupPairs(flood, "vec_id", "embedding",
      maxBucket = 50)
    assert(pairs.count() == 50L * 49 / 2, "flood join not bounded to cap choose 2")
    // real corpus at a tiny cap: salting engages and SPLITS buckets
    // (distinct vectors disagree on salt planes), bounding bucket work
    val salted = VectorOps.dupBucketedRows(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", VectorOps.DupPlanes, maxBucket = 10)
    val splits = salted.filter(col("salt") =!= -1)
      .groupBy(col("t"), col("b")).agg(countDistinct(col("salt")).as("nsub"))
      .filter(col("nsub") > 1)
    assert(splits.count() > 0, "salting never split an oversized bucket")
    // at the DEFAULT cap the test corpus triggers nothing — the
    // precondition for the exact DuckDB replay
    val stats = VectorOps.d13CapStats(spark, sfDir).head()
    assert(stats.getLong(0) == 0 && stats.getLong(1) == 0)
  }

  test("dot_product is bit-identical to the HOF fold; both folds null on length mismatch") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(2000)
    val diff = pairs.select(
      VectorOps.dot(col("ea"), col("eb")).as("native"),
      VectorOps.dotHof(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
    // mismatched lengths → NULL, not a truncated plausible value
    val short = pairs.select(VectorOps.dot(slice(col("ea"), 1, 32), col("eb")).as("d"),
      VectorOps.cosine(slice(col("ea"), 1, 32), col("eb")).as("c"))
    assert(short.filter(col("d").isNotNull || col("c").isNotNull).count() == 0)
    // zero-norm vector → NaN by contract
    val z = spark.range(1).select(
      VectorOps.cosine(array((0 until 4).map(_ => lit(0.0f)): _*),
        array((0 until 4).map(_ => lit(1.0f)): _*)).as("c"))
    assert(z.filter(isnan(col("c"))).count() == 1)
  }

  test("null vector elements propagate to NULL (native ≡ HOF), not a silent 0.0") {
    val withNull = array(lit(1.0f), lit(null).cast("float"), lit(3.0f))
    val dense = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val r = spark.range(1).select(
      VectorOps.dot(withNull, dense).as("dn"),
      VectorOps.cosine(withNull, dense).as("cn"),
      VectorOps.dotHof(withNull, dense).as("dh"),
      VectorOps.dot(dense, dense).as("dd")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 14.0)
  }

  test("DedupOps/VectorOps release unpins every cached block for the dataset") {
    // start from a clean slate: earlier specs may have warmed the cache
    DedupOps.release(spark, sfDir)
    VectorOps.release(spark, sfDir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    DedupOps.d6DedupMinhash(spark, sfDir).count()
    VectorOps.d12AnnIvf(spark, sfDir).count()
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty, "expected the shared subplan cache to persist blocks")
    DedupOps.release(spark, sfDir)
    VectorOps.release(spark, sfDir)
    // only this test's blocks are asserted gone — parallel suites may
    // legitimately persist their own frames meanwhile
    val leaked = spark.sparkContext.getPersistentRDDs.keySet & mine
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
    // released ⇒ next call rebuilds rather than serving an evicted frame
    assert(DedupOps.d6DedupMinhash(spark, sfDir).count() >= 0)
    DedupOps.release(spark, sfDir)
  }

  test("d23: chunksOf cuts 1-based non-overlapping windows with a partial tail") {
    val words = (1 to 23).map("w" + _).mkString(" ")
    val arr = spark.range(1)
      .select(CorpusOps.chunksOf(split(lit(words), " "), 10).as("c"))
      .head().getSeq[String](0)
    assert(arr.length == 3)
    assert(arr(0) == (1 to 10).map("w" + _).mkString(" "))
    assert(arr(2) == "w21 w22 w23")
  }

  test("d23 chunk dedup: bounds hold and near-dup docs carry duplicated chunks") {
    val rows = CorpusOps.d23ChunkDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      assert(d >= 0 && d <= n)
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getBoolean(4) == (ratio <= 0.3))
    }
    // the corpus has verified near-dup pairs, so duplicated chunks exist
    assert(rows.exists(_.getLong(2) > 0), "expected some duplicated chunks")
  }

  test("d24 packing is contiguous per source and integer-exact") {
    val rows = CorpusOps.d24SequencePack(spark, sfDir).collect()
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      assert(sorted.head.getLong(3) == 0L, "first doc starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(3) + a.getInt(2),
            "next doc starts where the previous ended")
        case _ =>
      }
    }
    rows.foreach { r =>
      val (start, n) = (r.getLong(3), r.getInt(2))
      assert(r.getLong(4) == start / CorpusOps.SeqLen)
      assert(r.getLong(5) == (start + n - 1) / CorpusOps.SeqLen)
      assert(r.getLong(4) <= r.getLong(5))
    }
  }

  test("d25 clusters close d6 pairs transitively with min-id labels") {
    val pairs = DedupOps.d6DedupMinhash(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus should contain near-dup pairs")
    val lab = CorpusOps.d25DedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both endpoints of every pair share a cluster
    pairs.foreach { case (a, b) =>
      assert(lab(a)._1 == lab(b)._1, s"pair ($a,$b) split across clusters")
    }
    // label = min member id; size = member count
    lab.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(cid == members.keys.min)
      members.values.foreach { case (_, sz) => assert(sz == members.size.toLong) }
    }
    // a chain a~b, b~c lands in ONE cluster even if (a,c) is not a pair
    val adj: Map[Long, Set[Long]] = pairs.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    val chained = for {
      (a, bs) <- adj.toSeq
      b <- bs.toSeq
      c <- adj.getOrElse(b, Set.empty[Long]).toSeq
      if c != a && !adj(a).contains(c)
    } yield (a, c)
    chained.foreach { case (a, c) => assert(lab(a)._1 == lab(c)._1) }
    CorpusOps.release(spark, sfDir)
  }

  test("CorpusOps.release unpins the d25 label cache") {
    CorpusOps.release(spark, sfDir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CorpusOps.d25DedupClusters(spark, sfDir).count()
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty, "expected d25 to persist its label frame")
    CorpusOps.release(spark, sfDir)
    DedupOps.release(spark, sfDir) // d25 warms d6's shared subplans too
    val leaked = spark.sparkContext.getPersistentRDDs.keySet & mine
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("c7 cohort retention: offset-0 row counts the full cohort") {
    val rows = Events.c7CohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0)).foreach { case (_, rs) =>
      val byOff = rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(byOff.contains(0), "every cohort has its week-0 row")
      assert(byOff.values.max == byOff(0), "no later week exceeds the cohort size")
      byOff.keys.foreach(o => assert(o >= 0))
    }
  }

  test("q27 returns only the selected segments with positive counts") {
    val rows = Analytics.q27BalanceGap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val segs = Set("AUTOMOBILE", "BUILDING", "MACHINERY")
    rows.foreach { r =>
      assert(segs.contains(r.getString(0)))
      assert(r.getLong(1) > 0)
    }
  }

  test("e2 shard manifest: offsets bounded, shards monotone per source") {
    val rows = MultimodalOps.e2BlobShard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getLong(4)
      assert(off >= 0 && off < MultimodalOps.ShardBytes)
    }
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0)).map(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, "shard index is nondecreasing")
        case _ =>
      }
    }
  }

  test("q28 promo share is a bounded percentage of positive revenue") {
    val r = Analytics.q28PromoShare(spark, sfDir).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 100.0)
    assert(r.getDouble(1) > 0.0)
  }

  test("q29 bilateral volume covers only the filtered years, positive sums") {
    val rows = Analytics.q29NationVolume(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(1996, 1997).contains(r.getInt(2)))
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q30 disjunctive filter stays one pass: exactly two scans") {
    // Asserts the ONE-pass shape (lineitem once, part once — never the
    // three-union form), but NOT the join strategy: part scales with SF
    // so the join is un-hinted and AQE picks broadcast at test SF, SMJ
    // at scale (r8 verdict).
    val df = Analytics.q30Disjunct(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected exactly lineitem+part scans, saw $scans")
    val r = df.head()
    assert(r.getDouble(0) >= 0.0 && r.getLong(1) >= 0L)
  }

  test("d26 rare-token profile bounds hold") {
    val rows = CorpusOps.d26RareTokens(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (occ, rare, types) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rare >= 0 && rare <= occ)
      assert(types <= rare)
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("d26 primitive flags planted rare tokens exactly") {
    // "zzq" appears in one doc, "common" in all three; df threshold 2
    import spark.implicits._
    val docs = Seq(
      (1L, "common alpha zzq zzq"),
      (2L, "common alpha beta"),
      (3L, "common alpha beta")).toDF("doc_id", "text")
    val byId = CorpusOps.rareTokenProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: alpha df=3, common df=3, zzq df=1 → 2 rare occurrences, 1 type
    assert(byId(1L).getLong(1) == 4 && byId(1L).getLong(2) == 2 && byId(1L).getLong(3) == 1)
    assert(byId(1L).getDouble(4) == 0.5)
    // beta df=2 is rare at the ≤2 threshold
    assert(byId(2L).getLong(2) == 1 && byId(2L).getLong(3) == 1)
    assert(byId(3L).getLong(2) == 1)
  }

  test("d27 fertility: at least one subword per word, exact doc totals") {
    val rows = TextOps.d27TokenizerFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) >= r.getLong(3), "subword splits can only refine words")
      assert(r.getDouble(5) >= 1.0)
    }
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs == Tables.documents(spark, sfDir).count())
  }

  test("d28 fuzzy join: split respected, bounded scores, no window merge stage") {
    val df = DedupOps.d28FuzzyTopk(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("row_number"),
      "per-query winner must come from the max_by aggregate, not a window")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 97 == 0 && r.getLong(1) % 97 != 0)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
    // at most one winner per query
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    DedupOps.release(spark, sfDir)
  }

  test("q31 top-20 compiles to TakeOrderedAndProject, returns ≤ 20 rows") {
    val df = Analytics.q31ReturnedItems(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // revenue is sorted descending with custkey tiebreak
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("e3 frame pipeline: identical blobs pair per frame, via bucketed equi-join") {
    import spark.implicits._
    val text = ("x" * 600) + ("y" * 600) // 2 stride-256 frames minimum
    val blobs = Seq((1L, text), (2L, text), (3L, "z" * 1200))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val pairs = MultimodalOps.frameDupPairs(spark, blobs)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the bucket equi-join")
    val rows = pairs.collect()
    assert(rows.nonEmpty, "identical blobs must produce frame pairs")
    rows.foreach { r =>
      assert(r.getLong(0) == 1L && r.getLong(2) == 2L, "only the identical blobs pair")
      assert(r.getDouble(4) >= 0.999)
    }
    // every sampled frame of doc 1 finds its twin in doc 2
    val matchedA = rows.map(_.getInt(1)).distinct.length
    val framesPerDoc = MultimodalOps.sampleFrames(spark,
      blobs.filter(col("doc_id") === 1L)).count()
    assert(matchedA.toLong == framesPerDoc)
  }

  test("q32 large orders: every row beats the DECIMAL threshold, sorted top-10") {
    val rows = Analytics.q32LargeOrders(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach(r => assert(r.getDouble(4) > 300.0))
    val qs = rows.map(_.getDouble(4))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
  }

  test("d29 dedup summary reconciles with the corpus and d6 membership") {
    val rows = TextOps.d29DedupSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    val pairs = DedupOps.d6DedupMinhash(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
    val memberCount = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length
    assert(rows.map(_.getLong(3)).sum == memberCount.toLong)
    DedupOps.release(spark, sfDir)
  }

  test("multimodal decodeBatch preserves ids and emits fixed-width features") {
    val blobs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val out = MultimodalOps.decodeBatch(spark, blobs)
    assert(out.count() == blobs.count())
    assert(out.head().features.length == 8)
  }

  test("decodeBatch accepts an alternative MediaDecoder without plumbing changes") {
    object ByteStatsDecoder extends MultimodalOps.MediaDecoder {
      def decode(batch: Seq[(Long, Array[Byte])]): Iterator[MultimodalOps.DecodedMedia] =
        batch.iterator.map { case (id, bytes) =>
          MultimodalOps.DecodedMedia(id, bytes.length, bytes.length, 1,
            Array(bytes.count(_ == ' ').toFloat))
        }
    }
    val blobs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val out = MultimodalOps.decodeBatch(spark, blobs, decoder = ByteStatsDecoder)
    assert(out.count() == blobs.count())
    val r = out.orderBy(col("doc_id")).head()
    assert(r.height == 1 && r.width == r.n_bytes && r.features.length == 1)
  }

  test("c11 attribution: purchase and revenue mass conserved across touch types") {
    val out = Events.c11Attribution(spark, sfDir).collect()
    assert(out.nonEmpty)
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    assert(out.map(_.getLong(1)).sum == purchases.count())
    val totalRev = purchases.agg(
      sum(Cols.dec2(col("value"))).cast("double")).head().getDouble(0)
    assert(math.abs(out.map(_.getDouble(2)).sum - totalRev) < 1e-6)
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("view", "click", "none")))
  }

  test("c12 daily anomalies equal a direct integer two-sigma recomputation") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
    val expected = daily.groupBy(_.getString(0)).toSeq.flatMap { case (t, rows) =>
      val cs = rows.map(_.getLong(2))
      val n = cs.length
      val s = cs.sum
      val ssq = cs.map(c => BigInt(c) * BigInt(c)).sum
      rows.filter { r =>
        val dev = BigInt(r.getLong(2)) * n - s
        dev * dev > 4 * (BigInt(n) * ssq - BigInt(s) * BigInt(s))
      }.map(r => (t, r.getDate(1).toString))
    }.toSet
    val got = Events.c12DailyAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(got == expected)
  }

  test("d42 incremental dedup: batch coverage and agreement with the pair cache") {
    val out = DedupOps.d42IncrementalDedup(spark, sfDir).cache()
    val batchCount = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 7).count()
    assert(out.count() == batchCount)
    val dups = out.filter(col("is_dup")).collect()
    dups.foreach { r =>
      assert(r.getDouble(3) >= 0.5)
      assert(r.getLong(2) % 10 != 7, "match must come from the corpus side")
    }
    val expected = DedupOps.sharedVerifiedPairs(spark, sfDir).collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      Seq(a, b).filter(x => x % 10 == 7) match {
        case Seq(one) if (if (one == a) b else a) % 10 != 7 => Some(one)
        case _ => None
      }
    }.toSet
    assert(dups.map(_.getLong(0)).toSet == expected)
    out.unpersist()
    DedupOps.release(spark, sfDir)
  }

  test("d43 ngram LM: descending top-k, backoff and continuation invariants") {
    val rows = TextOps.d43NgramLm(spark, sfDir).collect()
    assert(rows.length == TextOps.LmTopK)
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "left-context total bounds the bigram count")
      assert(r.getLong(4) >= 1L, "every bigram is at least its own continuation")
    }
    // exact cross-check of the top bigram's count by direct recomputation
    val top = rows.head
    val direct = Tables.documents(spark, sfDir)
      .select(TextOps.tokens(col("text")).as("t"))
      .select(explode(expr(
        "transform(sequence(1, greatest(size(t) - 1, 1)), i -> " +
          "concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("b"))
      .filter(col("b") === s"${top.getString(0)} ${top.getString(1)}")
      .count()
    assert(direct == top.getLong(2))
  }

  test("e7 epoch schedule: every epoch a permutation of e2's shard set; epochs reorder") {
    val rows = MultimodalOps.e7EpochSchedule(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == (0 until MultimodalOps.Epochs).toSet)
    // shard set must equal e2's distinct (source, shard_idx)
    val e2Shards = MultimodalOps.e2BlobShard(spark, sfDir)
      .select(col("source"), col("shard_idx")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    byEpoch.foreach { case (ep, xs) =>
      assert(xs.map(x => (x._2, x._3)).toSet == e2Shards, s"epoch $ep: shard set")
      assert(xs.map(_._4).sorted.toSeq == (1 to xs.length), s"epoch $ep: dense positions")
    }
    // adjacent epochs genuinely reorder (salted key differs)
    val order0 = byEpoch(0).sortBy(_._4).map(x => (x._2, x._3)).toSeq
    val order1 = byEpoch(1).sortBy(_._4).map(x => (x._2, x._3)).toSeq
    assert(order0 != order1, "epoch 0 and 1 must differ in order")
    // deterministic: a second evaluation is bit-identical
    val again = MultimodalOps.e7EpochSchedule(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("e6 blob dedup: canonical attribution replayed; conservation vs d5 exact dedup") {
    val rows = MultimodalOps.e6BlobDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // replay: canonical = min doc_id per exact text (md5 is injective on this corpus)
    val canon = docs.groupBy(_._3).map { case (_, xs) => xs.map(_._1).min }.toSet
    val bySource = docs.groupBy(_._2)
    rows.foreach { case (src, nb, tb, nc, rb, bp) =>
      val xs = bySource(src)
      assert(nb == xs.length.toLong, s"$src: n_blobs")
      assert(tb == xs.map(_._3.getBytes("UTF-8").length.toLong).sum, s"$src: bytes")
      assert(nc == xs.count(d => canon(d._1)).toLong, s"$src: canonical")
      assert(rb == xs.filter(d => !canon(d._1)).map(_._3.getBytes("UTF-8").length.toLong).sum)
      assert(bp == (nb - nc) * 10000 / nb, s"$src: dup_bp")
    }
    // global canonical count == d5's distinct-text count
    val distinctTexts = docs.map(_._3).distinct.length.toLong
    assert(rows.map(_._4).sum == distinctTexts)
  }

  test("d53 lang confusion: matrix ties out to d2 exactly; recall rows sum to 10000-ish") {
    val rows = TextOps.d53LangConfusion(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the matrix must be exactly d2's output regrouped
    val expected = TextOps.d2LangId(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == expected)
    // per true class: recall_bp of the cells recomputed, and the diagonal
    // dominates for every labeled language present in the lexicons
    rows.groupBy(_._1._1).foreach { case (t, cells) =>
      val tot = cells.map(_._2).sum
      cells.foreach { c => assert(c._3 == c._2 * 10000 / tot, s"$t") }
      val diag = cells.find(c => c._1._2 == t).map(_._2).getOrElse(0L)
      if (cells.exists(c => c._1._2 == t))
        assert(diag * 2 > tot, s"$t: diagonal majority")
    }
  }

  test("a26 retention plan: hour-grain expiry replayed; terminal actions occur") {
    val rows = Etl.a26RetentionPlan(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7)))
    assert(rows.nonEmpty)
    // both terminal actions must occur (drop tail, keep head); `rewrite`
    // appears only when the horizon splits an hour-populated day — the
    // replay below decides that, not a hard-coded expectation
    assert(Set("drop", "keep").subsetOf(rows.map(_._6).toSet))
    rows.foreach { case (k, n, ne, nh, neh, action) =>
      assert(ne <= n && neh <= nh, s"$k")
      val expect = if (neh == nh) "drop" else if (neh > 0) "rewrite" else "keep"
      assert(action == expect, s"$k")
    }
    // replay the hour-grain rule locally
    val ev = Tables.events(spark, sfDir).select(col("ts")).collect().map(_.getTimestamp(0))
    val cutoff = ev.map(_.getTime).max - 72L * 3600 * 1000
    val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
    val byHour = ev.groupBy { t =>
      cal.setTime(t)
      (cal.get(java.util.Calendar.YEAR), cal.get(java.util.Calendar.MONTH) + 1,
        cal.get(java.util.Calendar.DAY_OF_MONTH), cal.get(java.util.Calendar.HOUR_OF_DAY))
    }
    val expectedDays = byHour.toSeq.map { case ((y, m, d, h), ts) =>
      ((y, m, d), ts.length.toLong, ts.map(_.getTime).max < cutoff)
    }.groupBy(_._1).map { case (k, hs) =>
      k -> (hs.map(_._2).sum, hs.filter(_._3).map(_._2).sum, hs.length.toLong,
        hs.count(_._3).toLong)
    }
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap == expectedDays)
  }

  test("c16 top paths: local replay of path counts, tie-break, and c13 consistency") {
    val rows = Events.c16TopPaths(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    // replay every user's event sequence locally
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val all = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expected = all.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(rows.length)
    assert(rows.map(r => (r._1, r._2)).toSeq == expected)
    val total = all.values.sum
    rows.foreach { case (_, n, bp) => assert(bp == n * 10000 / total) }
    // consistency with c13: 3-paths starting (a,b) can't outnumber (a,b) transitions
    val c13 = Events.c13Transitions(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    all.groupBy { case ((a, b, _), _) => (a, b) }.foreach { case (ab, ps) =>
      assert(ps.values.sum <= c13(ab), s"$ab")
    }
  }

  test("q43 dominant supplier: 2x-fair-share dominance recomputed per pair") {
    val rows = Analytics.q43DominantSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute the dominated-pair set directly from lineitem (exact
    // cent-scaled integers — the same arithmetic, no float tolerance)
    val pairs = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(graft.Cols.dec2(col("l_quantity"))).as("sq")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDecimal(2).movePointRight(2).longValueExact()))
    val byPart = pairs.groupBy(_._1._2)
    val dominated = pairs.filter { case ((_, p), sq) =>
      val xs = byPart(p); sq * xs.length > 2 * xs.map(_._2).sum }
    val expected = dominated.groupBy(_._1._1).map { case (s, xs) => s -> xs.length.toLong }
    assert(rows.map(r => r._1 -> r._4).toMap == expected)
    // at most a minority of suppliers of a part can sit above 2x fair share
    dominated.groupBy(_._1._2).foreach { case (p, xs) =>
      assert(2 * xs.length < byPart(p).length, s"part $p") }
  }

  test("a25 compaction plan: byte conservation, dense bins, fill bounded by start-offset rule") {
    val rows = Etl.a25CompactionPlan(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val target = 4L * 1024 * 1024
    // total bytes across bins == total over the derived manifest
    val manifestTotal = Tables.events(spark, sfDir)
      .select(sum(pmod(pmod(col("event_id"), lit(1048576L)) * lit(2654435761L % 1048576L),
        lit(1048576L)) + lit(1024L)))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum == manifestTotal)
    rows.groupBy(_._1).foreach { case (part, bins) =>
      val sorted = bins.sortBy(_._2)
      // bins are dense from 0 within each partition
      assert(sorted.map(_._2).toSeq == (0L until bins.length).toSeq, s"$part: dense bins")
      // start-offset fill: a non-final bin spans its whole target window
      // minus at most one max-sized file of overhang from the prior bin
      sorted.init.foreach { b =>
        assert(b._4 > target - (1048576L + 1024L), s"$part bin ${b._2}: underfill") }
      bins.foreach { b =>
        assert(b._4 < target + 1048576L + 1024L, s"$part bin ${b._2}: overfill bounded")
        assert(b._5 == b._4 * 10000 / target, s"$part bin ${b._2}: fill_bp")
      }
    }
  }

  test("a24 scd2: intervals chain, no same-state adjacency, one open version per entity") {
    val rows = Etl.a24Scd2Build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to vs.length), s"user $uid: dense versions")
      // exactly one open (current) interval, and it is the last version
      assert(sorted.count(_._5.isEmpty) == 1 && sorted.last._5.isEmpty, s"user $uid")
      sorted.foreach { v => assert(v._6 == v._5.isEmpty, s"user $uid: is_current") }
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5.contains(b._4), s"user $uid: valid_to chains to successor valid_from")
        assert(a._3 != b._3, s"user $uid: consecutive versions differ in state")
      }
    }
    // change-compression conserves the event stream: version count per user
    // == number of state changes + 1, recomputed directly
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).map { case (uid, es) =>
      val states = es.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      uid -> (1 + states.zip(states.tail).count { case (a, b) => a != b })
    }
    assert(rows.groupBy(_._1).map { case (u, vs) => u -> vs.length } == expected)
  }

  test("d52 freq-of-freqs: mass conservation, monotone cum share, N_r recomputed") {
    val rows = CorpusOps.d52FreqOfFreqs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (freq, n, mass, _) => assert(mass == freq * n) }
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    val bps = rows.map(_._4)
    assert(bps.zip(bps.tail).forall { case (a, b) => a <= b } && bps.last == 10000L)
    // total token mass == corpus token count; N_r for the min freq recomputed
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(TextOps.tokens(col("text"))))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == totalTokens)
    val minFreq = rows.head._1
    val directN = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .filter(col("f") === minFreq).count()
    assert(rows.head._2 == directN)
  }

  test("a23 quality rules: four rules, counts recomputed, clean data passes") {
    val rows = Etl.a23QualityRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Seq(
      "custkey_fk_exists", "custkey_not_null", "orderdate_in_range", "totalprice_positive"))
    val total = Tables.orders(spark, sfDir).count()
    rows.foreach { case (rule, v, n, passed) =>
      assert(n == total, s"$rule: n_rows")
      assert(passed == (v == 0L), s"$rule: pass flag")
    }
    // direct recomputation of the FK rule
    val orphans = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(rows.head._2 == orphans)
  }

  test("d51 novelty: df=1 definition recomputed; bounds hold; complements d48 coverage") {
    val rows = TextOps.d51NgramNovelty(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, types, novel, bp) =>
      assert(novel <= types, s"doc $id")
      assert(bp == novel * 10000 / types, s"doc $id: bp")
    }
    // same doc coverage as d48 (every doc with >= 2 tokens)
    assert(rows.length == TextOps.d48LmFamiliarity(spark, sfDir).count())
    // recompute one doc's novel-type count directly
    val (id0, _, novel0, _) = rows.head
    val bigramsOf = (docId: Long) => Tables.documents(spark, sfDir)
      .filter(col("doc_id") === docId)
      .select(explode(expr(
        "transform(sequence(1, greatest(size(filter(split(text, ' '), x -> x != '')) - 1, 1)), " +
          "i -> concat(element_at(filter(split(text, ' '), x -> x != ''), i), ' ', " +
          "element_at(filter(split(text, ' '), x -> x != ''), i + 1)))")).as("b"))
      .distinct().collect().map(_.getString(0)).toSet
    val mine = bigramsOf(id0)
    assert(mine.nonEmpty)
    val otherBigrams = Tables.documents(spark, sfDir)
      .filter(col("doc_id") =!= id0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .flatMap(bigramsOf(_)).toSet
    assert(novel0 == mine.count(!otherBigrams.contains(_)))
  }

  test("d50 keep-best: one survivor per cluster, longest-then-min-id, covers d25 exactly") {
    val rows = CorpusOps.d50ClusterKeepBest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))
    val d25Rows = CorpusOps.d25DedupClusters(spark, sfDir).count()
    assert(rows.length.toLong == d25Rows, "keep-best must decide every clustered doc")
    rows.groupBy(_._2).foreach { case (cid, rs) =>
      assert(rs.count(_._5) == 1, s"cluster $cid: exactly one survivor")
      assert(rs.forall(_._3 == rs.length.toLong), s"cluster $cid: size column")
      val winner = rs.filter(_._5).head
      val best = rs.sortBy(r => (-r._4, r._1)).head
      assert(winner == best, s"cluster $cid: survivor must be longest-then-min-id")
    }
  }

  test("q42 min-cost supplier: per-part rows all carry the true minimum; ties kept") {
    val rows = Analytics.q42MinCostSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per part: one price value only (the min), possibly several suppliers
    rows.groupBy(_.getLong(0)).foreach { case (pk, rs) =>
      assert(rs.map(_.getDouble(4)).distinct.length == 1, s"part $pk: mixed prices")
    }
    // direct recomputation for the first part: min EU line price matches
    val pk = rows.head.getLong(0)
    val eu = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val direct = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") === pk)
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .agg(min(col("l_extendedprice")).cast("double")).collect()(0).getDouble(0)
    assert(rows.head.getDouble(4) == direct)
  }

  test("a22 partition skew: shares sum to <= 10000 bp, totals exact, flag recomputed") {
    val rows = Etl.a22PartitionSkew(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val totalRows = Tables.orders(spark, sfDir).count()
    assert(rows.map(_._3).sum == totalRows, "partition rows must partition the table")
    val bp = rows.map(_._5).sum
    assert(bp <= 10000L && bp > 10000L - rows.length, "floor-div shares must sum to just under 10000")
    val nParts = rows.length.toLong
    rows.foreach { case (y, m, n, _, _, skewed) =>
      assert(skewed == (n * nParts > 2L * totalRows), s"flag mismatch at $y-$m")
    }
  }

  test("d48 LM familiarity: ppm-bounded, covers every multi-token doc, bigram count exact") {
    val rows = TextOps.d48LmFamiliarity(spark, sfDir).collect()
    // every doc with >= 2 tokens has >= 1 bigram and must be scored
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n_tok"))
      .filter(col("n_tok") >= 2).collect()
    assert(rows.length == expected.length)
    val nTok = expected.map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (id, nBigrams, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nBigrams == nTok(id) - 1L, s"doc $id: bigram count must be n_tok - 1")
      // each bigram's p_ppm is in [0, 1e6]; so is their weighted mean
      assert(ppm >= 0L && ppm <= TextOps.LmScale, s"doc $id: familiarity $ppm out of range")
    }
    // a bigram occurring once under a unique left context has p = 1e6;
    // the corpus-wide weighted mean must sit strictly inside (0, 1e6]
    assert(rows.map(_.getLong(2)).max > 0L)
  }

  test("d49 token budget: per-source cap respected and kept set is the greedy hash prefix") {
    val kept = TextOps.d49TokenBudgetSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    kept.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum <= TextOps.TokenBudget, s"$src over budget")
      assert(rs.map(_._4).max == rs.map(_._3).sum, s"$src cum mismatch")
    }
    // greedy maximality: replay the prefix walk over the full frame
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
        md5(concat(lit("graft-budget:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val replay = all.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._4, r._1)).flatMap { r =>
        cum += r._3
        if (cum <= TextOps.TokenBudget) Some(r._1) else None
      }
    }.toSet
    assert(kept.map(_._1).toSet == replay, "kept set must equal the greedy prefix replay")
  }

  test("d44 quantization: calibration card sane; quantized top-k recall >= 0.9") {
    val card = VectorOps.d44EmbedQuantize(spark, sfDir).collect()
    assert(card.length == 64)
    card.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= VectorOps.QuantLevels)
      assert(r.getLong(4) >= 0 && r.getLong(5) <= (VectorOps.QuantLevels - 1))
      assert(r.getDouble(1) <= r.getDouble(2))
    }
    val deq = VectorOps.dequantized(spark, sfDir).cache()
    val q = deq.filter(col("vec_id") < VectorOps.NumQueries)
      .select(col("vec_id").as("query_id"), col("qembedding").as("qe"))
    val cand = deq.select(col("vec_id").as("neighbor_id"), col("qembedding").as("ne"))
    val scored = broadcast(q).join(cand, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("ne")).as("cos"))
    val approx = VectorOps.topKPerQuery(scored)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = VectorOps.d9CosineTopk(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall")
    deq.unpersist()
  }

  test("a20 schema drift matches direct per-load profiling") {
    val out = Etl.a20SchemaDrift(spark, sfDir).collect()
    assert(out.length == 4)
    val orders = Tables.orders(spark, sfDir)
    val a = orders.filter(year(col("o_orderdate")) % 2 === 0)
    val b = orders.filter(year(col("o_orderdate")) % 2 === 1)
    val row = out.find(_.getString(0) == "o_orderpriority").get
    assert(row.getLong(3) == a.select("o_orderpriority").distinct().count())
    assert(row.getLong(4) == b.select("o_orderpriority").distinct().count())
    assert(row.getLong(1) == 0 && row.getLong(2) == 0)
  }

  test("c13 transition matrix: rows normalize to 1, pair mass = events - users") {
    val out = Events.c13Transitions(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // each prev-row's probabilities sum to 1 (exact n/total arithmetic)
    out.groupBy(col("prev")).agg(sum(col("p")).as("s")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    // one transition per event except each user's first
    val ev = Tables.events(spark, sfDir)
    val expectedPairs = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expectedPairs)
    out.unpersist()
  }

  test("d45 semdedup: kept set pairwise-dissimilar per cluster, drops justified") {
    val out = VectorOps.d45SemDedup(spark, sfDir).cache()
    assert(out.count() == Tables.embeddings(spark, sfDir).count())
    val dropped = out.filter(!col("kept")).collect()
    dropped.foreach { r =>
      assert(r.getLong(3) < r.getLong(0), "dominator must have a lower id")
      assert(r.getDouble(4) >= VectorOps.DupTau)
    }
    // no two KEPT vectors in the same cluster are similar at >= tau
    val kept = out.filter(col("kept"))
      .join(Tables.embeddings(spark, sfDir), "vec_id")
      .select(col("vec_id"), col("cid"), col("embedding"))
    val violations = kept.as("x").join(kept.as("y"),
        col("x.cid") === col("y.cid") && col("y.vec_id") < col("x.vec_id"))
      .filter(VectorOps.cosine(col("x.embedding"), col("y.embedding")) >= VectorOps.DupTau)
      .count()
    assert(violations == 0L)
    out.unpersist()
    VectorOps.release(spark, sfDir)
  }

  test("q41 interpolated quartiles: ordered, and the median matches a driver replay") {
    val out = Analytics.q41QuartilesCont(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3)))
    val flag = out.head.getString(0)
    val vs = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === flag)
      .select(col("l_quantity").cast("double")).collect().map(_.getDouble(0)).sorted
    def interp(p: Double): Double = {
      val h = (vs.length - 1) * p
      val lo = h.toInt
      if (lo + 1 < vs.length) vs(lo) + (h - lo) * (vs(lo + 1) - vs(lo)) else vs(lo)
    }
    assert(out.head.getDouble(2) == interp(0.5))
    assert(out.head.getDouble(1) == interp(0.25) && out.head.getDouble(3) == interp(0.75))
  }

  test("a21 snapshot diff: class counts match the derivation rules exactly") {
    val out = Etl.a21SnapshotDiff(spark, sfDir).cache()
    val byClass = out.groupBy(col("change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sfDir).select(col("o_orderkey")).collect().map(_.getLong(0))
    val inA = keys.filter(_ % 13 != 5).toSet
    val inB = keys.filter(_ % 11 != 3).toSet
    assert(byClass.getOrElse("insert", 0L) == (inB -- inA).size.toLong)
    assert(byClass.getOrElse("delete", 0L) == (inA -- inB).size.toLong)
    assert(byClass.getOrElse("update", 0L) == (inA & inB).count(_ % 7 == 2).toLong)
    assert(!byClass.contains("unchanged"))
    out.unpersist()
  }

  test("c15 cohort funnel: per-cohort stage counts sum exactly to c6's global funnel") {
    val out = Events.c15CohortFunnel(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // each user belongs to exactly one cohort, so cohort sums = global funnel
    val global = Events.c6Funnel(spark, sfDir).head
    assert(rows.map(_.getLong(2)).sum == global.getLong(0)) // users_view
    assert(rows.map(_.getLong(3)).sum == global.getLong(1)) // users_click
    assert(rows.map(_.getLong(4)).sum == global.getLong(2)) // users_purchase
    // funnel monotone within every cohort, rate consistent
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3) && r.getLong(3) >= r.getLong(4))
      assert(r.getDouble(5) == r.getLong(4).toDouble / r.getLong(1))
    }
    // total distinct users conserved
    val users = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    out.unpersist()
  }

  test("c14 trending top-k: hop geometry and a recounted window's exact top-3") {
    val out = Events.c14TrendingTopk(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // hop geometry: 1 h windows on 30 min boundaries, ranks 1..m<=3 descending by n
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(0) == 3600L && r.getLong(0) % 1800 == 0)
    }
    rows.groupBy(_.getLong(0)).values.foreach { w =>
      val byRank = w.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to byRank.length))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0).getLong(4) >= p(1).getLong(4)))
    }
    // recount one window end-to-end: the busiest window's top-3 must match
    val ws = rows.maxBy(_.getLong(4)).getLong(0)
    val expected = Tables.events(spark, sfDir)
      .filter(unix_timestamp(col("ts")) >= ws && unix_timestamp(col("ts")) < ws + 3600)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = rows.filter(_.getLong(0) == ws).sortBy(_.getInt(2))
      .map(r => (r.getString(3), r.getLong(4))).toSeq
    assert(got == expected)
    out.unpersist()
  }

  test("d46 leakage split: no dup pair or exact group straddles splits, all docs covered") {
    val out = CorpusOps.d46LeakageSplit(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(out.count() == docs.count())
    // no verified near-dup pair crosses a split boundary
    val splits = out.select(col("doc_id"), col("split"))
    val crossPairs = DedupOps.sharedVerifiedPairs(spark, sfDir)
      .join(splits.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(splits.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossPairs == 0L)
    // no exact-dup group straddles splits either
    val straddling = docs.select(col("doc_id"), md5(trim(lower(col("text")))).as("k"))
      .join(splits, "doc_id")
      .groupBy(col("k")).agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddling == 0L)
    // salted buckets land near 80/10/10 (loose bounds at 500 docs)
    val frac = out.filter(col("split") === "train").count().toDouble / out.count()
    assert(frac > 0.6 && frac < 0.95)
    out.unpersist()
    DedupOps.release(spark, sfDir)
    CorpusOps.release(spark, sfDir)
  }

  test("e5 interleave pack: token accounting exact, local cumsum replay for one source") {
    val out = MultimodalOps.e5InterleavePack(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val L = CorpusOps.SeqLen
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3) + 1)
      assert(r.getLong(6) >= 0 && r.getLong(6) < L)
    }
    // replay the start-offset fill locally for the busiest source
    val src = rows.groupBy(_.getString(1)).maxBy(_._2.length)._1
    var off = 0L
    rows.filter(_.getString(1) == src).sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(5) == off / L && r.getLong(6) == off % L)
      off += r.getLong(4)
    }
    out.unpersist()
  }

  test("d47 split contamination: full local recompute matches at test scale") {
    val out = CorpusOps.d47SplitContamination(spark, sfDir).cache()
    val split = CorpusOps.d46LeakageSplit(spark, sfDir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def tris(s: String): Set[String] = {
      val t = s.split(" ").filter(_.nonEmpty)
      if (t.length < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val trainSh = texts.collect { case (id, tx) if split(id) == "train" => id -> tris(tx) }
    val allTrain = trainSh.values.foldLeft(Set.empty[String])(_ ++ _)
    val rows = out.collect()
    assert(rows.length == split.count(_._2 != "train"))
    rows.foreach { r =>
      val my = tris(texts(r.getLong(0)))
      assert(r.getLong(2) == (my & allTrain).size.toLong)
      assert(r.getLong(3) == trainSh.count { case (_, s) => (s & my).nonEmpty }.toLong)
      assert(r.getBoolean(4) == (r.getLong(3) > 0))
    }
    out.unpersist()
    DedupOps.release(spark, sfDir)
    CorpusOps.release(spark, sfDir)
  }

  test("e4 format profile conserves blob count and byte mass vs the corpus") {
    val out = MultimodalOps.e4FormatProfile(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
    assert(out.map(_.getLong(2)).sum == docs.count())
    val totalBytes = docs.agg(
      sum(octet_length(col("text").cast("binary")).cast("long"))).head().getLong(0)
    assert(out.map(_.getLong(3)).sum == totalBytes)
    out.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5), "min_bytes <= max_bytes")
      assert(r.getDouble(6) >= 640 && r.getDouble(6) <= 640 + 15 * 80)
    }
  }

  test("d54 domain affinity: odds-vote pipeline replayed locally in exact integers") {
    val rows = CorpusOps.d54DomainAffinity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(2).split(" ").filter(_.nonEmpty)
          .map(t => (r.getLong(0), r.getString(1), md5hex(t).substring(0, 2)))
      }
    val byBucket = toks.groupBy(_._3).map { case (b, xs) =>
      b -> (xs.count(_._2 == CorpusOps.TargetSource).toLong,
        xs.count(_._2 != CorpusOps.TargetSource).toLong)
    }
    val totalT = byBucket.values.map(_._1).sum
    val totalR = byBucket.values.map(_._2).sum
    val leans = byBucket.map { case (b, (t, r)) =>
      b -> (BigInt(t) * totalR > BigInt(r) * totalT) }
    val expect = toks.groupBy(x => (x._1, x._2)).map { case ((id, src), xs) =>
      val n = xs.length.toLong
      val tv = xs.count(x => leans(x._3)).toLong
      (id, src, n, tv, tv * 10000 / n)
    }.toSet
    assert(rows.toSet == expect)
    rows.foreach(r => assert(r._5 >= 0 && r._5 <= 10000))
    // both classes must actually occur or the score is degenerate
    assert(leans.values.exists(identity) && leans.values.exists(!_))
  }

  test("e8 aspect buckets: exact-rational nearest bucket replayed; batch math ties out") {
    val rows = MultimodalOps.e8AspectBuckets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val meta = MultimodalOps.e1MultimodalMeta(spark, sfDir)
      .select(col("width"), col("height")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // independent argmin: pairwise exact-rational comparison, no LCM key;
    // strict improvement only, so ties keep the earlier bucket
    val expect = meta.map { case (w, h) =>
      MultimodalOps.AspectBuckets.reduceLeft { (a, b) =>
        val na = BigInt((w.toLong * a._2 - h.toLong * a._1).abs) * b._2
        val nb = BigInt((w.toLong * b._2 - h.toLong * b._1).abs) * a._2
        if (nb < na) b else a
      }._3
    }.groupBy(identity).map { case (r, xs) => (r, xs.length.toLong) }
    assert(rows.map(r => r._1 -> r._2).toMap == expect)
    rows.foreach { case (_, n, nb, lo) =>
      assert(nb == n / MultimodalOps.BatchImages && lo == n % MultimodalOps.BatchImages)
    }
  }

  test("c17 bounce rate: 30-min sessionization + day rollup replayed locally") {
    val rows = Events.c17BounceRate(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (x._2.getTime, x._3))
      val sess = scala.collection.mutable.ArrayBuffer[List[java.sql.Timestamp]]()
      sorted.foreach { x =>
        if (sess.isEmpty || x._2.getTime - sess.last.last.getTime > 1800L * 1000)
          sess += List(x._2)
        else sess(sess.size - 1) = sess.last :+ x._2
      }
      sess
    }.toSeq
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expect = sessions.groupBy(s => fmt.format(s.head)).map { case (d, ss) =>
      val n = ss.size.toLong
      val b = ss.count(_.size == 1).toLong
      (d, n, b, b * 10000 / n)
    }.toSet
    assert(rows.toSet == expect)
    rows.foreach(r => assert(r._3 <= r._2 && r._4 <= 10000))
  }

  test("d55 source overlap: pairwise trigram Jaccard replayed locally") {
    val rows = CorpusOps.d55SourceOverlap(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.flatMap { case (_, text) =>
          val t = text.split(" ").filter(_.nonEmpty)
          if (t.length < 3) Seq.empty
          else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
        }.toSet
      }
    val srcs = bySource.keys.toSeq.sorted
    val expect = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
      inter = (bySource(a) & bySource(b)).size.toLong if inter > 0
    } yield {
      val na = bySource(a).size.toLong; val nb = bySource(b).size.toLong
      ((a, b), (inter, na, nb, inter * 10000 / (na + nb - inter)))
    }).toMap
    assert(rows.toMap == expect)
  }

  test("q44 mode: per-nation modal priority replayed locally with the tie rule") {
    val rows = Analytics.q44ModePriority(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val custNation = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val nationName = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val expect = orders
      .map { case (ck, pr) => (nationName(custNation(ck)), pr) }
      .groupBy(_._1).map { case (n, xs) =>
        val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        val (pr, c) = counts.minBy { case (p, cnt) => (-cnt, p) }
        (n, pr, c)
      }.toSet
    assert(rows.toSet == expect)
  }

  test("d56 quarantine expand: consistent closure of d20 direct set over d25 clusters") {
    val rows = CorpusOps.d56QuarantineExpand(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.nonEmpty)
    val direct = TextOps.d20Contamination(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val clusters = CorpusOps.d25DedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val hit = byCluster.filter(_._2.exists(direct)).values.flatten.toSet
    // exact membership + reason rule
    assert(rows.keySet == (direct ++ hit))
    rows.foreach { case (id, reason) =>
      if (direct(id)) assert(reason == "direct", s"$id")
      else assert(reason == "cluster" && hit(id), s"$id")
    }
    // the expansion must actually add someone at this SF or the test is vacuous
    assert((hit -- direct).nonEmpty)
  }

  test("d57 repeated spans: overlapping-window islands replayed locally") {
    // hot-gram hardening (r7 verdict): corpus multiplicity must come
    // from reduce + semi-join-back, never a corpus-sized window keyed
    // on the gram — that partition is unsplittable under skew
    val plan = CorpusOps.d57RepeatedSpans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(gram"),
      "d57 regressed to a gram-partitioned window:\n" + plan.take(1500))
    assert(plan.contains("LeftSemi"), plan.take(1500))
    val rows = CorpusOps.d57RepeatedSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val w = CorpusOps.SpanGram
    val grams = docs.flatMap { case (id, t) =>
      if (t.length < w) Seq.empty
      else (0 to t.length - w).map(i => (id, i + 1, t.slice(i, i + w).mkString(" ")))
    }
    val mult = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expect = grams.filter(g => mult(g._3) >= 2).groupBy(_._1).map { case (id, xs) =>
      val pos = xs.map(_._2).sorted
      // interval union with fixed width: break when gap > w
      val islands = pos.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
        acc match {
          case (s, e) :: rest if p - e <= w => (s, p) :: rest
          case _ => (p, p) :: acc
        }
      }
      val nTok = docs.find(_._1 == id).get._2.length
      val covered = islands.map { case (s, e) => e - s + w }.sum.toLong
      (id, islands.size.toLong, covered, nTok, covered * 10000 / nTok)
    }.toSet
    assert(rows.toSet == expect)
    // coverage sanity: spans never cover more than the doc
    rows.foreach(r => assert(r._3 <= r._4 && r._5 <= 10000))
  }

  test("d58 curriculum phases: per-source ntile replayed; phases balanced") {
    val rows = CorpusOps.d58CurriculumPhases(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val k = CorpusOps.CurriculumPhases
    rows.groupBy(_._2).foreach { case (src, xs) =>
      val ordered = xs.sortBy(x => (x._3, x._1))
      val n = ordered.size
      // ntile contract: first n%k tiles get n/k+1 rows, rest n/k
      var idx = 0
      (1 to k).foreach { tile =>
        val sz = n / k + (if (tile <= n % k) 1 else 0)
        ordered.slice(idx, idx + sz).foreach(x => assert(x._4 == tile, s"$src $tile"))
        idx += sz
      }
      assert(idx == n)
      // monotone: later phases never have shorter docs at the boundary
      val maxByPhase = ordered.groupBy(_._4).view.mapValues(_.map(_._3).max).toMap
      val minByPhase = ordered.groupBy(_._4).view.mapValues(_.map(_._3).min).toMap
      (1 until k).foreach(ph =>
        if (maxByPhase.contains(ph) && minByPhase.contains(ph + 1))
          assert(maxByPhase(ph) <= minByPhase(ph + 1), s"$src $ph"))
    }
  }

  test("c21 salted sessionize is bit-identical to c2, incl. planted hot key") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(Events.c21SessionizeSalted(spark, sfDir)) ==
      rows(Events.c2Sessionize(spark, sfDir)))
    // same check on a frame with one hot user (~10% of events) — the
    // scenario the salted plan exists for
    val hot = 777L
    val dir = java.nio.file.Files.createTempDirectory("graft_salt").toString
    Tables.events(spark, sfDir)
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) === 0, lit(hot)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    assert(rows(Events.c21SessionizeSalted(spark, dir)) ==
      rows(Events.c2Sessionize(spark, dir)))
  }

  test("c34/c31 survive a planted hot user key (r8 verdict skew spec)") {
    // The c21 planted-skew pattern extended to the newest per-user ops:
    // one user takes ~25% of all events (the pathological key a salted
    // variant would exist for); both operators must stay EXACTLY
    // correct — c34's user-keyed sweep windows and c31's bounded 7-day
    // fan-out concentrate the hot key on one task but never change
    // results. Ground truth is an independent driver-side replay over
    // the same rows (not the operator's own plan).
    val hot = 777L
    val dir = java.nio.file.Files.createTempDirectory("graft_hotkey").toString
    Tables.events(spark, sfDir)
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(4)) === 0, lit(hot)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val raw = spark.read.parquet(dir + "/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // --- c34: brute-force interval union per user ---
    val lenUs = 1800L * 1000000L
    val expect34 = raw.groupBy(_._1).view.mapValues { evs =>
      val sorted = evs.map(e => (e._3, e._2)).sortBy(identity).map(_._1)
      val blocks = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { t =>
        if (blocks.nonEmpty && t <= blocks.last._2)
          blocks(blocks.size - 1) = (blocks.last._1, math.max(blocks.last._2, t + lenUs))
        else blocks += ((t, t + lenUs))
      }
      (blocks.size.toLong, blocks.map(b => b._2 - b._1).sum, blocks.map(b => b._2 - b._1).max)
    }.toMap
    val got34 = Events.c34IntervalUnion(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got34 == expect34, s"c34 diverged under the hot key")
    assert(got34.contains(hot) && got34(hot)._1 >= 1)

    // --- c31: brute-force DAU / trailing-7-day WAU ---
    val ud = raw.map(e => (e._1, Math.floorDiv(e._3, 86400000000L))).distinct
    val maxDay = ud.map(_._2).max
    val dau = ud.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wau = ud.flatMap { case (u, d) =>
        (d to math.min(d + 6, maxDay)).map(dd => (dd, u))
      }.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect31 = dau.map { case (d, n) =>
      d -> ((n, wau(d), n * 10000L / wau(d)))
    }
    val got31 = Events.c31ActiveUsers(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got31 == expect31, s"c31 diverged under the hot key")
  }

  test("d87 crossing survives a planted hot source (r8 verdict skew spec)") {
    // Half the corpus lands in ONE source. d87's crossing windows run
    // over the value-grouped (source, stop_bp) frame — bounded by the
    // bp value space (≤10001 rows/source) no matter how hot the source
    // — so the result must stay exactly right. Ground truth replays
    // the cutoff from raw text driver-side.
    val dir = java.nio.file.Files.createTempDirectory("graft_hotsrc").toString
    Tables.documents(spark, sfDir)
      .withColumn("source",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("hot_source")).otherwise(col("source")))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val stops = Set("the", "a", "of", "and", "to", "in")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = docs.map { case (src, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val bp = toks.count(stops) * 10000L / math.max(1L, toks.length.toLong)
        (src, bp)
      }
      .groupBy(_._1).view.mapValues { bps =>
        val byVal = bps.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val total = byVal.map(_._2).sum
        var cum = 0L
        val (cutoff, cumAt, cntAt) = byVal.iterator.map { case (bp, cnt) =>
          cum += cnt; (bp, cum, cnt)
        }.find { case (_, c, _) => c * 10 >= total * 3 }.get
        val kept = total - cumAt + cntAt
        (cutoff, total, kept, kept * 10000L / total)
      }.toMap
    val got = TextOps.d87QualityCutoffs(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"d87 diverged under the hot source")
    assert(got.contains("hot_source"))
  }

  test("q58 skyline equals brute-force dominance; windows run over the reduced frame") {
    // independent replay: exact BigDecimal revenue + LocalDate delays,
    // frontier by the quadratic dominance definition the operator
    // deliberately avoids planning
    val raw = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("l_extendedprice").cast("string"),
        col("l_discount").cast("string"),
        to_date(col("l_shipdate")).cast("string"), to_date(col("o_orderdate")).cast("string"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getString(1)).setScale(2),
        BigDecimal(r.getString(2)).setScale(2), r.getString(3), r.getString(4)))
    val per = raw.groupBy(_._1).view.mapValues { ls =>
      val rev = ls.map(l => l._2 * (BigDecimal(1) - l._3)).sum
      val delay = ls.map(l => java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(l._5), java.time.LocalDate.parse(l._4))).max
      (rev, delay)
    }.toMap
    val frontier = per.keySet.filter { s =>
      val (rs, ds) = per(s)
      !per.exists { case (o, (ro, dor)) =>
        o != s && dor <= ds && ro >= rs && (dor < ds || ro > rs)
      }
    }
    val got = Analytics.q58Skyline(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == frontier, s"skyline ${got.toSeq.sorted} vs brute ${frontier.toSeq.sorted}")
    assert(got.nonEmpty)
    // one lineitem scan; dominance never plans an all-pairs join
    val plan = Analytics.q58Skyline(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.split(java.util.regex.Pattern.quote("lineitem.parquet"), -1).length - 1 == 1)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("d88 temperature weights: exact shares, sqrt-composed alphas, max-source unit") {
    val rows = TextOps.d88TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val nMax = rows.map(_._2).max
    rows.foreach { case (src, n, bp, w25, w50, w75) =>
      assert(bp == n * 10000L / total, s"$src share_bp")
      val r = n.toDouble / nMax.toDouble
      assert(w50 == math.sqrt(r) && w25 == math.sqrt(math.sqrt(r)) &&
        w75 == math.sqrt(r) * math.sqrt(math.sqrt(r)), s"$src weights")
      // α-monotone: closer to uniform as α falls (r ≤ 1)
      assert(w25 >= w50 && w50 >= w75, src)
      if (n == nMax) assert(w25 == 1.0 && w50 == 1.0 && w75 == 1.0, src)
    }
  }

  test("d89 dup-ngram coverage replays exactly; keeps the two-scan d57 budget") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      t.sliding(3).filter(_.length == 3).map(g => (id, src, g.mkString(" ")))
    }.toSeq
    val dupSet = grams.map(g => (g._3, g._1)).distinct
      .groupBy(_._1).filter(_._2.size >= 2).keySet
    val expect = grams.groupBy(_._2).view.mapValues { gs =>
      val occ = gs.size.toLong
      val dupOcc = gs.count(g => dupSet(g._3)).toLong
      val dupTypes = gs.filter(g => dupSet(g._3)).map(_._3).distinct.size.toLong
      (occ, dupOcc, dupOcc * 10000L / math.max(1L, occ), dupTypes)
    }.toMap
    val got = CorpusOps.d89DupNgramCoverage(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"d89 diverged from the driver replay")
    assert(got.values.exists(_._2 > 0), "testdata must contain cross-doc duplicate grams")
    // two documents scans (the adjudicated d57 reduce+join budget), no more
    val plan = CorpusOps.d89DupNgramCoverage(spark, sfDir).queryExecution.executedPlan.toString
    val scans = plan.split(java.util.regex.Pattern.quote("documents.parquet"), -1).length - 1
    assert(scans == 2, s"d89 must stay at the two-scan budget, saw $scans")
  }

  test("q59 basket pairs: brute-force lift replay; self-join reuses the exchange") {
    val baskets = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cI = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nBaskets = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    val pairCnt = baskets.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.size) yield (parts(i), parts(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairCnt.filter(_._2 >= Analytics.BasketMinSupport).toSeq
      .map { case ((p1, p2), cab) =>
        (p1, p2, cab, cI(p1), cI(p2),
          cab.toDouble * nBaskets.toDouble / (cI(p1).toDouble * cI(p2).toDouble))
      }
      .sortBy(t => (-t._3, t._1, t._2)).take(20)
    val got = Analytics.q59BasketPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect, s"q59 ${got.take(3)}... vs replay ${expect.take(3)}...")
    assert(got.nonEmpty, "testdata must contain co-purchased pairs at min support")
    // the two pair-join sides are the SAME windowed lineage: AQE must
    // dedupe them at runtime (one basket computation, not two) — reuse
    // shows in the FINAL adaptive plan, so execute before inspecting
    val df = Analytics.q59BasketPairs(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "pair self-join must reuse the basket exchange:\n" + plan.take(2000))
  }

  test("d89 survives a planted boilerplate gram present in EVERY doc") {
    // the hot-key scenario the reduce+join shape exists for: one gram
    // with df = |docs| would pin a gram-partitioned window; through
    // the groupBy (map-side partials) + keyed join it is just another
    // key, and the result must stay exact
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    Tables.documents(spark, sfDir)
      .withColumn("text", concat(lit("common legal boilerplate "), col("text")))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      t.sliding(3).filter(_.length == 3).map(g => (id, src, g.mkString(" ")))
    }.toSeq
    val dupSet = grams.map(g => (g._3, g._1)).distinct
      .groupBy(_._1).filter(_._2.size >= 2).keySet
    val expect = grams.groupBy(_._2).view.mapValues { gs =>
      val occ = gs.size.toLong
      val dupOcc = gs.count(g => dupSet(g._3)).toLong
      (occ, dupOcc, dupOcc * 10000L / math.max(1L, occ),
        gs.filter(g => dupSet(g._3)).map(_._3).distinct.size.toLong)
    }.toMap
    val got = CorpusOps.d89DupNgramCoverage(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, "d89 diverged under the planted boilerplate gram")
  }

  test("c40 Markov attribution: independent journey replay; removal monotone") {
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // journeys: per user sort by (ts, event_id), truncate at first purchase
    val edges = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    raw.groupBy(_._1).values.foreach { evs =>
      val path0 = evs.sortBy(e => (e._3, e._2)).map(_._4)
      val cut = path0.indexOf("purchase")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      var prev = "START"
      path.foreach { ch =>
        val to = if (ch == "purchase") "CONV" else ch
        edges((prev, to)) += 1L
        prev = to
      }
      if (prev != "CONV") edges((prev, "NULL")) += 1L
    }
    val totals = edges.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    def solve(pinned: Option[String]): Long = {
      val states = "START" +: Events.AttributionChannels :+ "CONV" :+ "NULL"
      var p = states.map(s => s -> (if (s == "CONV") 1000000L else 0L)).toMap
      (1 to Events.AttributionRounds).foreach { _ =>
        p = p.map { case (s, _) =>
          s -> (s match {
            case "CONV" => 1000000L
            case "NULL" => 0L
            case x if pinned.contains(x) => 0L
            case x => totals.get(x) match {
              case Some(tot) => edges.toSeq.filter(_._1._1 == x)
                .map { case ((_, to), c) => c * p.getOrElse(to, 0L) }.sum / tot
              case None => 0L
            }
          })
        }
      }
      p("START")
    }
    val pFull = solve(None)
    val rem = Events.AttributionChannels.map(c => c -> (pFull - solve(Some(c))))
    val totRem = math.max(1L, rem.map(_._2).sum)
    val expect = rem.map { case (c, rc) =>
      c -> ((pFull, pFull - rc, rc, rc * 10000L / totRem))
    }.toMap
    val got = Events.c40MarkovAttribution(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"c40 $got vs replay $expect")
    // structural: removal never negative (pinning can only lose mass),
    // credits use the whole 10000 bp up to integer floor
    got.values.foreach { case (pf, pw, rc, _) =>
      assert(rc >= 0 && pw <= pf)
    }
    assert(got.values.map(_._4).sum <= 10000)
    assert(got.values.exists(_._3 > 0), "some channel must carry removal effect")
  }

  test("a38 k-anonymity replays exactly; risk monotone in k") {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal").cast("string"))
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        (BigDecimal(r.getString(2)).setScale(2) * 100).toLongExact))
    val classes = rows.groupBy { case (n, s, cents) =>
      (n, s, (cents + 100000L) / 100000L)
    }.view.mapValues(_.size.toLong).values.toSeq
    val nRows = classes.sum
    val expect = Etl.KAnonThresholds.map { k =>
      val below = classes.filter(_ < k)
      k -> ((classes.size.toLong, below.size.toLong, below.sum,
        below.sum * 10000L / nRows, classes.min))
    }.toMap
    val got = Etl.a38KAnonymity(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"a38 $got vs replay $expect")
    // risk can only grow with k
    val byK = Etl.KAnonThresholds.map(got(_)._4)
    assert(byK == byK.sorted)
  }

  test("a39 l-diversity replays exactly against a joined driver ground truth") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal").cast("string"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getString(2),
        (BigDecimal(r.getString(3)).setScale(2) * 100).toLongExact))
    val prios = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val classes = cust.filter(c => prios.contains(c._1))
      .groupBy(c => (c._2, c._3, (c._4 + 100000L) / 100000L)).values.map { ms =>
        (ms.map(_._1).distinct.size.toLong,
          ms.flatMap(c => prios(c._1)).distinct.size.toLong)
      }.toSeq
    val totalMembers = classes.map(_._1).sum
    val expect = Etl.LDivThresholds.map { l =>
      val below = classes.filter(_._2 < l)
      l -> ((classes.size.toLong, below.size.toLong, below.map(_._1).sum,
        below.map(_._1).sum * 10000L / totalMembers, classes.map(_._2).min))
    }.toMap
    val got = Etl.a39LDiversity(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"a39 $got vs replay $expect")
  }

  test("a40 t-closeness: dense-domain EMD replay; skew flags monotone in t") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal").cast("string"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getString(2),
        (BigDecimal(r.getString(3)).setScale(2) * 100).toLongExact))
    val pairs = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val qiOf = cust.map(c => c._1 -> ((c._2, c._3, (c._4 + 100000L) / 100000L))).toMap
    val byClass = pairs.filter(p => qiOf.contains(p._1))
      .groupBy(p => qiOf(p._1))
    val dom = Etl.TClosePriorities
    val mAll = dom.map(p => p ->
      pairs.count(x => qiOf.contains(x._1) && x._2 == p).toLong).toMap
    val nAll = mAll.values.sum
    val classes = byClass.values.map { ms =>
      val mC = dom.map(p => p -> ms.count(_._2 == p).toLong).toMap
      val nC = mC.values.sum
      var cumC = 0L; var cumG = 0L
      val emd = dom.map { p =>
        cumC += mC(p); cumG += mAll(p)
        (BigInt(cumC) * nAll - BigInt(cumG) * nC).abs
      }.sum
      (nC, emd)
    }.toSeq
    val totalMembers = classes.map(_._1).sum
    val expect = Etl.TCloseThresholds.map { t =>
      val above = classes.filter { case (nC, emd) => emd * 1000 > BigInt(nC) * nAll * t }
      t -> ((classes.size.toLong, above.size.toLong, above.map(_._1).sum,
        above.map(_._1).sum * 10000L / totalMembers,
        classes.map { case (nC, emd) => (emd * 1000 / (BigInt(nC) * nAll)).toLong }.max))
    }.toMap
    val got = Etl.a40TCloseness(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"a40 $got vs replay $expect")
    // flags can only shrink as t grows
    val above = Etl.TCloseThresholds.map(got(_)._2)
    assert(above == above.sorted.reverse)
  }

  test("c38 MAD anomalies replay exactly over the zero-filled spine") {
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expect = raw.groupBy(_._1).view.mapValues { evs =>
      val byDay = evs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val series = (byDay.keys.min to byDay.keys.max).map(d => byDay.getOrElse(d, 0L))
      val med = medianOf(series.map(_.toDouble))
      val devs = series.map(n => math.abs(n.toDouble - med))
      val mad = medianOf(devs)
      (series.size.toLong, med, mad, devs.count(_ > 3 * mad).toLong)
    }.toMap
    val got = Events.c38MadAnomaly(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expect, s"c38 $got vs replay $expect")
    assert(got.nonEmpty)
  }

  test("c39 Wilson intervals: replayed bounds, coverage shape, user-grain units") {
    val raw = Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = raw.groupBy(_._1).view
      .mapValues(_.exists(_._2 == "purchase")).toMap
    val expect = perUser.groupBy(_._1 % 2).view.mapValues { us =>
      val n = us.size.toLong
      val k = us.count(_._2).toLong
      val nd = n.toDouble; val p = k.toDouble / nd
      val z = 1.96; val z2 = z * z
      val denom = 1.0 + z2 / nd
      val center = p + z2 / (2.0 * nd)
      val half = z * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
      (n, k, k * 10000L / n, (center - half) / denom, (center + half) / denom)
    }.toMap
    val got = Events.c39AbLift(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet && got.keySet == Set(0L, 1L))
    got.foreach { case (v, (n, k, bp, lo, hi)) =>
      val (en, ek, ebp, elo, ehi) = expect(v)
      assert((n, k, bp) == ((en, ek, ebp)), s"variant $v counts")
      assert(math.abs(lo - elo) < 1e-12 && math.abs(hi - ehi) < 1e-12, s"variant $v CI")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= k.toDouble / n && k.toDouble / n <= hi,
        s"variant $v Wilson bounds must bracket the rate inside [0,1]")
    }
  }

  test("a27 drift sketch: agrees with exact a20 within rsd bounds; no Expand") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))
      }.toMap
    val exact = byCol(Etl.a20SchemaDrift(spark, sfDir))
    val sketch = byCol(Etl.a27DriftSketch(spark, sfDir))
    assert(sketch.keySet == exact.keySet)
    // 5-sigma band on the rsd: relative error beyond this is a bug,
    // not HLL variance.
    val tol = 5 * Etl.DriftSketchRsd
    exact.foreach { case (c, (nA, nB, dA, dB, rw)) =>
      val (sA, sB, eA, eB, srw) = sketch(c)
      assert(sA == nA && sB == nB, s"$c null counts must stay exact")
      assert(srw == rw, s"$c range_widened must stay exact")
      assert(math.abs(eA - dA) <= math.max(1L, (tol * dA).toLong), s"$c distinct_a $eA vs $dA")
      assert(math.abs(eB - dB) <= math.max(1L, (tol * dB).toLong), s"$c distinct_b $eB vs $dB")
    }
    // the point of the twin: the sketch plan has NO Expand node
    val sketchPlan = Etl.a27DriftSketch(spark, sfDir).queryExecution.executedPlan.toString
    val exactPlan = Etl.a20SchemaDrift(spark, sfDir).queryExecution.executedPlan.toString
    assert(!sketchPlan.contains("Expand"), "a27 must not plan an Expand")
    assert(exactPlan.contains("Expand"), "a20's exact form plans the Expand (adjudicated)")
  }

  test("a30 cluster plan: Z-ranges disjoint per partition, interleave exact, bytes conserved") {
    val rows = Etl.a30ClusterPlan(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // the pruning property: within a partition, output files cover
    // non-interleaved Z-ranges (boundary ties allowed when one z value
    // straddles a bin edge), in bin order, bins dense from 0
    rows.groupBy(_._1).foreach { case (part, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until bins.length).toSeq, s"$part: dense bins")
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (lo, hi) = (pair(0), pair(1))
        assert(lo._5 <= lo._6 && hi._5 <= hi._6, s"$part: z_min <= z_max")
        assert(lo._6 <= hi._5, s"$part: z-ranges must not interleave: $lo vs $hi")
      }
    }
    // interleave replayed locally on a sample: even bits from ka, odd from kb
    val sample = Tables.events(spark, sfDir)
      .select(col("user_id"), hour(col("ts")) * 60 + minute(col("ts"))).limit(200)
      .collect().map(r => (r.getLong(0) % 1024L, r.getInt(1).toLong))
    def zOf(ka: Long, kb: Long): Long =
      (0 until Etl.ZBits).map(i => (((ka >> i) & 1L) << (2 * i)) | (((kb >> i) & 1L) << (2 * i + 1))).sum
    val zs = sample.map { case (ka, kb) => zOf(ka, kb) }
    sample.zip(zs).foreach { case ((ka, kb), z) =>
      // de-interleaving recovers both keys exactly
      val kaBack = (0 until Etl.ZBits).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val kbBack = (0 until Etl.ZBits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(kaBack == ka && kbBack == kb)
    }
    // bytes conserved vs the a25 manifest (same synthetic sizes)
    val manifestTotal = Tables.events(spark, sfDir)
      .select(sum(pmod(pmod(col("event_id"), lit(1048576L)) * lit(2654435761L % 1048576L),
        lit(1048576L)) + lit(1024L)))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum == manifestTotal)
  }

  test("d67 BPE merges: sequential pure-Scala trainer replayed exactly") {
    // reference implementation: classic sequential BPE over the same
    // word-frequency table — greedy left-to-right merge application,
    // (count desc, pair asc) tie-break. The distributed fold and the
    // driver replay must agree on every round's pair AND count.
    val words = Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var segs: Map[Vector[String], Long] =
      words.groupBy(_._1.map(_.toString).toVector).view.mapValues(_.values.sum).toMap
    def applyMerge(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      s.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) out(out.size - 1) = a + b
        else out += x
      }
      out.toVector
    }
    val expect = (1 to TextOps.BpeMergeRounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (s, f) =>
        s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      segs = segs.groupBy { case (s, _) => applyMerge(s, a, b) }
        .view.mapValues(_.values.sum).toMap
      (r, a, b, a + b, cnt)
    }
    val got = TextOps.d67BpeMerges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == expect.toSeq)
    // merge table sanity: rounds dense from 1, counts positive
    assert(got.map(_._1).toSeq == (1 to TextOps.BpeMergeRounds).toSeq)
    got.foreach(m => assert(m._5 > 0))
  }

  test("d68 BPE encode: pure-Scala merge application + per-source fertility replay") {
    // the merge table itself is proven ≡ the sequential trainer by the
    // d67 spec; here we apply it greedily left-to-right in pure Scala to
    // every word occurrence and recompute the per-source fertility card.
    val merges = TextOps.d67BpeMerges(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def applyMerge(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      s.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) out(out.size - 1) = a + b
        else out += x
      }
      out.toVector
    }
    val enc = scala.collection.mutable.Map[String, Int]() // word -> n_sym
    def nSym(w: String): Int = enc.getOrElseUpdate(w,
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => applyMerge(s, a, b) }.size)
    val occ = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).map(w => (r.getString(0), w))
      }
    val expect = occ.groupBy(_._1).map { case (src, ws) =>
      val words = ws.map(_._2)
      val nWords = words.length.toLong
      val nTok = words.map(w => nSym(w).toLong).sum
      val nTypes = words.distinct.length.toLong
      val nWhole = words.count(w => nSym(w) == 1).toLong
      (src, nWords, nTok, nTypes, nTok * 10000 / nWords, nWhole * 10000 / nWords)
    }.toSeq.sortBy(_._1)
    val got = TextOps.d68BpeEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // fertility sanity: every word emits ≥1 token and ≤ its char count
    got.foreach { case (_, nw, nt, _, fert, _) =>
      assert(nt >= nw); assert(fert >= 10000)
    }
  }

  test("a33 overlap depth: sweep-line pair count replayed, Z beats id layout") {
    val zones = Etl.layoutZones(spark, sfDir).collect()
      .map(r => (r.getString(6), r.getInt(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    val expect = zones.groupBy(z => (z._1, z._2, z._3)).map { case ((lay, y, m), bs) =>
      val ranges = bs.map(b => (b._4, b._5))
      // index pairs, not value combinations — Seq.combinations collapses
      // bins that happen to share the same (min, max) range
      val pairs = (for {
        i <- ranges.indices; j <- ranges.indices if i < j
        a = ranges(i); b = ranges(j)
      } yield if (a._1 <= b._2 && b._1 <= a._2) 1L else 0L).sum
      // max stacking depth: sweep over starts
      val evs = ranges.flatMap(r => Seq((r._1, 1L), (r._2 + 1, -1L)))
        .sortBy(e => (e._1, e._2))
      var (act, mx) = (0L, 0L)
      evs.foreach { e => act += e._2; if (e._2 == 1) mx = math.max(mx, act) }
      (lay, y, m, ranges.size.toLong, pairs, mx)
    }.toSeq.sortBy(x => (x._1, x._2, x._3))
    val got = Etl.a33OverlapDepth(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the clustering claim at the layout grain: Z never stacks worse
    val byPart = got.groupBy(x => (x._2, x._3))
    byPart.foreach { case (_, xs) =>
      val z = xs.find(_._1 == "z").get
      val id = xs.find(_._1 == "id").get
      assert(z._5 <= id._5, s"Z layout has MORE overlap pairs: ${z._5} > ${id._5}")
    }
  }

  test("d74 calibration matrix: quartile cuts and matrix replayed from d3 x d48") {
    val flags = TextOps.d3QualityScore(spark, sfDir)
      .select("doc_id", "quality_flag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fam = TextOps.d48LmFamiliarity(spark, sfDir)
      .select("doc_id", "familiarity_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val joined = fam.collect { case (id, ppm) if flags.contains(id) => (flags(id), ppm) }
    val vals = joined.map(_._2).sorted
    val n = vals.length.toLong
    def cut(k: Int) = vals(vals.indices.find(i => (i + 1) * 4L >= n * k).get)
    val (c1, c2, c3) = (cut(1), cut(2), cut(3))
    def q(p: Long) = 1 + (if (p > c1) 1 else 0) + (if (p > c2) 1 else 0) + (if (p > c3) 1 else 0)
    val m = joined.groupBy(x => (x._1, q(x._2))).view.mapValues(_.length.toLong).toMap
    val flagTot = m.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val expect = m.toSeq.map { case ((f, qt), cnt) =>
      (f, qt, cnt, cnt * 10000 / flagTot(f)) }.sortBy(x => (x._1, x._2))
    val got = TextOps.d74QualityCalibration(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.map(_._3).sum == joined.length.toLong)
  }

  test("c27 audience overlap: exact distinct-user Jaccard replayed per type pair") {
    val uv = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = uv.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
      shared = (byType(a) & byType(b)).size.toLong if shared > 0
      na = byType(a).size.toLong; nb = byType(b).size.toLong
    } yield (a, b, shared, na, nb, shared * 10000 / (na + nb - shared)))
      .sortBy(x => (x._1, x._2))
    val got = Events.c27AudienceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("d73 affinity curation: greedy per-source prefix replay over d54's scores") {
    val scored = CorpusOps.d54DomainAffinity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    def h(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"graft-affinity:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      var cum = 0L
      xs.sortBy(x => (-x._4, h(x._1), x._1)).flatMap { case (id, src, nTok, aff) =>
        cum += nTok
        if (cum <= CorpusOps.AffinityBudget) Some((id, src, nTok, aff, cum)) else None
      }
    }.sortBy(_._1)
    val got = CorpusOps.d73AffinityCuration(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // budget honored per source; selection is affinity-monotone: no
    // rejected doc of a source out-scores an accepted one
    val kept = got.groupBy(_._2)
    kept.foreach { case (_, xs) => assert(xs.map(_._3).sum <= CorpusOps.AffinityBudget) }
    scored.groupBy(_._2).foreach { case (src, xs) =>
      val keptIds = kept.getOrElse(src, Seq.empty).map(_._1).toSet
      val minKept = xs.filter(x => keptIds(x._1)).map(_._4).minOption
      val maxRej = xs.filterNot(x => keptIds(x._1)).map(_._4).maxOption
      (minKept, maxRej) match {
        case (Some(mk), Some(mr)) => assert(mr <= mk,
          s"$src: rejected affinity $mr above kept floor $mk")
        case _ => ()
      }
    }
  }

  test("c26 level shift: pure-Scala two-sided window replay") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_date(to_date(ts))").as("d"))
      .groupBy("event_type", "d").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val expect = daily.keys.toSeq.flatMap { case (t, d) =>
      val before = (d - Events.ShiftSpanDays to d - 1).flatMap(x => daily.get((t, x)))
      val after = (d + 1 to d + Events.ShiftSpanDays).flatMap(x => daily.get((t, x)))
      if (before.size >= Events.ShiftMinDays && after.size >= Events.ShiftMinDays &&
          before.sum > 0 && after.sum > 0) {
        val up = after.sum * before.size
        val dn = before.sum * after.size
        val ratio = math.max(up, dn).toDouble / math.min(up, dn)
        Some((t, d, ratio, if (up >= dn) "up" else "down"))
      } else None
    }.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(Events.ShiftTopK).zipWithIndex
        .map { case ((tt, dd, r, dir), i) => (tt, dd, r, dir, i + 1) }
    }.sortBy(x => (x._1, x._5))
    val got = Events.c26LevelShift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(7), r.getString(8), r.getInt(9)))
      .toSeq
    assert(got == expect)
    assert(got.nonEmpty, "level-shift ranking vacuous at test SF")
  }

  test("d71 boundary stitch: rare-affix replay, non-vacuous at sf0.01") {
    val dir01 = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir01).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val aff = docs.collect { case (id, t) if t.length >= 2 * TextOps.StitchAffix =>
      (id, t.take(TextOps.StitchAffix).mkString(" "),
        t.takeRight(TextOps.StitchAffix).mkString(" ")) }
    val sufDf = aff.groupBy(_._3).map { case (k, v) => k -> v.size }
    val preDf = aff.groupBy(_._2).map { case (k, v) => k -> v.size }
    val expect = (for {
      a <- aff; b <- aff
      if a._1 != b._1 && a._3 == b._2
      if sufDf(a._3) <= TextOps.StitchMaxDf && preDf(b._2) <= TextOps.StitchMaxDf
    } yield (a._1, b._1, a._3)).sortBy(x => (x._1, x._2)).toSeq
    val got = TextOps.d71BoundaryStitch(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "stitch detector vacuous at sf0.01")
  }

  test("d72 vocab growth: mass conservation and running-sum exactness") {
    val rows = TextOps.d72VocabGrowth(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextOps.VocabGrowthBuckets + 1)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    assert(rows.map(_.getLong(1)).sum == docs.length.toLong)
    assert(rows.last.getLong(4) == docs.map(_._2.length.toLong).sum,
      "cum_tokens != total token occurrences")
    assert(rows.last.getLong(5) == docs.flatMap(_._2).distinct.length.toLong,
      "cum_types != corpus distinct types")
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getLong(4) == p.getLong(4) + n.getLong(2))
        assert(n.getLong(5) == p.getLong(5) + n.getLong(3))
      case _ => ()
    }
  }

  test("d70 embedding split leak: eval-only rows, τ floor, d13/d46 consistency") {
    val dir01 = "/root/testdata/sf0.01"
    val leaks = VectorOps.d70SplitEmbedLeak(spark, dir01).collect()
    assert(leaks.nonEmpty, "embedding leak audit vacuous at sf0.01")
    val split = CorpusOps.d46LeakageSplit(spark, dir01)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = VectorOps.d13DedupEmbedding(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    leaks.foreach { r =>
      val (id, sp, n, mx) = (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(sp == split(id) && sp != "train")
      assert(mx >= VectorOps.DupTau)
      val mates = pairs.collect {
        case (a, b, c) if a == id && split(b) == "train" => c
        case (a, b, c) if b == id && split(a) == "train" => c
      }
      assert(mates.length.toLong == n && mates.max == mx)
    }
    // completeness: every train↔eval d13 pair surfaces as exactly one leak row
    val expectIds = pairs.flatMap { case (a, b, _) =>
      (split(a) == "train", split(b) == "train") match {
        case (true, false) => Some(b)
        case (false, true) => Some(a)
        case _ => None
      }
    }.toSet
    assert(leaks.map(_.getLong(0)).toSet == expectIds)
  }

  test("c28 type pagerank: sequential integer replay exact; mass conserved") {
    val got = Events.c28TypePagerank(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // independent replay from raw events, sequential, same integer rules
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val edges = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.lazyZip(sorted.drop(1)).map((a, b) => (a, b))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSeq.distinct.sorted
    val nN = nodes.length.toLong
    val outN = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val base = Events.PageRankScale / nN
    var score: Map[String, Long] = nodes.map(_ -> base).toMap
    for (_ <- 1 to Events.PageRankRounds) {
      val dang = nodes.filterNot(outN.contains).map(score).sum
      val contrib = scala.collection.mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      for (((s, d), n) <- edges) contrib(d) += BigInt(score(s)) * n / outN(s)
      score = nodes.map(t =>
        t -> ((BigInt(base) * 15 + (contrib(t) + dang / nN) * 85) / 100).toLong).toMap
    }
    val want = nodes.map(t => t -> score(t)).sortBy { case (t, s) => (-s, t) }
    assert(got.toSeq == want, s"pagerank replay mismatch: got=${got.toSeq} want=$want")
    // damped truncating updates lose < 100 ppt per node per round
    val sum = got.map(_._2).sum
    assert(sum <= Events.PageRankScale &&
      sum >= Events.PageRankScale - nN * Events.PageRankRounds * 100)
    assert(got.forall(_._2 > 0))
  }

  test("d75 token concentration: per-source Simpson replayed exactly") {
    val got = TextOps.d75TokenConcentration(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val bySource = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2))
    assert(got.keySet == bySource.keySet.toSet)
    bySource.foreach { case (src, toks) =>
      val counts = toks.groupBy(identity).values.map(_.size.toLong).toSeq
      val n = counts.sum
      val rep = counts.map(c => BigInt(c) * (c - 1)).sum
      val simpson = (rep * 10000 / (BigInt(n) * (n - 1))).toLong
      val top = counts.max * 10000 / n
      val (gTypes, gTok, gSimp, gTop) = got(src)
      assert(gTypes == counts.length.toLong && gTok == n)
      assert(gSimp == simpson && gTop == top, s"$src: ($gSimp,$gTop) != ($simpson,$top)")
    }
  }

  test("d76 sentence profile: sentence words partition the token stream exactly") {
    val got = TextOps.d76SentenceProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val total = ds.map(_._2.length.toLong).sum
      val (nSents, nWords, p50, maxW) = got(src)
      // injection adds terminators, never tokens: sentence words must
      // partition the corpus token stream exactly
      assert(nWords == total, s"$src: $nWords != $total")
      assert(nSents >= ds.length.toLong, "splitting can only add segments")
      assert(p50 >= 1L && p50 <= maxW && maxW <= ds.map(_._2.length.toLong).max)
    }
  }

  test("q51 nearest supplier: local 3x3-grid brute-force replay exact") {
    val got = Analytics.q51NearestSupplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def px(k: Long) = (k % 2147483648L) * 2654435761L % 1000000L
    def py(k: Long) = (k % 2147483648L) * 2246822519L % 1000000L
    val cell = Analytics.GridCell
    val sups = Tables.supplier(spark, sfDir).select("s_suppkey").collect()
      .map(r => { val k = r.getLong(0); (k, px(k), py(k)) })
    val custs = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0))
    var matched = 0
    custs.foreach { ck =>
      val (cx, cy) = (px(ck), py(ck))
      val cands = sups.filter { case (_, sx, sy) =>
        math.abs(sx / cell - cx / cell) <= 1 && math.abs(sy / cell - cy / cell) <= 1
      }
      if (cands.isEmpty) assert(!got.contains(ck), s"$ck: row despite empty neighborhood")
      else {
        val want = cands.map { case (sk, sx, sy) =>
          ((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy), sk)
        }.min
        assert(got(ck) == ((want._2, want._1)), s"$ck: ${got.get(ck)} != $want")
        matched += 1
      }
    }
    assert(matched > custs.length / 2, "grid too sparse to exercise the join")
  }

  test("c30 variant extract ≡ c4's legacy string-path stats; missing path counted") {
    val v = Events.c30VariantExtract(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val legacy = Events.c4JsonExtract(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(v.keySet == legacy.keySet)
    v.foreach { case (t, (n, kSum, kMin, kMax, nMissing)) =>
      val (ln, lSum, lMin, lMax) = legacy(t)
      assert((n, kSum, kMin, kMax) == ((ln, lSum, lMin, lMax)),
        s"$t: variant path disagrees with the legacy string path")
      assert(nMissing == n, "no event carries $.q - every row counts as missing")
    }
  }

  test("a35 FD audit: verdicts replayed from raw distinct counts") {
    val got = Etl.a35FdAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    def check(name: String, nLhs: Long, nPairs: Long): Unit = {
      val (_, _, gl, gp, holds) = got(name)
      assert(gl == nLhs && gp == nPairs, s"$name: ($gl,$gp) != ($nLhs,$nPairs)")
      assert(holds == (nLhs == nPairs))
    }
    check("orderkey_is_key", rows.map(_._1).distinct.length.toLong, rows.length.toLong)
    check("orderkey_det_custkey", rows.map(_._1).distinct.length.toLong,
      rows.map(r => (r._1, r._2)).distinct.length.toLong)
    check("custkey_det_priority", rows.map(_._2).distinct.length.toLong,
      rows.map(r => (r._2, r._3)).distinct.length.toLong)
    check("priority_det_status", rows.map(_._3).distinct.length.toLong,
      rows.map(r => (r._3, r._4)).distinct.length.toLong)
    // ground truth on this schema: orderkey keys the table and determines
    // custkey; a customer has many priorities
    assert(got("orderkey_is_key")._5 && got("orderkey_det_custkey")._5)
    assert(!got("custkey_det_priority")._5)
  }

  test("c31/c32 active users: DAU/WAU/new replayed from raw (user, day) sets") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val maxDay = ud.map(_._2).max
    val c31 = Events.c31ActiveUsers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ud.map(_._2).distinct.foreach { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(p => p._2 <= d && p._2 >= d - 6).map(_._1).distinct.length.toLong
      val (gd, gw, gs) = c31(d)
      assert(gd == dau && gw == wau, s"day $d: ($gd,$gw) != ($dau,$wau)")
      assert(gs == dau * 10000 / wau)
      assert(gw >= gd, "WAU is a superset of DAU")
    }
    assert(c31.keySet == ud.map(_._2).toSet, "fan-out must add no phantom days")
    assert(maxDay == c31.keys.max)
    val c32 = Events.c32NewVsReturning(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    ud.map(_._2).distinct.foreach { d =>
      val act = ud.filter(_._2 == d)
      val nNew = act.count(p => firstDay(p._1) == d).toLong
      assert(c32(d) == ((act.length.toLong, nNew)), s"day $d new/active")
    }
    // every user is new exactly once
    assert(c32.values.map(_._2).sum == firstDay.size.toLong)
  }

  test("d79 mixture schedule: Bresenham pacing exact at every prefix") {
    val rows = TextOps.d79MixtureSchedule(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val chars = Tables.documents(spark, sfDir).groupBy("source")
      .agg(sum("n_chars").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = chars.values.sum
    val steps = TextOps.MixtureSteps
    chars.foreach { case (src, c) =>
      val emitted = rows.filter(_._2 == src).sortBy(_._1)
      // full-horizon quota is exact
      assert(emitted.length.toLong == steps * c / total, s"$src quota")
      // every emission carries its running count, and pacing error < 1
      emitted.zipWithIndex.foreach { case ((st, _, seq), i) =>
        assert(seq == i + 1L, s"$src emit_seq gap at step $st")
        assert(seq == (st + 1) * c / total, s"$src pacing at step $st")
      }
    }
    assert(rows.map(_._3).nonEmpty && rows.length.toLong <= steps + chars.size)
  }

  test("d80 crawl churn: multiset diff replayed; only mod-7 docs change") {
    val got = TextOps.d80CrawlChurn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def cnt(toks: Seq[String]) = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val per = docs.map { case (id, src, text) =>
      val a = text.split(" ").filter(_.nonEmpty).toSeq
      val b = if (id % 7 == 0) a.drop(1) :+ s"rev$id" else a
      val (ca, cb) = (cnt(a), cnt(b))
      val keys = ca.keySet ++ cb.keySet
      val added = keys.toSeq.map(k => math.max(0L, cb.getOrElse(k, 0L) - ca.getOrElse(k, 0L))).sum
      val removed = keys.toSeq.map(k => math.max(0L, ca.getOrElse(k, 0L) - cb.getOrElse(k, 0L))).sum
      (src, id, added, removed, a.length.toLong)
    }
    per.groupBy(_._1).foreach { case (src, ds) =>
      val (nCh, tAdd, tRem, tA, churnBp) = got(src)
      assert(nCh == ds.count(d => d._3 + d._4 > 0).toLong, s"$src changed docs")
      assert(nCh > 0, s"$src has no changed docs - modulus degenerated against the id stride")
      assert(tAdd == ds.map(_._3).sum && tRem == ds.map(_._4).sum && tA == ds.map(_._5).sum)
      assert(churnBp == (tAdd + tRem) * 10000 / tA)
      // unchanged docs (id % 7 != 0) contribute zero churn
      ds.filter(_._2 % 7 != 0).foreach(d => assert(d._3 == 0 && d._4 == 0))
    }
  }

  test("a34 PIT lookup: interval containment replayed against the SCD2 frame") {
    val got = Etl.a34PitLookup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1).getTime, r.getInt(2), r.getString(3),
        r.getTimestamp(4).getTime)).toMap
    val scd = Etl.a24Scd2Build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3).getTime,
        if (r.isNullAt(4)) Long.MaxValue else r.getTimestamp(4).getTime))
    val span = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(min("ts").as("mn"), max("ts").as("mx")).collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)).toMap
    assert(got.keySet == span.keySet)
    got.foreach { case (u, (probeMs, ver, state, fromMs)) =>
      val (mn, mx) = span(u)
      // midpoint probe at millisecond grain (micros midpoint truncates)
      assert(math.abs(probeMs - (mn + mx) / 2) <= 1, s"user $u probe not at midpoint")
      val hits = scd.filter(v => v._1 == u && probeMs >= v._4 && probeMs < v._5)
      assert(hits.length == 1, s"user $u: ${hits.length} containing intervals")
      assert((hits.head._2, hits.head._3, hits.head._4) == ((ver, state, fromMs)))
    }
  }

  test("q52 CUBE: every margin is the exact sum of its cells") {
    val rows = Analytics.q52Cube(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val cells = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    def total(sel: ((String, String, Long, Double)) => Boolean): (Long, Double) = {
      val s = cells.filter(sel)
      (s.map(_._3).sum, s.map(_._4).sum)
    }
    rows.filter(r => r._1 == "ALL" || r._2 == "ALL").foreach {
      case ("ALL", "ALL", n, rev) =>
        val (wn, wrev) = total(_ => true)
        assert(n == wn && math.abs(rev - wrev) < 1e-6 * math.abs(wrev))
      case ("ALL", ls, n, rev) =>
        val (wn, wrev) = total(_._2 == ls)
        assert(n == wn && math.abs(rev - wrev) < 1e-6 * math.abs(wrev))
      case (rf, "ALL", n, rev) =>
        val (wn, wrev) = total(_._1 == rf)
        assert(n == wn && math.abs(rev - wrev) < 1e-6 * math.abs(wrev))
      case _ => ()
    }
    assert(rows.exists(r => r._1 == "ALL" && r._2 == "ALL"))
    assert(cells.map(_._3).sum == Tables.lineitem(spark, sfDir).count())
  }

  test("c29 time-to-convert: hourly profile replayed from c22's per-click rows") {
    val got = Events.c29TimeToConvert(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    val clicks = Events.c22AsofForward(spark, sfDir)
      .select("ts", "ttc_sec").collect()
      .map(r => (r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC).getHour.toLong,
        if (r.isNullAt(1)) None else Some(r.getLong(1) / 60)))
    clicks.groupBy(_._1).foreach { case (h, rows) =>
      val (nClicks, nConv, convBp, p50, p90) = got(h)
      val mins = rows.flatMap(_._2).sorted
      assert(nClicks == rows.length.toLong && nConv == mins.length.toLong)
      assert(convBp == nConv * 10000 / nClicks)
      def q(mult: Long, den: Long): Long = {
        val cum = mins.groupBy(identity).toSeq.sortBy(_._1)
          .scanLeft((0L, 0L)) { case ((_, c), (m, xs)) => (m, c + xs.length) }.drop(1)
        cum.collectFirst { case (m, c) if c * den >= mins.length.toLong * mult => m }.getOrElse(-1L)
      }
      assert(p50 == q(1, 2), s"hour $h p50")
      assert(p90 == q(9, 10), s"hour $h p90")
    }
  }

  test("e14 resolution ladder: per-image pyramid replayed; geometric bound holds") {
    val got = MultimodalOps.e14ResolutionLadder(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val meta = MultimodalOps.e1MultimodalMeta(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .select("source", "width", "height").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getInt(2).toLong))
    meta.groupBy(_._1).foreach { case (src, imgs) =>
      val levels = imgs.flatMap { case (_, w, h) =>
        (0 to 6).map(i => (i.toLong, w >> i, h >> i))
          .filter { case (_, lw, lh) => math.min(lw, lh) >= MultimodalOps.PyramidMinSide }
      }
      val orig = levels.filter(_._1 == 0).map { case (_, w, h) => w * h * 3 }.sum
      val pyr = levels.filter(_._1 > 0).map { case (_, w, h) => w * h * 3 }.sum
      val (nImg, nLvl, maxLvl, oB, pB, bp) = got(src)
      assert(nImg == imgs.length.toLong && nLvl == levels.length.toLong)
      assert(maxLvl == levels.map(_._1).max && oB == orig && pB == pyr)
      assert(bp == pyr * 10000 / orig)
      // halving every level bounds the pyramid below the 1/3 geometric sum
      assert(bp < 3334, s"$src: pyramid share $bp bp breaks the geometric bound")
    }
  }

  test("d77 IVF balance: populations conserve the corpus; flags consistent") {
    val rows = VectorOps.d77IvfBalance(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum == nVecs, "list populations must partition the corpus")
    assert(rows.map(_._1).distinct.length == rows.length)
    val total = nVecs
    val nLists = rows.length.toLong
    rows.foreach { case (cid, n, shareBp, hot) =>
      assert(shareBp == n * 10000 / total)
      assert(hot == (n * nLists > 2 * total), s"cid $cid flag inconsistent")
    }
    val bpSum = rows.map(_._3).sum
    assert(bpSum <= 10000 && bpSum >= 10000 - nLists)
  }

  /** Local replica of the per-customer spend-in-cents frame keyed by
    * nation (shared by the q53/q54 replays). */
  private def spendByNation(): Map[String, Seq[(Long, Long)]] = {
    val cents = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => r.getLong(0) ->
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val nation = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cents.toSeq.flatMap { case (ck, c) => nation.get(ck).map(n => (n, (ck, c))) }
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2) }
  }

  test("d87 quality cutoffs: discrete p30 crossing replayed; keep >= 70%") {
    val got = TextOps.d87QualityCutoffs(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val stops = Set("the", "a", "of", "and", "to", "in")
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getString(0), toks.count(stops) * 10000L / math.max(1, toks.length))
      }
    assert(got.keySet == docs.map(_._1).toSet)
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val vals = ds.map(_._2).sorted
      val total = vals.length.toLong
      // discrete p30: smallest density whose cumulative count crosses 30%
      val idx = vals.indices.find(i => (i + 1) * 10L >= total * 3).get
      val cutoff = vals(idx)
      val kept = vals.count(_ >= cutoff).toLong
      val want = (cutoff, total, kept, kept * 10000 / total)
      assert(got(src) == want, s"$src: ${got(src)} != $want")
      assert(kept * 10 >= total * 7 - 10, s"$src keeps <70% minus tie slack")
    }
  }

  test("c37 seasonal anomaly: leave-one-out same-dow rule replayed") {
    val got = Events.c37SeasonalAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val byDay = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, vs) => k -> BigInt(vs.length) }
    val flagged = byDay.keys.groupBy { case (t, d) => (t, (d + 4) % 7) }
      .flatMap { case ((t, dow), ks) =>
        ks.flatMap { case (_, d) =>
          val cnt = byDay((t, d))
          // ks is a Set — go through Seq BEFORE mapping to counts, or
          // equal peer counts collapse and deflate the moments
          val peers = ks.toSeq.filter(_._2 != d).map(k => byDay(k))
          val k1 = BigInt(peers.length); val s1 = peers.sum
          val ssq1 = peers.map(x => x * x).sum
          val dev = cnt * k1 - s1
          if (k1 >= 2 && dev * dev > 4 * (k1 * ssq1 - s1 * s1))
            Some((t, d) -> (dow, cnt.toLong, k1.toLong, s1.toLong))
          else None
        }
      }
    assert(got == flagged, s"got ${got.keySet} want ${flagged.keySet}")
  }

  test("q57 cardinality audit: estimate formula and truth replayed") {
    val got = Analytics.q57CardinalityAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val orders = Tables.orders(spark, sfDir).select("o_custkey").collect().map(_.getLong(0))
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nA = orders.length.toLong; val ndvA = orders.distinct.length.toLong
    val segOf = cust.toMap
    assert(got.keySet == cust.map(_._2).toSet)
    cust.groupBy(_._2).foreach { case (seg, cs) =>
      val nB = cs.length.toLong
      val est = nA * nB / math.max(ndvA, nB)
      val actual = orders.count(k => segOf.get(k).contains(seg)).toLong
      val err = math.abs(est - actual) * 10000 / math.max(1, actual)
      assert(got(seg) == ((nB, est, actual, err)), s"$seg: ${got(seg)}")
    }
  }

  test("d86 substring scan: replace-length occurrence counts replayed") {
    val got = TextOps.d86SubstringScan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def occ(text: String, p: String): Long = {
      var n = 0L; var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + p.length) }
      n
    }
    val want = (for {
      p <- TextOps.ScanPhrases
      (src, ds) <- docs.groupBy(_._1)
    } yield {
      val os = ds.map(d => occ(d._2, p))
      (src, p) -> (os.count(_ > 0).toLong, os.sum)
    }).toMap
    assert(got == want)
    // phrases must actually occur somewhere for the probe to be exercised
    assert(got.values.map(_._2).sum > 0)
  }

  test("a37 erasure plan: partition verdicts replayed from raw orders") {
    val got = Etl.a37ErasurePlan(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6), r.getLong(7))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"), col("o_custkey"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    assert(got.keySet == rows.map(_._1).toSet)
    rows.groupBy(_._1).foreach { case (p, os) =>
      val hits = os.map(_._2).filter(_ % Etl.ErasureMod == 0)
      val n = os.length.toLong
      val bp = hits.length.toLong * 10000 / n
      val decision =
        if (hits.isEmpty) "keep"
        else if (bp < Etl.DvMaxBp) "dv"
        else "rewrite"
      val cost = decision match {
        case "keep" => 0L
        case "dv" => hits.length.toLong * Etl.DvEntryBytes
        case _ => (n - hits.length) * 100L
      }
      val want = (n, hits.length.toLong, hits.distinct.length.toLong, bp, decision, cost)
      assert(got(p) == want, s"$p: ${got(p)} != $want")
    }
    // sf0.001 months are tiny (one hit already exceeds DvMaxBp), so
    // exercise all three tiers on planted orders: a month with no
    // hits (keep), one with 1 hit in 200 rows = 50bp (dv), one with
    // 5 hits in 50 rows = 1000bp (rewrite)
    import spark.implicits._
    val m = Etl.ErasureMod
    val clean = (i: Long) => i * 2 * m + 1 // ≡ 1 (mod ErasureMod): never a hit
    val planted =
      ((1L to 30L).map(i => (clean(i), "1995-01-15")) ++
        (1L to 200L).map(i => (if (i == 1) m.toLong else clean(i), "1995-02-15")) ++
        (1L to 50L).map(i => (if (i <= 5) i * m else clean(i), "1995-03-15")))
        .toDF("o_custkey", "d")
        .select(col("o_custkey"), col("d").cast("date").as("o_orderdate"))
    val tiers = Etl.a37ErasurePlanOf(planted).collect()
      .map(r => r.getInt(1) -> ((r.getString(6), r.getLong(7)))).toMap
    assert(tiers == Map(
      1 -> (("keep", 0L)),
      2 -> (("dv", 1L * Etl.DvEntryBytes)),
      3 -> (("rewrite", 45L * 100L))), s"tiers: $tiers")
  }

  test("e16 shard sync: full-outer checksum diff replayed locally") {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    def manifest(drop: Boolean): Map[(String, Long), (String, Long)] = {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .filter(d => !drop || d._1 % MultimodalOps.SyncDropMod != 0)
      docs.groupBy(_._2).flatMap { case (src, ds) =>
        var off = 0L
        ds.sortBy(_._1).map { case (_, _, text) =>
          val bytes = text.getBytes("UTF-8")
          val shard = off / MultimodalOps.ShardBytes
          off += bytes.length
          (shard, md5hex(bytes), bytes.length.toLong)
        }.groupBy(_._1).map { case (shard, blobs) =>
          (src, shard) -> (md5hex(blobs.map(_._2).mkString.getBytes("UTF-8")),
            blobs.map(_._3).sum)
        }
      }
    }
    val a = manifest(drop = false); val b = manifest(drop = true)
    val want = (a.keySet ++ b.keySet).map { k =>
      val status = (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some((ha, _)), Some((hb, _))) => if (ha == hb) "same" else "changed"
      }
      k -> ((status, b.get(k).map(_._2).getOrElse(0L)))
    }.toMap
    val got = MultimodalOps.e16ShardSyncPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got == want)
    // the planted deletion must force at least one re-ship
    assert(got.values.exists(_._1 == "changed"))
  }

  test("d85 bm25: integer-scaled Okapi scores replayed; ranking sane") {
    val got = TextOps.d85Bm25Topk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val tTotal = BigInt(docs.map(_._2.length.toLong).sum)
    val dTotal = BigInt(docs.length)
    val q = TextOps.Bm25Query
    val df = q.map(t => t -> BigInt(docs.count(_._2.contains(t)))).toMap
    val scores = docs.map { case (id, toks) =>
      val dl = BigInt(toks.length)
      val terms = q.filter(t => toks.contains(t))
      val s = terms.map { t =>
        val tf = BigInt(toks.count(_ == t))
        ((dTotal * 10000 / df(t)) * tf * 22 * tTotal) /
          (10 * tTotal * tf + 3 * tTotal + 9 * dl * dTotal)
      }.sum
      (id, s.toLong, terms.length.toLong)
    }.filter(_._3 > 0)
    val want = scores.sortBy { case (id, s, _) => (-s, id) }.take(TextOps.Bm25TopK).toSeq
    assert(got.toSeq == want)
    // top-k is genuinely ranked and hits at least one multi-term doc
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
    assert(got.exists(_._3 >= 2))
  }

  test("c36 decay attribution: day-grain 2^-age credit replayed locally") {
    val got = Events.c36DecayAttribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val byDay = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val touches = byDay.collect { case ((u, d, t), c) if t != "purchase" => (u, d, t) -> c }.toMap
    val purchases = byDay.collect { case ((u, d, "purchase"), c) => (u, d) -> c }
    val cells = for {
      ((u, pd), np) <- purchases.toSeq
      age <- 0 until Events.DecayDays
      ((tu, td, t), cnt) <- touches if tu == u && td == pd - age
    } yield t -> BigInt(np) * cnt * (Events.DecayPpm >> age)
    val want = cells.groupBy(_._1).map { case (t, cs) => t -> (cs.map(_._2).sum, cs.length.toLong) }
    val total = want.values.map(_._1).sum
    assert(got.keySet == want.keySet)
    want.foreach { case (t, (credit, n)) =>
      val (gc, gshare, gn) = got(t)
      assert(BigInt(gc) == credit && gn == n, s"$t: ($gc,$gn) != ($credit,$n)")
      assert(gshare == (credit * 10000 / total).toLong)
    }
    assert(got.values.map(_._2).sum <= 10000)
  }

  test("q56 equi-depth histogram: buckets partition rows, depths balanced") {
    val got = Analytics.q56EquidepthHist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val cents = Tables.orders(spark, sfDir).select("o_totalprice").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
    val total = cents.length.toLong
    val byVal = cents.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    var cum = 0L
    val assign = byVal.map { case (v, c) => cum += c; (v, c, (cum - 1) * Analytics.HistBuckets / total + 1) }
    val want = assign.groupBy(_._3).map { case (b, vs) =>
      b -> (vs.map(_._1).min, vs.map(_._1).max, vs.length.toLong,
        vs.map(_._2).sum, vs.map(_._2).sum * 10000 / total)
    }
    assert(got == want)
    // buckets tile the value axis in order and partition all rows
    assert(got.values.map(_._4).sum == total)
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, hi1, _, _, _), (lo2, _, _, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // equi-depth sanity: every bucket within 3x of the ideal share
    got.values.foreach { case (_, _, _, _, bp) => assert(bp <= 30000 / Analytics.HistBuckets) }
  }

  test("d84 dict coding: per-source costs replayed with a local top-256") {
    val got = TextOps.d84DictCode(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val toks = Tables.documents(spark, sfDir).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(r.getString(0) -> _))
    val top = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(TextOps.DictSize).map(_._1).toSet
    assert(got.keySet == toks.map(_._1).toSet)
    toks.groupBy(_._1).foreach { case (src, ts) =>
      val raw = ts.map(_._2.length.toLong + 1).sum
      val coded = ts.map(t => if (top(t._2)) 1L else t._2.length.toLong + 1).sum
      val want = (ts.length.toLong, raw, coded, (raw - coded) * 10000 / raw)
      assert(got(src) == want, s"$src: ${got(src)} != $want")
      assert(coded <= raw)
    }
    // the dictionary must be saving something for the estimate to mean anything
    assert(got.values.forall(v => v._4 > 0))
  }

  test("d83 blocklist gate: per-source verdicts replayed from raw tokens") {
    val got = TextOps.d83BlocklistGate(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val hard = TextOps.HardTerms.toSet; val soft = TextOps.SoftTerms.toSet
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getString(0), toks.count(hard), toks.count(soft))
      }
    assert(got.keySet == docs.map(_._1).toSet)
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val dh = ds.count(_._2 >= 1)
      val dsoft = ds.count(d => d._2 == 0 && d._3 >= TextOps.SoftHitCap)
      val kept = ds.length - dh - dsoft
      val want = (ds.length.toLong, dh.toLong, dsoft.toLong, kept.toLong,
        kept.toLong * 10000 / ds.length,
        ds.map(_._2.toLong).sum, ds.map(_._3.toLong).sum)
      assert(got(src) == want, s"$src: ${got(src)} != $want")
    }
    // both tiers must actually fire on the corpus for the gate to be exercised
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._3).sum > 0)
  }

  test("a36 incremental agg: merged base+delta state == full recompute") {
    val got = Etl.a36IncrementalAgg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val cutoff = rows.map(_._2).max - 30
    assert(got.keySet == rows.map(_._1).toSet)
    rows.groupBy(_._1).foreach { case (ck, os) =>
      val (b, d) = os.partition(_._2 < cutoff)
      val src = if (b.isEmpty) "delta_only" else if (d.isEmpty) "base_only" else "both"
      val want = (src, os.length.toLong, os.map(_._3).sum,
        os.map(_._2).min, os.map(_._2).max)
      assert(got(ck) == want, s"cust $ck: ${got(ck)} != $want")
    }
    // the delta side must be non-trivial for the merge to be exercised
    assert(got.values.exists(_._1 != "base_only"))
    assert(got.values.exists(_._1 == "both"))
  }

  test("e15 frame-sample plan == the StrideSampler's executed schedule") {
    val plan = MultimodalOps.e15FrameSamplePlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val blobs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val executed = MultimodalOps.sampleFrames(spark, blobs).collect()
      .map(f => (f.doc_id, f.frame_idx.toLong, f.offset.toLong)).toSet
    assert(plan == executed, "schedule and sampler disagree")
    // spans: full stride except a shorter final frame on short blobs
    MultimodalOps.e15FrameSamplePlan(spark, sfDir).collect().foreach { r =>
      val (nb, idx, off, span) = (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(span == math.min(256L, nb - off) && span > 0, s"row $r")
      assert(off == idx * 256)
    }
  }

  /** Local winnow replay shared by the d81/d82 specs: doc → selected
    * fingerprint set via the same md5/min-window rule. */
  private def localWinnow(): Map[Long, (Int, Set[String])] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        if (toks.length < 3) None
        else {
          val grams = toks.sliding(3).map(g => md5hex(g.mkString(" "))).toVector
          val w = DedupOps.WinnowW
          val nWin = math.max(1, grams.length - w + 1)
          val sel = (0 until nWin).map(i => grams.slice(i, i + w).min).toSet
          Some(r.getLong(0) -> (grams.length, sel))
        }
      }.toMap
  }

  test("d81 winnowing: selection replayed brute-force; guarantee density") {
    val got = DedupOps.d81Winnowing(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    val local = localWinnow()
    assert(got.keySet == local.keySet)
    local.foreach { case (id, (nGrams, sel)) =>
      val nWin = math.max(1, nGrams - DedupOps.WinnowW + 1)
      val want = (nGrams.toLong, sel.size.toLong,
        sel.size.toLong * 10000 / nWin, sel.min)
      assert(got(id) == want, s"doc $id: ${got(id)} != $want")
      // winnowing picks at least one per window run and at most all starts
      assert(sel.size.toLong <= nWin && sel.nonEmpty)
    }
  }

  test("d82 winnow match: pairs replayed from local fingerprint sets") {
    val got = DedupOps.d82WinnowMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val local = localWinnow()
    val df = local.toSeq.flatMap { case (id, (_, sel)) => sel.map(_ -> id) }
      .groupBy(_._1).map { case (h, vs) => h -> vs.map(_._2).toSet }
    val keep = df.filter { case (_, ds) =>
      ds.size >= 2 && ds.size <= DedupOps.WinnowDfCap }
    val want = keep.toSeq.flatMap { case (h, ds) =>
      ds.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) -> h } }
      .groupBy(_._1).map { case (p, hs) => p -> hs.length.toLong }
      .filter(_._2 >= DedupOps.WinnowMinShared)
    assert(got.keySet == want.keySet)
    want.foreach { case ((a, b), n) =>
      val overlap = n * 10000 / math.min(local(a)._2.size, local(b)._2.size)
      assert(got((a, b)) == ((n, overlap)), s"($a,$b)")
    }
  }

  test("c33 gap fill: dense spine, zeros on gaps, ffill carries last observed") {
    val got = Events.c33GapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val byDay = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val spans = byDay.keys.groupBy(_._1).map { case (t, ks) =>
      t -> (ks.map(_._2).min, ks.map(_._2).max) }
    // exactly one row per (type, day) across each type's observed span
    assert(got.map(_._1).toSet ==
      spans.toSeq.flatMap { case (t, (lo, hi)) => (lo to hi).map(t -> _) }.toSet)
    var lastObs = Map.empty[String, Long]
    got.sortBy(r => (r._1._1, r._1._2)).foreach { case ((t, d), (n, gap, filled)) =>
      val want = byDay.getOrElse((t, d), 0L)
      assert(n == want && gap == (want == 0L), s"($t,$d)")
      if (want != 0L) lastObs += t -> want
      assert(filled == lastObs(t), s"($t,$d): ffill $filled != ${lastObs(t)}")
    }
  }

  test("c34 interval union: merged 30-min intervals replayed brute-force") {
    val got = Events.c34IntervalUnion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
    assert(got.keySet == evs.keySet)
    evs.foreach { case (u, rows) =>
      val len = 1800L * 1000000L
      var blocks = List.empty[(Long, Long)] // (start, end), latest first
      rows.map(_._2).sorted.foreach { t =>
        blocks match {
          case (s, e) :: rest if t <= e => blocks = (s, math.max(e, t + len)) :: rest
          case _ => blocks = (t, t + len) :: blocks
        }
      }
      val want = (blocks.length.toLong,
        blocks.map { case (s, e) => e - s }.sum,
        blocks.map { case (s, e) => e - s }.max)
      assert(got(u) == want, s"user $u: ${got(u)} != $want")
    }
  }

  test("c35 autocorr: Pearson over the zero-filled lag-1 pairs, |r| <= 1") {
    val got = Events.c35DailyAutocorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byDay = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    byDay.keys.groupBy(_._1).foreach { case (t, ks) =>
      val (lo, hi) = (ks.map(_._2).min, ks.map(_._2).max)
      val series = (lo to hi).map(d => byDay.getOrElse((t, d), 0L).toDouble)
      if (series.length < 2) assert(!got.contains(t))
      else {
        val xs = series.dropRight(1); val ys = series.drop(1)
        val n = xs.length.toDouble
        val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
        val den = math.sqrt(n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
          math.sqrt(n * ys.map(y => y * y).sum - ys.sum * ys.sum)
        val (nPairs, r) = got(t)
        assert(nPairs == xs.length.toLong)
        assert(math.abs(r) <= 1.0 + 1e-12)
        assert(math.abs(r - num / den) < 1e-6, s"$t: $r != ${num / den}")
      }
    }
  }

  test("q53 gini: closed-form rank sum matches the brute-force sorted Gini") {
    val got = Analytics.q53Gini(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byNation = spendByNation()
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (nat, custs) =>
      val xs = custs.map(_._2).sorted.map(BigInt(_))
      val n = BigInt(xs.length)
      val s = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val gini = (BigInt(10000) * (2 * s1 - (n + 1) * s)) / (n * s)
      assert(got(nat) == ((xs.length.toLong, gini.toLong)), s"$nat: ${got(nat)}")
      assert(gini >= 0 && gini < 10000)
    }
  }

  test("q54 pareto crossing: first rank with 2*cum >= total, exact share") {
    val got = Analytics.q54ParetoCross(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byNation = spendByNation()
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (nat, custs) =>
      // rank desc by cents, customer key breaks ties ascending
      val sorted = custs.sortBy { case (ck, c) => (-c, ck) }.map(_._2).map(BigInt(_))
      val total = sorted.sum
      var cum = BigInt(0); var k = 0
      while (cum * 2 < total) { cum += sorted(k); k += 1 }
      val share = (BigInt(10000) * cum) / total
      assert(got(nat) == ((k.toLong, share.toLong)), s"$nat: ${got(nat)} != ($k,$share)")
      assert(k <= custs.length && share >= 5000)
    }
  }

  test("q55 chi2: per-cell expected and contribution replayed with BigInt") {
    val got = Analytics.q55Chi2Assoc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val seg = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = Tables.orders(spark, sfDir).select("o_custkey", "o_orderpriority").collect()
      .map(r => (seg(r.getLong(0)), r.getString(1)))
      .groupBy(identity).map { case (k, vs) => k -> BigInt(vs.length) }
    assert(got.keySet == cells.keySet)
    val n = cells.values.sum
    cells.foreach { case ((s, p), o) =>
      val r = cells.collect { case ((`s`, _), v) => v }.sum
      val c = cells.collect { case ((_, `p`), v) => v }.sum
      val dev = o * n - r * c
      val want = (o.toLong, ((r * c * 1000) / n).toLong,
        ((dev * dev * 1000) / (r * c * n)).toLong)
      assert(got((s, p)) == want, s"($s,$p): ${got((s, p))} != $want")
    }
    // margins partition the total
    assert(cells.collect { case ((s, _), v) => v }.sum == n)
  }

  test("q60 benford: digit shares and MAD replay exactly; expectations sum to 1e6") {
    assert(Analytics.BenfordPpm.map(_._2).sum == 1000000L)
    val cents = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 0)
      .select(col("o_totalprice").cast("string")).collect()
      .map(r => (BigDecimal(r.getString(0)).setScale(2) * 100).toLongExact)
    val digits = cents.map(_.toString.head.asDigit)
    val n = digits.length.toLong
    val counts = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val devs = Analytics.BenfordPpm.map { case (d, ppm) =>
      val obs = counts.getOrElse(d, 0L)
      d -> ((obs, obs * 1000000L / n, ppm, (obs * 1000000L / n - ppm).abs))
    }
    val mad = devs.map(_._2._4).sum / 9L
    val verdict =
      if (mad < Analytics.BenfordMadClosePpm) "close"
      else if (mad < Analytics.BenfordMadAcceptablePpm) "acceptable"
      else if (mad < Analytics.BenfordMadMarginalPpm) "marginal"
      else "nonconformity"
    val got = Analytics.q60BenfordAudit(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))))
      .toMap
    val expect = devs.map { case (d, (obs, op, ep, dev)) =>
      d -> ((obs, op, ep, dev, mad, verdict))
    }.toMap
    assert(got == expect, s"q60 $got vs replay $expect")
    // the 9 rows partition the corpus
    assert(got.values.map(_._1).sum == n)
  }

  test("q60 benford: planted fixtures exercise the close and acceptable bands") {
    import spark.implicits._
    def verdictOf(vals: Seq[Double]): (String, Long) = {
      val r = Analytics.q60BenfordAuditOf(vals.toDF("v")).head()
      (r.getString(6), r.getLong(5))
    }
    // log-uniform over 4 decades IS Benford's law — the audit must say
    // close (measured MAD ~823 ppm vs the 6000 close bound)
    val n = 2000
    val logUniform = (0 until n).map(i => math.pow(10.0, i * 4.0 / n))
    val (vClose, madClose) = verdictOf(logUniform)
    assert(vClose == "close" && madClose < Analytics.BenfordMadClosePpm,
      s"log-uniform must conform: $vClose mad=$madClose")
    // blending 10% uniform [1,10) values drags MAD into the acceptable
    // band (~7653 ppm) without reaching marginal
    val k = n / 10
    val blended = logUniform.dropRight(k) ++ (0 until k).map(j => 1.0 + 9.0 * j / k)
    val (vAcc, madAcc) = verdictOf(blended)
    assert(vAcc == "acceptable" &&
      madAcc >= Analytics.BenfordMadClosePpm && madAcc < Analytics.BenfordMadAcceptablePpm,
      s"blend must be acceptable: $vAcc mad=$madAcc")
    // the corpus price column is uniform by construction: nonconformity
    // (the branch the suite already pins via the oracled entry)
    assert(Analytics.q60BenfordAudit(spark, sfDir).head().getString(6) == "nonconformity")
  }

  test("q63 ks: statistic and argmax replay exactly; a planted shift rejects") {
    import spark.implicits._
    def replay(pairs: Seq[(String, Long)]): Map[String, (Long, Long, Long, Long, Boolean)] = {
      val glob = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val gdelays = glob.keys.toSeq.sorted
      val nAll = pairs.size.toLong
      pairs.groupBy(_._1).map { case (grp, rs) =>
        val cnts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val nG = rs.size.toLong
        val grpMax = cnts.keys.max
        var cumG = 0L; var cumAll = 0L
        var bestD = -1L; var bestX = 0L
        gdelays.foreach { x =>
          cumAll += glob(x); cumG += cnts.getOrElse(x, 0L)
          if (x <= grpMax) {
            val d = math.abs(cumG * 1000000L / nG - (cumAll - cumG) * 1000000L / (nAll - nG))
            if (d > bestD) { bestD = d; bestX = x }
          }
        }
        val crit = Analytics.KsAlphaCoefPpm * math.sqrt(
          nAll.toDouble / (nG.toDouble * (nAll - nG).toDouble))
        grp -> ((nG, nAll - nG, bestX, bestD, bestD.toDouble > crit))
      }
    }
    val corpus = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Analytics.q63KsDelay(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6)))).toMap
    assert(got == replay(corpus), s"q63 $got vs ${replay(corpus)}")
    // D is a ppm-scaled ECDF gap: bracketed in [0, 1e6]
    assert(got.values.forall(v => v._4 >= 0L && v._4 <= 1000000L))
    // planted shift: two groups uniform over [0,100) and [50,150) —
    // D = 0.5 exactly, first attained at delay 49, far past critical
    val planted = (0 until 1000).map(i => ("a", (i % 100).toLong)) ++
      (0 until 1000).map(i => ("b", (50 + i % 100).toLong))
    val gotP = Analytics.q63KsDelayOf(planted.toDF("grp", "delay_days")).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getBoolean(6)))).toMap
    assert(gotP == Map("a" -> ((49L, 500000L, true)), "b" -> ((49L, 500000L, true))),
      s"planted $gotP")
  }

  test("q62 hhi: concentration replays from a local share fold; bounds hold") {
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_suppkey"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (brand, rs) =>
      val perSupp = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).values.toSeq
      val total = perSupp.sum
      val shares = perSupp.map(q => q * 10000L / total)
      val hhi = shares.map(s => s * s).sum
      val cls = if (hhi < Analytics.HhiUnconcentratedBp2) "unconcentrated"
                else if (hhi < Analytics.HhiModerateBp2) "moderate" else "high"
      brand -> ((perSupp.size.toLong, total, hhi, shares.max, cls))
    }
    val got = Analytics.q62HhiConcentration(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got == expect, s"q62 $got vs replay $expect")
    // HHI bounds: between the perfectly-even floor 10000^2/n (up to
    // bp truncation) and the monopoly ceiling 10000^2
    got.values.foreach { case (n, _, hhi, top, _) =>
      assert(hhi <= 100000000L && top <= 10000L)
      assert(hhi >= (10000L / n) * (10000L / n) * n - 10000L * n,
        s"HHI $hhi below even-split floor for n=$n")
    }
  }

  test("c41 ewma: dyadic baseline and spike flags replay exactly after burn-in") {
    val byDay = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val expect = byDay.keys.groupBy(_._1).toSeq.flatMap { case (t, ks) =>
      val lo = ks.map(_._2).min
      val hi = ks.map(_._2).max
      val cnt = (lo to hi).map(d => d -> byDay.getOrElse((t, d), 0L)).toMap
      (lo + Events.EwmaDays to hi).map { d =>
        val num = (1 to Events.EwmaDays)
          .map(k => cnt(d - k) * (1L << (Events.EwmaDays - k))).sum
        val spike = cnt(d) * 255L > Events.EwmaSpikeFactor * num &&
          cnt(d) >= Events.EwmaMinCount
        (t, d) -> ((cnt(d), num * 1000L / 255L, spike))
      }
    }.toMap
    val got = Events.c41EwmaControl(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expect, s"c41 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
  }

  test("c42 kaplan-meier: session life table and ppm survival fold replay exactly") {
    val gapUs = Events.SessionGapSec * 1000000L
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val endT = evs.map(_._2).max
    // independent sessionization per user
    val durations = evs.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ts = rows.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List((ts.head, ts.head))) {
        case ((s, e) :: rest, t) if t - e <= gapUs => (s, t) :: rest
        case (acc, t) => (t, t) :: acc
      }
      sessions.map { case (s, e) =>
        (math.min((e - s) / 60000000L, Events.KmMaxDurationMin), e + gapUs <= endT)
      }
    }
    val tbl = durations.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ds) =>
      (t, ds.count(_._2).toLong, ds.count(!_._2).toLong)
    }
    var atRisk = durations.size.toLong
    var surv = 1000000L
    val expect = tbl.map { case (t, d, c) =>
      val h = d * 1000000L / atRisk
      surv = surv * (1000000L - h) / 1000000L
      val row = t -> ((d, c, atRisk, h, surv))
      atRisk -= d + c
      row
    }.toMap
    val got = Events.c42SurvivalKm(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"c42 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    // survival is non-increasing in t; everyone is at risk at the smallest duration
    val byT = got.toSeq.sortBy(_._1).map(_._2)
    assert(byT.map(_._5) == byT.map(_._5).sorted.reverse)
    assert(byT.head._3 == durations.size.toLong)
  }

  test("a41 dp plan: Laplace pricing replays exactly; utility monotone in epsilon") {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal").cast("string"))
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        (BigDecimal(r.getString(2)).setScale(2) * 100).toLongExact))
    val classes = rows.groupBy { case (n, s, cents) =>
      (n, s, (cents + 100000L) / 100000L)
    }.view.mapValues(_.size.toLong).values.toSeq
    val nRows = classes.sum
    val expect = Etl.DpEpsilonsPpm.map { eps =>
      val b = 1000000000000L / eps
      val swamped = classes.filter(sz => b > sz * Etl.DpSwampRelErrPpm)
      eps -> ((classes.size.toLong, b, b * Etl.DpQ95LnPpm / 1000000L,
        swamped.size.toLong, swamped.sum, swamped.sum * 10000L / nRows,
        b / classes.min))
    }.toMap
    val got = Etl.a41DpReleasePlan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expect, s"a41 $got vs replay $expect")
    // more budget -> less noise, fewer swamped classes
    val byEps = Etl.DpEpsilonsPpm.map(got(_))
    assert(byEps.map(_._2) == byEps.map(_._2).sorted.reverse)
    assert(byEps.map(_._4) == byEps.map(_._4).sorted.reverse)
  }

  test("d90 good-turing: per-source singleton mass replays exactly") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
      val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
      val n = tf.sum
      val v = tf.size.toLong
      val n1 = tf.count(_ == 1L).toLong
      src -> ((n, v, n1, n1 * 1000000L / n, 1000000L - n1 * 1000000L / n,
        n1 * 10000L / v))
    }
    val got = CorpusOps.d90MissingMass(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"d90 $got vs replay $expect")
    // missing mass and coverage partition ppm space up to div truncation
    got.values.foreach { case (_, _, _, mm, cov, _) => assert(mm + cov == 1000000L) }
  }

  /** Independent CDC replay: gear candidates + FastCDC min/max clamp
    * fold + chunk texts, mirroring d91's greedy cut semantics. */
  private def cdcChunks(s: String): Seq[String] = {
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val mn = CorpusOps.CdcMinChunk.toInt
    val mx = CorpusOps.CdcMaxChunk.toInt
    val cand = (math.min(4, s.length) to s.length).filter(i =>
      i == s.length || (i >= 4 && md5hex(s.substring(i - 4, i)).substring(0, 2) < "04"))
    var cuts = Vector(0)
    cand.foreach { c =>
      val last = cuts.last
      val f = if (c - last <= mx) 0 else (c - last - 1) / mx
      (1 to f).foreach(k => cuts :+= last + k * mx)
      if (c - (last + f * mx) >= mn) cuts :+= c
    }
    val body = cuts.drop(1)
    val ends = if (body.nonEmpty && body.last == s.length) body else body :+ s.length
    val starts = 0 +: ends.dropRight(1)
    starts.zip(ends).map { case (p, e) => s.substring(p, e) }
  }

  test("d91 cdc: per-source chunk stats replay exactly; edits only redraw local chunks") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).filter(_._2.nonEmpty)
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.flatMap(d => cdcChunks(d._2))
      val n = chunks.size.toLong
      val u = chunks.distinct.size.toLong
      src -> ((n, u, (n - u) * 10000L / n, chunks.map(_.length.toLong).sum * 1000L / n))
    }
    val got = CorpusOps.d91CdcChunks(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"d91 $got vs replay $expect")
    // clamps hold on every chunk: none above max, none below min except
    // each doc's min-exempt final remainder chunk
    docs.foreach { case (_, t) =>
      val cs = cdcChunks(t)
      assert(cs.forall(_.length <= CorpusOps.CdcMaxChunk),
        s"chunk above max clamp in doc of len ${t.length}")
      assert(cs.dropRight(1).forall(_.length >= CorpusOps.CdcMinChunk),
        s"non-final chunk below min clamp in doc of len ${t.length}")
      assert(cs.map(_.length.toLong).sum == t.length.toLong)
    }
    // the CDC property fixed chunking lacks: a front insertion redraws
    // only a local prefix of chunks — the chains re-sync at a gear
    // boundary and the whole remaining suffix survives verbatim
    val sample = docs.map(_._2).maxBy(_.length)
    val orig = cdcChunks(sample)
    val edited = cdcChunks("inserted preamble " + sample)
    assert(orig.size > 2, "sample doc must chunk")
    val survived = orig.reverse.zip(edited.reverse).takeWhile(p => p._1 == p._2).length
    assert(survived >= orig.size / 2,
      s"only $survived of ${orig.size} trailing chunks survived a front insertion")
  }

  test("d91 cdc: the per-char gear pass has no interpreted lambda before the doc reduce") {
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val opt = CorpusOps.d91CdcChunks(spark, sfDir).queryExecution.optimizedPlan
    // locate the doc_id reduce: the Aggregate whose subtree holds the
    // position-spine Generate (the per-char hot path)
    val docReduce = opt.collect {
      case a: Aggregate if a.child.collect { case g: Generate => g }.nonEmpty => a }
    assert(docReduce.nonEmpty, "doc-reduce Aggregate over the spine Generate must exist")
    val hot = docReduce.minBy(_.collect { case p => p }.size) // innermost
    val spine = hot.child.collect { case g: Generate => g }
    assert(spine.size == 1, s"exactly one spine explode below the doc reduce, got ${spine.size}")
    // the round-9 form evaluated an INTERPRETED ArrayFilter lambda with
    // an md5 per character (77 s at sf0.1); the hot path below the doc
    // reduce must stay codegen'd — no higher-order function anywhere
    val hofs = (hot.child +: hot.child.collect { case p => p }).flatMap(_.expressions)
      .flatMap(_.collect { case h: HigherOrderFunction => h })
    assert(hofs.isEmpty,
      s"no interpreted higher-order function may run on the per-char path: $hofs")
    // the gear test itself must be present as a plain filter predicate
    val gearFilter = hot.child.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("md5") => f }
    assert(gearFilter.nonEmpty, "gear md5 predicate must be a plain Filter above the spine")
  }

  test("q61 ols: slope and r2 replay from BigInt moments; r2 bracketed in [0,1]") {
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    val custNat = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> nat(r.getAs[Number](1).longValue())).toMap
    val byDay = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        col("o_totalprice").cast("string")).collect()
      .map(r => ((custNat(r.getLong(0)), r.getLong(1)),
        (BigDecimal(r.getString(2)).setScale(2) * 100).toLongExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val expect = byDay.groupBy(_._1._1).collect { case (name, ds) if ds.size >= 2 =>
      val lo = ds.map(_._1._2).min
      val pts = ds.map { case ((_, d), y) => (BigInt(d - lo), BigInt(y)) }
      val n = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val syyc = n * syy - sy * sy
      val slope = num.toDouble / den.toDouble
      name -> ((pts.size.toLong, slope, slope * (num.toDouble / syyc.toDouble)))
    }
    val got = Analytics.q61OlsTrend(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expect, s"q61 ${got.toSeq.diff(expect.toSeq)}")
    got.values.foreach { case (_, _, r2) => assert(r2 >= 0.0 && r2 <= 1.0) }
  }

  test("d92 mips: dot top-k replays; norm augmentation preserves the order") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val got = VectorOps.d92MipsTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (0L until VectorOps.NumQueries).foreach { qid =>
      val q = vecs(qid)
      val ranked = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, dotL(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(VectorOps.TopK)
      ranked.zipWithIndex.foreach { case ((id, s), i) =>
        assert(got((qid, i + 1)) == ((id, s)), s"q$qid rank ${i + 1}")
      }
    }
    // Bachrach et al. reduction: with M = max norm, augmenting candidates
    // with sqrt(M^2 - |x|^2) (query with 0) makes cosine order = dot order
    val m2 = vecs.values.map(v => dotL(v, v)).max
    val q = vecs(0L)
    val qn = math.sqrt(dotL(q, q))
    val cands = vecs.toSeq.filter(_._1 != 0L)
    val pairs = for (a <- cands; b <- cands if a._1 < b._1) yield (a, b)
    pairs.foreach { case ((ia, va), (ib, vb)) =>
      val (da, db) = (dotL(q, va), dotL(q, vb))
      // augmented candidate norm is exactly M, so cosAug = dot/(|q|*M)
      def cosAug(v: Array[Float], d: Double): Double = d / (qn * math.sqrt(m2))
      if (da != db)
        assert((da > db) == (cosAug(va, da) > cosAug(vb, db)), s"$ia vs $ib")
    }
  }

  test("c46 downtime: replays real data; threshold boundary exact on planted outages") {
    import spark.implicits._
    // planted frame: minutes 0,1 then a 59-idle gap (NOT an outage),
    // then a 60-idle gap (exactly threshold => outage), then a 120-idle
    // gap; a second type with one active minute (no gaps at all)
    val mins = Seq(0L, 1L, 61L, 122L, 243L).map(m => ("api", m)) :+ (("job", 7L))
    val planted = mins.zipWithIndex.map { case ((t, m), i) =>
      graft.streaming.StreamingOps.EventRow(i.toLong,
        new java.sql.Timestamp(m * 60000L + 30000L), 1L, t, 1.0)
    }.toDF()
    val gotP = Events.c46DowntimeReportOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // api: idles 0, 59, 60, 120 => outages 60+120, span 244
    assert(gotP("api") == ((5L, 244L, 2L, 180L, 120L, (244L - 180L) * 1000000L / 244L)))
    assert(gotP("job") == ((1L, 1L, 0L, 0L, 0L, 1000000L)))
    // real-data replay
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 60000000")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = raw.groupBy(_._1).map { case (t, rs) =>
      val ms = rs.map(_._2).distinct.sorted
      val idles = ms.zip(ms.tail).map { case (a, b) => b - a - 1 }
        .filter(_ >= Events.OutageIdleMin)
      val span = ms.last - ms.head + 1
      val down = idles.sum
      t -> ((ms.size.toLong, span, idles.size.toLong, down,
        if (idles.isEmpty) 0L else idles.max, (span - down) * 1000000L / span))
    }
    val got = Events.c46DowntimeReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"c46 $got vs $expect")
    assert(got.values.exists(_._3 > 0L), "real data must show outages at test SF")
  }

  test("q64 backlog: curve replays brute force; conservation closes at zero") {
    val ends = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(max(expr("unix_date(to_date(l_shipdate))").cast("long")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), expr("unix_date(to_date(o_orderdate))").cast("long"),
        (Cols.dec2(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(o => ends.contains(o._1))
    val deltas = orders.flatMap { case (k, s, c) =>
      Seq((s, 1L, c), (ends(k), -1L, -c)) }
    val lo = deltas.map(_._1).min
    val hi = deltas.map(_._1).max
    var (openN, openC) = (0L, 0L)
    val expect = (lo to hi).map { d =>
      val todays = deltas.filter(_._1 == d)
      openN += todays.map(_._2).sum; openC += todays.map(_._3).sum
      d -> ((todays.count(_._2 > 0).toLong, todays.count(_._2 < 0).toLong, openN, openC))
    }.toMap
    val got = Analytics.q64BacklogProfile(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"q64 sizes ${got.size}/${expect.size}")
    // conservation: every joined order closes, so the curve ends at zero
    assert(got(hi)._3 == 0L && got(hi)._4 == 0L)
    assert(got.values.forall(v => v._3 >= 0L && v._4 >= 0L))
  }

  test("d97 span corruption: closed-form lengths replay; packing identities hold") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val per = ds.map { case (_, n) =>
        val nc = n * TextOps.CorruptNoisePct / 100L
        val ns = (nc + TextOps.CorruptMeanSpan - 1) / TextOps.CorruptMeanSpan
        (n, nc, ns)
      }
      val (tn, tc, ts) = (per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
      src -> ((per.size.toLong, tn, tc, ts,
        per.map { case (n, nc, ns) => n - nc + ns }.sum,
        per.collect { case (n, nc, ns) if n > 0 => nc + ns + 1 }.sum,
        (tc - ts) * 10000L / math.max(1L, tn)))
    }
    val got = TextOps.d97SpanCorruptionPlan(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expect, s"d97 $got vs $expect")
    // seq2seq identity: input + target = raw + 2 sentinels + one EOS
    // per non-empty doc (here all docs are non-empty)
    got.values.foreach { case (docs, n, _, ns, in, tgt, _) =>
      assert(in + tgt == n + 2 * ns + docs) }
  }

  test("d98 vocab coverage: ladder replays; curve is monotone and k99 consistent") {
    val freqs = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val nTokens = freqs.map(_._2).sum
    val nTypes = freqs.size.toLong
    val sorted = freqs.sortBy { case (t, n) => (-n, t) }.take(TextOps.VocabCoverageCap)
    val cums = sorted.scanLeft(0L)(_ + _._2).drop(1)
    val k99 = cums.zipWithIndex.collectFirst {
      case (c, i) if c * 100 >= nTokens * 99 => i + 1 }
    val expect = TextOps.VocabLadder.map { k =>
      val used = math.min(k, sorted.size)
      k -> ((used, cums(used - 1), cums(used - 1) * 1000000L / nTokens, k99,
        nTokens, nTypes))
    }.toMap
    val df = TextOps.d98VocabCoverage(spark, sfDir)
    val got = df.collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getLong(5), r.getLong(6)))).toMap
    // the totals branch must ride the ranked branch's token-reduce
    // exchange (AQE stage reuse, the q59 rule) — one corpus scan runs
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "totals must reuse the token-reduce exchange")
    assert(got == expect, s"d98 $got vs $expect")
    // the curve is monotone in k and never exceeds the corpus mass
    val curve = TextOps.VocabLadder.map(got(_)._3)
    assert(curve == curve.sorted && curve.last <= 1000000L)
  }

  test("BloomAdmission: zero false negatives, FPR inside budget, composed admission exact") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir).select(col("text"))
    val bloom = DedupOps.BloomAdmission.build(corpus, col("text"), 1000L, 16384L)
    assert(bloom.length <= 16384 / 8 + 64, "filter bytes bounded by the bit budget")
    val dups = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(100)
    val fresh = (0 until 400).map(i =>
      (1000000L + i, s"genuinely new admission candidate $i with its own payload"))
      .toDF("doc_id", "text")
    val incoming = dups.union(fresh)
    val flagged = DedupOps.BloomAdmission.prefilter(incoming, bloom, col("text"))
      .select(col("doc_id"), col("maybe_dup")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // Bloom guarantee: every true duplicate must probe true
    val dupIds = dups.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupIds.forall(flagged(_)), "a false negative breaks dedup admission")
    // FPR on the genuinely-new half stays inside the 16-bits/item budget
    val falsePos = flagged.count { case (id, m) => id >= 1000000L && m }
    assert(falsePos <= 20, s"FPR ${falsePos / 400.0} above budget")
    // composed admission (bloom fast path + exact verify on suspects)
    // equals the plain exact anti-join
    val exactNew = incoming.join(corpus, Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val suspects = incoming
      .filter(DedupOps.BloomAdmission.mightContain(bloom, col("text")))
    val composedNew = flagged.collect { case (id, false) => id }.toSet ++
      suspects.join(corpus, Seq("text"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(composedNew == exactNew, "prefilter must not change admission semantics")
  }

  test("d95 label coherence: bucket replay matches; pair-count identities hold") {
    def w64(p: Int): Array[Float] = (0 until 64).map { j =>
      var h = p * 0x9E3779B9 + j * 0x85EBCA6B
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0f else -1.0f
    }.toArray
    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val buckets = vecs.map { case (l, v) =>
      (l, (0 until VectorOps.NumPlanes).map(p => if (dotL(v, w64(p)) >= 0) 1 << p else 0).sum)
    }
    val byBucket = buckets.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nAll = vecs.length.toLong
    val expect = buckets.map(_._1).distinct.sorted.map { l =>
      val samePairs = byBucket.values.map(ls => { val c = ls.count(_ == l).toLong; c * (c - 1) }).sum
      val allPairs = byBucket.values.map(ls => { val c = ls.count(_ == l).toLong; c * (ls.size - 1) }).sum
      val nL = buckets.count(_._1 == l).toLong
      val agree = samePairs * 10000L / math.max(1L, allPairs)
      l -> ((nL, byBucket.values.count(_.contains(l)).toLong, agree,
        nL * 10000L / nAll, agree - nL * 10000L / nAll))
    }.toMap
    val got = VectorOps.d95LabelCoherence(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"d95 $got vs $expect")
    assert(got.values.map(_._1).sum == nAll)
  }

  test("d96 centroid purity: local nearest-centroid replay matches; purity bracketed") {
    def dotL(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dotL(a, b) / (math.sqrt(dotL(a, a)) * math.sqrt(dotL(b, b)))
    val cents = VectorOps.centroidVectors(spark, sfDir)
    val assigned = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val cid = cents.map { case (c, ce) => (cos(v, ce), -c) }.max._2 * -1
        (cid, r.getInt(0))
      }
    val expect = assigned.groupBy(_._1).map { case (cid, rs) =>
      val byLabel = rs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (majL, majN) = byLabel.minBy { case (l, c) => (-c, l) }
      cid -> ((rs.size.toLong, byLabel.size.toLong, majL, majN,
        majN * 10000L / rs.size))
    }
    val got = VectorOps.d96CentroidPurity(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"d96 $got vs $expect")
    // purity is at least the even-mix floor and at most 10000
    got.values.foreach { case (n, nl, _, _, p) =>
      assert(p <= 10000L && p >= 10000L / nl - 1) }
  }

  test("d94 topic mix: per-cid totals reconcile with d77; share identities hold") {
    val rows = VectorOps.d94TopicMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // cross-operator consistency: summing d94's (source, cid) counts
    // over sources must give exactly d77's per-list populations
    // (vec_id ≡ doc_id is total in the corpus)
    val d77 = VectorOps.d77IvfBalance(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perCid = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perCid == d77, s"d94 per-cid $perCid vs d77 $d77")
    // share identities: delta = src_share - corpus_share row-by-row;
    // per-source shares sum to 10000 up to truncation slack
    rows.foreach { case (_, _, _, srcBp, corpBp, delta) =>
      assert(delta == srcBp - corpBp) }
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val tot = rs.map(_._4).sum
      assert(tot <= 10000L && tot > 10000L - rs.size,
        s"$src shares sum $tot outside truncation band") }
  }

  test("d93 mips-lsh: recall vs the exact d92 baseline holds; probe set is sublinear") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.d92MipsTopk(spark, sfDir))
    val approx = pairs(VectorOps.d93MipsLsh(spark, sfDir))
    val recall = (exact & approx).size.toDouble / exact.size
    // the d10-equivalent floor: 4-plane multiprobe LSH on this corpus
    // (measured 0.50 at sf0.01; d10's single-probe floor is 0.1)
    assert(recall > 0.25, s"d93 recall=$recall")
    // independent replay of the augmented signatures: the probe set
    // must be a sublinear slice of the corpus and must contain every
    // returned neighbor (soundness of the bucket join)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val m2 = vecs.map(v => dotL(v._2, v._2)).max
    def w65(p: Int): Array[Float] = (0 until 65).map { j =>
      var h = p * 0x9E3779B9 + j * 0x85EBCA6B
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0f else -1.0f
    }.toArray
    def bucket(v: Array[Float], aug: Float): Int =
      (0 until VectorOps.NumPlanes).map { p =>
        if (dotL(v :+ aug, w65(p)) >= 0) 1 << p else 0
      }.sum
    val cb = vecs.map { case (id, v) =>
      id -> bucket(v, math.sqrt(m2 - dotL(v, v)).toFloat) }.toMap
    assert(cb.values.toSet.size > 8, "plane degeneracy: buckets collapsed")
    val qProbes = (0L until VectorOps.NumQueries).map { qid =>
      val qb = bucket(vecs.find(_._1 == qid).get._2, 0.0f)
      qid -> (0 +: (0 until VectorOps.NumPlanes).map(1 << _)).map(qb ^ _).toSet
    }.toMap
    val fracs = qProbes.map { case (qid, probes) =>
      cb.count { case (id, b) => id != qid && probes(b) }.toDouble / (vecs.length - 1) }
    val mean = fracs.sum / fracs.size
    // expected (P+1)/2^P ≈ 0.31 of the corpus per query
    assert(mean < 0.55, s"probe fraction $mean is not sublinear")
    approx.foreach { case (qid, nb) =>
      assert(qProbes(qid)(cb(nb)), s"neighbor $nb of q$qid outside its probe set") }
  }

  /** Independent c43 replay over (hour, isError) pairs. */
  private def sloReplay(evs: Seq[(Long, Boolean)]): Map[Long, (Long, Long, Long, Long, Long, Boolean)] = {
    val byHour = evs.groupBy(_._1)
    val lo = byHour.keys.min
    val hi = byHour.keys.max
    val dense = (lo to hi).map { h =>
      val rows = byHour.getOrElse(h, Seq.empty)
      (h, rows.size.toLong, rows.count(_._2).toLong)
    }
    dense.zipWithIndex.map { case ((h, n, e), i) =>
      val win = dense.slice(math.max(0, i - Events.SloSlowWindowHours + 1), i + 1)
      val n6 = win.map(_._2).sum
      val e6 = win.map(_._3).sum
      val ppm = if (n == 0) 0L else e * 1000000L / n
      val fast = if (n == 0) 0L else ppm * 1000L / Events.SloBudgetPpm
      val slow = if (n6 == 0) 0L else (e6 * 1000000L / n6) * 1000L / Events.SloBudgetPpm
      h -> ((n, e, ppm, fast, slow,
        fast > Events.SloFastBurnMilli && slow > Events.SloSlowBurnMilli))
    }.toMap
  }

  test("c43 slo burn: hourly burn rates replay exactly on the corpus") {
    val evs = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 3600000000"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "error")).toSeq
    val expect = sloReplay(evs)
    val got = Events.c43SloBurn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got == expect, s"c43 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
  }

  test("c43 slo burn: a planted error storm pages, the steady state does not") {
    import spark.implicits._
    // 10 steady hours at 10% errors, then 3 storm hours at 90% — the
    // fast window crosses immediately, the slow window only once the
    // storm has burned long enough: the multi-window AND in action.
    val rows = (0 until 13).flatMap { h =>
      val errs = if (h >= 10) 90 else 10
      (0 until 100).map { i =>
        (h * 3600000000L + i * 1000000L, if (i < errs) "error" else "view")
      }
    }
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = Events.c43SloBurnOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val expect = sloReplay(rows.map { case (us, t) =>
      (us / 3600000000L, t == "error")
    })
    assert(got == expect.view.mapValues(v => (v._4, v._5, v._6)).toMap)
    assert(!got(9)._3 && !got(10)._3, "steady state and storm onset must not page")
    assert(got(12)._3, "sustained storm must page")
  }

  test("c45 backtest: replay matches; perfect weekly periodicity scores zero error") {
    import spark.implicits._
    def replay(days: Seq[(String, Long)]): Map[String, (Long, Long, Long, Long)] = {
      days.groupBy(_._1).map { case (t, rows) =>
        val byDay = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val lo = byDay.keys.min; val hi = byDay.keys.max
        val dense = (lo to hi).map(d => d -> byDay.getOrElse(d, 0L)).toMap
        val scored = (lo to hi).flatMap { d =>
          val prior = (1 to Events.BacktestWeeks).map(w => d - 7L * w).filter(_ >= lo)
          if (prior.size < Events.BacktestWeeks) None
          else {
            val f = prior.map(dense).sum
            val err = dense(d) * Events.BacktestWeeks - f
            Some((err, err.abs * 10000L / math.max(1L, f), f))
          }
        }
        t -> ((scored.size.toLong, scored.map(_._2).sum / scored.size,
          scored.map(_._1).sum * 10000L / math.max(1L, scored.map(_._3).sum),
          scored.map(_._2).max))
      }
    }
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_date(to_date(ts))")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()))
    val got = Events.c45DowBacktest(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == replay(evs), s"c45 $got vs ${replay(evs)}")
    // a perfectly weekly-periodic planted stream forecasts itself: MAPE,
    // bias, and worst are all exactly zero; a planted +50%/week growth
    // stream shows positive bias (actuals above the trailing mean)
    def mk(daily: Long => Int) = (0 until 42).flatMap { d =>
      (0 until daily(d.toLong)).map(i =>
        (d * 86400000000L + i * 1000000L, "x"))
    }.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val periodic = Events.c45DowBacktestOf(mk(d => 10 + (d % 7).toInt)).head()
    assert((periodic.getLong(2), periodic.getLong(3), periodic.getLong(4)) == ((0L, 0L, 0L)),
      s"periodic stream must self-forecast: $periodic")
    val growing = Events.c45DowBacktestOf(mk(d => (10 * (d / 7 + 1)).toInt)).head()
    assert(growing.getLong(3) > 0L, s"growth must bias positive: $growing")
  }

  /** Independent c44 replay running the TRUE sequential recursion
    * S_t = max(0, S_{t-1} + y_t) — proving the relational prefix-min
    * identity against the textbook form. */
  private def cusumReplay(days: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    val byDay = days.toMap
    val lo = byDay.keys.min; val hi = byDay.keys.max
    val dense = (lo to hi).map(d => d -> byDay.getOrElse(d, 0L))
    if (dense.size <= Events.CusumBaselineDays) Map.empty
    else {
      val target = dense.take(Events.CusumBaselineDays).map(_._2).sum / Events.CusumBaselineDays
      val slack = math.max(1L, target / Events.CusumSlackDenom)
      var s = 0L
      dense.drop(Events.CusumBaselineDays).map { case (d, cnt) =>
        s = math.max(0L, s + cnt - target - slack)
        d -> ((cnt, target, slack, s, s > slack * Events.CusumHFactor))
      }.toMap
    }
  }

  test("c44 cusum: relational prefix-min form equals the sequential recursion on the corpus") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_date(to_date(ts))")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()))
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val days = rows.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }.toSeq
      cusumReplay(days).map { case (d, v) => (t, d) -> v }
    }.toMap
    val got = Events.c44CusumShift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got == expect, s"c44 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    // CUSUM invariant: the statistic is never negative
    assert(got.values.forall(_._4 >= 0L))
  }

  test("c44 cusum: a planted sustained shift alarms, a one-day spike resets") {
    import spark.implicits._
    // baseline 20/day (target 20, slack 5, h 40); a single 60-event
    // spike at day 8 lifts S to 35 < h (no alarm) and seven quiet days
    // drain it 5/day back to 0; a sustained 40/day shift from day 16
    // accumulates 15/day and alarms on its third day (45 > 40)
    def burst(day: Int, n: Int) = (0 until n).map(i => (day.toLong * 86400000000L + i * 1000000L, "view"))
    val rows = (0 until 16).flatMap(d => burst(d, if (d == 8) 60 else 20)) ++
      (16 until 22).flatMap(d => burst(d, 40))
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = Events.c44CusumShiftOf(df).collect()
      .map(r => r.getAs[Number](1).longValue() -> ((r.getLong(5), r.getBoolean(6)))).toMap
    val expect = cusumReplay(rows.map(_._1 / 86400000000L -> 1L)
      .groupBy(_._1).view.mapValues(_.size.toLong).toSeq)
    assert(got == expect.view.mapValues(v => (v._4, v._5)).toMap)
    assert(got(8) == ((35L, false)), "one-day spike accumulates but must not alarm")
    assert(got(15) == ((0L, false)), "quiet days after the spike drain S to zero")
    assert(!got(17)._2 && got(18)._2, "the sustained shift alarms on its third day")
  }

  /** Interpolating median matching Spark `percentile(x, 0.5)` /
    * DuckDB `quantile_cont(x, 0.5)`. */
  private def medianCont(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val h = (s.size - 1) * 0.5
    val lo = h.toInt
    if (lo + 1 < s.size) s(lo) + (h - lo) * (s(lo + 1) - s(lo)) else s(lo)
  }

  /** Independent c47 replay: all three member rules (c12 moments, c38
    * MAD, c41 EWMA) computed sequentially over the zero-filled spine. */
  private def ensembleReplay(days: Seq[(Long, Long)])
      : Map[Long, (Long, Boolean, Boolean, Boolean, Long, Boolean)] = {
    val byDay = days.toMap
    val lo = byDay.keys.min; val hi = byDay.keys.max
    val dense = (lo to hi).map(d => d -> byDay.getOrElse(d, 0L))
    val n = BigInt(dense.size)
    val s = BigInt(dense.map(_._2).sum)
    val ssq = dense.map(c => BigInt(c._2) * BigInt(c._2)).sum
    val med = medianCont(dense.map(_._2.toDouble))
    val mad = medianCont(dense.map(c => math.abs(c._2.toDouble - med)))
    dense.zipWithIndex.map { case ((d, cnt), i) =>
      val dev = BigInt(cnt) * n - s
      val zf = dev * dev > 4 * (n * ssq - s * s)
      val mf = math.abs(cnt.toDouble - med) > mad * 3
      val ef = i >= Events.EwmaDays && {
        val num = (1 to Events.EwmaDays)
          .map(k => dense(i - k)._2 * (1L << (Events.EwmaDays - k))).sum
        cnt * 255L > Events.EwmaSpikeFactor * num && cnt >= Events.EwmaMinCount
      }
      val nf = Seq(zf, mf, ef).count(identity).toLong
      d -> ((cnt, zf, mf, ef, nf, nf >= 2))
    }.filter(_._2._5 >= 1).toMap
  }

  test("c47 ensemble: replays all three member rules on the corpus") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()))
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val days = rows.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }.toSeq
      ensembleReplay(days).map { case (d, v) => (t, d) -> v }
    }.toMap
    val got = Events.c47AnomalyEnsemble(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getLong(6), r.getBoolean(7)))).toMap
    assert(got == expect, s"c47 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    assert(got.nonEmpty, "real data must flag something at test SF")
  }

  test("c47 ensemble: a planted flood pages with unanimous flags; burn-in scores 2 of 3") {
    import spark.implicits._
    def burst(day: Int, n: Int) = (0 until n).map(i => (day.toLong * 86400000000L + i * 1000000L, "api"))
    // 20 steady days then a 10x flood: z (moments), MAD, and EWMA all
    // trip on day 20 => n_flags 3, page
    val rows = (0 until 20).flatMap(d => burst(d, 10)) ++ burst(20, 100)
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = Events.c47AnomalyEnsembleOf(df).collect()
      .map(r => r.getLong(1) -> ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getLong(6), r.getBoolean(7)))).toMap
    assert(got(20L) == ((true, true, true, 3L, true)), s"flood day: ${got.get(20L)}")
    assert(!got.contains(10L), "steady days must not appear in the alert feed")
    // same flood on day 5 (inside EWMA burn-in): only z + MAD can score
    // it, consensus still pages — the committee is not EWMA-gated
    val rows2 = (0 until 20).flatMap(d => burst(d, if (d == 5) 100 else 10))
    val df2 = rows2.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got2 = Events.c47AnomalyEnsembleOf(df2).collect()
      .map(r => r.getLong(1) -> ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getLong(6), r.getBoolean(7)))).toMap
    assert(got2(5L) == ((true, true, false, 2L, true)), s"burn-in flood: ${got2.get(5L)}")
  }

  test("q65 abc: replays brute force; boundary part belongs to the upper class") {
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"))
      .agg((sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"))
        * 10000).cast("long").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (b, ps) =>
      val sorted = ps.toSeq.sortBy(p => (-p._3, p._2))
      val total = sorted.map(x => BigInt(x._3)).sum
      var cum = BigInt(0)
      val classed = sorted.map { p =>
        val cls = if (cum * 5 < total * 4) "A"
          else if (cum * 20 < total * 19) "B" else "C"
        cum += p._3
        (cls, p._3)
      }
      classed.groupBy(_._1).map { case (cls, xs) =>
        val crev = xs.map(x => BigInt(x._2)).sum
        (b, cls) -> ((xs.size.toLong, crev.toLong, (BigInt(10000) * crev / total).toLong))
      }
    }.toMap
    val got = Analytics.q65AbcClass(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"q65 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    val brands = expect.keySet.map(_._1)
    // the first part of every brand is A by the exclusive-cum convention
    assert(brands.forall(b => expect.contains((b, "A"))))
  }

  test("q65 abc: planted revenues pin the boundary convention exactly") {
    import spark.implicits._
    // one brand, parts with revenue 50/30/15/4/1 (total 100):
    // cum_excl 0, 50 => A,A; 80 (5x80 == 4x100, NOT <) => B;
    // 95 (20x95 == 19x100, NOT <) => C; 99 => C
    val li = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 4.0), (5L, 1.0))
      .toDF("l_partkey", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
    val pt = (1L to 5L).toDF("p_partkey").withColumn("p_brand", lit("BR#1"))
    val got = Analytics.q65AbcClassOf(li, pt).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((2L, 800000L, 8000L)), s"A: ${got.get("A")}")
    assert(got("B") == ((1L, 150000L, 1500L)), s"B: ${got.get("B")}")
    assert(got("C") == ((2L, 50000L, 500L)), s"C: ${got.get("C")}")
  }

  test("d99 dup-quality: planted clusters land in the right cells; normalization folds copies") {
    import spark.implicits._
    val base = "the cat sat of the mat and ran to a tree in town" // 13 toks, ok
    val docs = Seq(
      base, base.toUpperCase, base + "  ", base, base, // large cluster (5, fold-tested)
      "a b", "a b",                                    // small cluster, low quality (2 toks)
      "alpha beta gamma delta one",                    // uniques, ok (5 toks each)
      "alpha beta gamma delta two",
      "alpha beta gamma delta three",
      "x"                                              // unique, low (1 tok)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.d99DupQualityOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("large", "ok") -> ((5L, 65L, 10000L)),
      ("small", "low") -> ((2L, 4L, 10000L)),
      ("unique", "ok") -> ((3L, 15L, 7500L)),
      ("unique", "low") -> ((1L, 1L, 2500L))), s"d99 $got")
  }

  test("a42 access export: manifest replays brute force across all three tables") {
    val subj = (k: Long) => k % Etl.ErasureMod == 0
    val custRows = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), octet_length(col("c_name")) + octet_length(col("c_mktsegment")))
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val ordRows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        octet_length(col("o_orderstatus")) + octet_length(col("o_orderpriority")),
        expr("unix_date(to_date(o_orderdate))").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue(), r.getLong(3)))
      .filter(t => subj(t._1))
    val orderOwner = ordRows.map(t => t._2 -> t._1).toMap
    val liRows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        octet_length(col("l_returnflag")) + octet_length(col("l_linestatus")),
        expr("unix_date(to_date(l_shipdate))").cast("long"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2)))
      .filter(t => orderOwner.contains(t._1))
    val expect =
      custRows.keys.filter(subj).map(k =>
        (k, "customer") -> ((1L, custRows(k) + 24L, Option.empty[Long], Option.empty[Long]))).toMap ++
      ordRows.groupBy(_._1).map { case (k, xs) =>
        (k, "orders") -> ((xs.size.toLong, xs.map(_._3 + 32L).sum,
          Some(xs.map(_._4).min), Some(xs.map(_._4).max))) } ++
      liRows.groupBy(t => orderOwner(t._1)).map { case (k, xs) =>
        (k, "lineitem") -> ((xs.size.toLong, xs.map(_._2 + 72L).sum,
          Some(xs.map(_._3).min), Some(xs.map(_._3).max))) }
    val got = Etl.a42AccessExport(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got == expect, s"a42 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    assert(got.keySet.exists(_._2 == "lineitem"), "subjects must hold lineitem data at test SF")
  }

  test("d100 decontam: overlapping hit windows union exactly; doc set matches d20's") {
    import spark.implicits._
    val evalD = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // overlapping hits at pos 3 and 4: union = 4 tokens, keeps 6/10 => drop
      (1L, "x x alpha beta gamma delta y y y y"),
      // one hit at pos 5 of 20 tokens: cut 3, keep 17 => 8500 bp, cut_spans
      (2L, ("a b c d " + "alpha beta gamma " + "e f g h i j k l m n o p q").trim),
      (3L, "no shared grams here at all")).toDF("doc_id", "text")
    val got = TextOps.d100DecontamPlanOf(corpus, evalD).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got(1L) == ((10L, 2L, 4L, 6L, 6000L, "drop")), s"doc1: ${got.get(1L)}")
    assert(got(2L) == ((20L, 1L, 3L, 17L, 8500L, "cut_spans")), s"doc2: ${got.get(2L)}")
    assert(!got.contains(3L), "clean docs have no plan row")
    // cross-operator consistency: the planned doc set is exactly d20's
    val d20Docs = TextOps.d20Contamination(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val d100Docs = TextOps.d100DecontamPlan(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(d100Docs == d20Docs, "d100 must plan exactly the docs d20 flags")
  }

  test("c48 dispersion: replays exact moments; planted processes classify correctly") {
    import spark.implicits._
    // regular: exactly 7/day for 10 days => var 0, fano 0 ("regular");
    // bursty: 20 events on day 0 and day 5, zero between (mean 40/11,
    // var >> mean => "bursty")
    def burst(t: String, day: Int, n: Int) =
      (0 until n).map(i => (day.toLong * 86400000000L + i * 1000000L, t))
    val rows = (0 until 10).flatMap(d => burst("cron", d, 7)) ++
      burst("flash", 0, 20) ++ burst("flash", 5, 20) ++ burst("flash", 10, 4)
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = Events.c48DispersionOf(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(got("cron") == ((10L, 70L, 7000L, 0L, "regular")), s"cron: ${got.get("cron")}")
    val fl = got("flash")
    assert(fl._1 == 11L && fl._2 == 44L && fl._5 == "bursty", s"flash: $fl")
    // exact check: fano = 1000*(n*ssq - s^2)/(n*s); n=11, s=44, ssq=2*400+16
    val expFano = 1000L * (11L * 816L - 44L * 44L) / (11L * 44L)
    assert(fl._4 == expFano, s"fano ${fl._4} vs $expFano")
    // real data: every type gets exactly one verdict row
    val real = Events.c48Dispersion(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    assert(real.length == types.toInt)
  }

  test("c49 co-burst: planted joint flood pairs; lone burster stays out; flags are c41's") {
    import spark.implicits._
    def burst(t: String, day: Int, n: Int) =
      (0 until n).map(i => (day.toLong * 86400000000L + i * 1000000L, t))
    def steady(t: String, floods: Set[Int]) =
      (0 until 20).flatMap(d => burst(t, d, if (floods(d)) 100 else 10))
    val rows = steady("api", Set(15, 18)) ++ steady("db", Set(15)) ++ steady("lone", Set(10))
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    // cross-check the member flags against the real c41 operator
    val spikes = Events.c41EwmaControlOf(df).filter(col("spike"))
      .select(col("event_type"), col("day")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(spikes == Set(("api", 15L), ("api", 18L), ("db", 15L), ("lone", 10L)), s"$spikes")
    val got = Events.c49CoBurstOf(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(("api", "db") -> ((2L, 1L, 1L, 5000L))), s"c49 $got")
  }

  test("kmv_sketch: k smallest distinct hashes, invariant under partitioning") {
    import spark.implicits._
    val vals = (1L to 5000L).map(i => (i * 2654435761L) % 1000000007L) ++ Seq(7L, 7L, 7L)
    val expect = vals.distinct.sorted.take(64)
    Seq(1, 7).foreach { parts =>
      val got = vals.toDF("h").repartition(parts)
        .agg(expr("kmv_sketch(h, 64)")).collect()(0).getSeq[Long](0)
      assert(got == expect, s"parts=$parts")
    }
    // sub-k input: the sketch IS the distinct set
    val small = Seq(5L, 3L, 5L, 9L).toDF("h")
      .agg(expr("kmv_sketch(h, 64)")).collect()(0).getSeq[Long](0)
    assert(small == Seq(3L, 5L, 9L))
    // k < 1 fails at ANALYSIS (not as an executor NoSuchElementException
    // from the empty TreeSet mid-update)
    Seq("kmv_sketch(h, 0)", "kmv_sketch(h, -3)").foreach { bad =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Seq(1L).toDF("h").agg(expr(bad)).collect()
      }
      assert(e.getMessage.contains("k must be >= 1"), s"$bad: ${e.getMessage}")
    }
  }

  test("c50 overlap sketch: estimates track planted truth; sub-k keys are exact") {
    import spark.implicits._
    // "big" = users 0..1999, "half" = users 0..999 (a subset):
    // truth: d1 2000, d2 1000, union 2000, jaccard 0.5
    val rows = (0L until 2000L).map(u => ("big", u)) ++ (0L until 1000L).map(u => ("half", u))
    val df = rows.toDF("event_type", "user_id")
      .select(col("event_type"), lit(0L).as("event_id"),
        timestamp_micros(col("user_id") * 1000000L).as("ts"), col("user_id"))
    val r = Events.c50OverlapSketchOf(df).collect()
    assert(r.length == 1)
    val (e1, e2, eu, jbp) = (r(0).getLong(2), r(0).getLong(3), r(0).getLong(4), r(0).getLong(6))
    // k=256 => ~6% relative error; allow 4 sigma ~ 25%
    assert(math.abs(e1 - 2000L) < 500, s"est big $e1")
    assert(math.abs(e2 - 1000L) < 250, s"est half $e2")
    assert(math.abs(eu - 2000L) < 500, s"est union $eu")
    assert(math.abs(jbp - 5000L) < 1500, s"jaccard $jbp")
    // sub-k: tiny audiences estimate exactly
    val tiny = (0L until 50L).map(u => ("a", u)) ++ (25L until 75L).map(u => ("b", u))
    val dfT = tiny.toDF("event_type", "user_id")
    val rt = Events.c50OverlapSketchOf(dfT).collect()(0)
    assert((rt.getLong(2), rt.getLong(3), rt.getLong(4), rt.getLong(5), rt.getLong(6)) ==
      ((50L, 50L, 75L, 25L, 3333L)), s"tiny: $rt")
  }

  test("d101 gram cardinality: sketch error bounded on real data; sub-k sources exact") {
    val rows = CorpusOps.d101NgramCardinality(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, exact, est, err) =>
      assert(err == math.abs(est - exact) * 10000 / exact, s"$src err accounting")
      if (exact < 256) assert(est == exact && err == 0L, s"$src sub-k must be exact")
      else assert(err < 2500, s"$src err $err bp exceeds the 4-sigma band (exact=$exact est=$est)")
    }
    assert(rows.exists(_._2 >= 256), "test SF must saturate at least one source's sketch")
  }

  test("q66 topk churn: board replays brute force; churn flags match set diffs") {
    val rev = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1).as("m"),
        col("l_partkey"))
      .agg((sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"))
        * 10000).cast("long").as("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val board = rev.groupBy(_._1).toSeq.flatMap { case (m, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
        .map { case ((_, pk, rv), i) => (m.toLong, i + 1, pk, rv) }
    }
    val byMonth = board.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val expect = board.map { case (m, rnk, pk, rv) =>
      (m, rnk) -> ((pk, rv, !byMonth.get(m - 1).exists(_.contains(pk))))
    }.toMap
    val got = Analytics.q66TopkChurn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expect, s"q66 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    // the first month's board is all-new; later boards show real churn
    val firstM = got.keySet.map(_._1).min
    assert(got.filter(_._1._1 == firstM).values.forall(_._3))
    assert(got.exists { case ((m, _), v) => m > firstM && !v._3 }, "some part must persist")
  }

  test("c51 diurnality: replays the exact decomposition; planted clock signal scores high") {
    import spark.implicits._
    // replay on real data
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        expr("(unix_micros(ts) div 3600000000) % 24")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = cells.groupBy(_._1).map { case (t, xs) =>
      val byCell = xs.groupBy(c => (c._2, c._3)).view.mapValues(_.size.toLong).toMap
      val d = byCell.keys.map(_._1).max - byCell.keys.map(_._1).min + 1
      val byH = byCell.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
      val s = BigInt(byH.values.sum)
      val ssq = byCell.values.map(c => BigInt(c) * BigInt(c)).sum
      val sh2 = byH.values.map(v => BigInt(v) * BigInt(v)).sum
      val num = 1000 * (576 * sh2 - 24 * s * s)
      val den = 24 * (24 * BigInt(d) * ssq - s * s)
      t -> ((d, s.toLong, byH.size.toLong, (num / den).toLong))
    }
    val got = Events.c51Diurnality(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"c51 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    // planted: a pure 9am-only feed is maximally diurnal; a feed with
    // identical counts in every (day, hour) cell is exactly flat (eta2 0)
    val rows =
      (0 until 10).flatMap(d => (0 until 6).map(i =>
        (d * 86400000000L + 9L * 3600000000L + i, "rush"))) ++
      (0 until 10).flatMap(d => (0 until 24).flatMap(h =>
        (0 until 2).map(i => (d * 86400000000L + h * 3600000000L + i, "steady"))))
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val p = Events.c51DiurnalityOf(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getString(5)))).toMap
    assert(p("rush") == ((1000L, "diurnal")), s"rush: ${p.get("rush")}")
    assert(!p.contains("steady"), "an exactly-constant grid has zero variance (den=0, no row)")
  }

  test("q67 growth accounting: conservation holds exactly; components replay brute force") {
    val cy = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .agg((sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")) * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCust = cy.groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    val years = cy.map(_._2)
    val expect = ((years.min + 0) to (years.max + 1)).map { y =>
      var (st, nw, ex, ct, ch, en) = (0L, 0L, 0L, 0L, 0L, 0L)
      byCust.values.foreach { m =>
        val cur = m.getOrElse(y, 0L); val prev = m.getOrElse(y - 1, 0L)
        st += prev; en += cur
        if (cur > 0 && prev == 0) nw += cur
        if (cur > 0 && prev > 0) { ex += math.max(cur - prev, 0L); ct += math.max(prev - cur, 0L) }
        if (cur == 0 && prev > 0) ch += prev
      }
      y -> ((st, nw, ex, ct, ch, en))
    }.filter { case (_, v) => v != ((0L, 0L, 0L, 0L, 0L, 0L)) }.toMap
    val got = Analytics.q67GrowthAccounting(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"q67 ${got.toSeq.diff(expect.toSeq)} / ${expect.toSeq.diff(got.toSeq)}")
    // conservation: ending = starting + new + expansion - contraction - churned
    got.foreach { case (y, (st, nw, ex, ct, ch, en)) =>
      assert(en == st + nw + ex - ct - ch, s"conservation broken in $y")
    }
  }

  test("q68 elasticity: planted linear demand recovers the exact slope with r2 = 1") {
    import spark.implicits._
    // qty = 10 + 200*discount exactly: slope 200, r2 1.0
    val li = Seq(0.00, 0.02, 0.04, 0.06, 0.08, 0.10).zipWithIndex.map { case (d, i) =>
      (i.toLong + 1, d, 10.0 + 200.0 * d)
    }.toDF("l_partkey", "l_discount", "l_quantity")
    val pt = (1L to 6L).toDF("p_partkey").withColumn("p_brand", lit("BR#9"))
    // run the operator's moment pipeline on the planted frames
    val got = li.join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("cast(cast(l_discount as decimal(4,2)) * 10000 as bigint)").as("x"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("y"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .collect()(0)
    val (n, sx, sy, sxx, sxy) =
      (got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5))
    // planted y values quantize to integers, so fit the quantized truth
    val slopePerBp = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.abs(slopePerBp * 10000 - 200.0) < 1.0, s"slope ${slopePerBp * 10000}")
    // real data: every brand reports, r2 in [0, 1]
    val real = Analytics.q68DiscountElasticity(spark, sfDir).collect()
    assert(real.length == 25)
    real.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-12,
      s"${r.getString(0)} r2 ${r.getDouble(3)}"))
  }

  test("e17 tar layout: framing math exact, offsets contiguous, totals reconcile") {
    val rows = MultimodalOps.e17TarLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, _, n, framed, _, _) =>
      assert(framed == 512 + ((n + 511) / 512) * 512, s"doc $id framing")
    }
    // within each (source, shard): offsets start at 0, are contiguous in
    // doc_id order, and the archive total = sum(framed) + 1024
    rows.groupBy(r => (r._2, r._3)).foreach { case ((src, sh), ms) =>
      val sorted = ms.sortBy(_._1)
      var off = 0L
      sorted.foreach { m =>
        assert(m._6 == off, s"$src/$sh offset ${m._6} != $off")
        off += m._5
      }
      assert(ms.forall(_._7 == off + 1024L), s"$src/$sh total")
    }
    // e17's shard assignment agrees with e2's row-for-row
    val e2 = MultimodalOps.e2BlobShard(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, _, sh, _, _, _, _) => assert(e2(id) == sh, s"doc $id shard") }
  }

  test("q69 p-chart: limits replay the binomial formula; small months get wider limits") {
    val rows = Analytics.q69ReturnPchart(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    val pbar = rows.map(_._3).sum.toDouble / rows.map(_._2).sum.toDouble
    rows.foreach { case (m, n, d, p, pb, ucl, lcl, ooc) =>
      assert(pb == pbar, s"month $m center line")
      val sigma = math.sqrt(pbar * (1.0 - pbar) / n.toDouble)
      assert(ucl == pbar + 3.0 * sigma && lcl == math.max(pbar - 3.0 * sigma, 0.0),
        s"month $m limits")
      assert(p == d.toDouble / n.toDouble && ooc == (p > ucl || p < lcl), s"month $m flag")
    }
    // monotone width: the smallest month has the widest band
    val byN = rows.sortBy(_._2)
    assert(byN.head._6 - byN.head._7 >= byN.last._6 - byN.last._7 - 1e-12,
      "smaller n must not have tighter limits")
    // control-chart sanity: most in-process months are inside the band
    assert(rows.count(!_._8) * 2 > rows.length, "a healthy process is mostly in control")
  }

  test("Tar: ustar round-trips; e17 offsets are seek-accurate in the real archive") {
    // padding edge cases: empty, exactly one block, one block + 1 byte
    val members = Seq(
      "a.txt" -> Array[Byte](),
      "b.bin" -> Array.fill[Byte](512)(7),
      "c.bin" -> Array.fill[Byte](513)(9),
      "d.txt" -> "hello graft".getBytes("US-ASCII"))
    val bytes = MultimodalOps.Tar.tarBytes(members)
    val back = MultimodalOps.Tar.readTar(bytes)
    assert(back.map(_._1) == members.map(_._1))
    assert(back.zip(members).forall { case ((_, g), (_, e)) => java.util.Arrays.equals(g, e) })
    // archive size obeys exactly e17's framing formula
    val expected = members.map { case (_, d) => 512 + ((d.length + 511) / 512) * 512 }.sum + 1024
    assert(bytes.length == expected)
    // deterministic bytes (content-addressable shards)
    assert(java.util.Arrays.equals(bytes, MultimodalOps.Tar.tarBytes(members)))
    // e17's manifest against a REAL archive of one (source, shard) group:
    // the predicted size is the file size and every member offset lands
    // on that member's header
    val manifest = MultimodalOps.e17TarLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(5), r.getLong(6)))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val (src, shard) = (manifest.head._2, manifest.head._3)
    val grp = manifest.filter(m => m._2 == src && m._3 == shard).sortBy(_._1)
    assert(grp.size > 1, "pick a shard with multiple members")
    val archive = MultimodalOps.Tar.tarBytes(grp.map(m => s"${m._1}.bin" -> docs(m._1)))
    assert(archive.length.toLong == grp.head._5, "shard_tar_bytes must equal the real size")
    grp.foreach { m =>
      val at = m._4.toInt
      val name = new String(archive.slice(at, at + 100).takeWhile(_ != 0), "US-ASCII")
      assert(name == s"${m._1}.bin", s"offset ${m._4} must point at doc ${m._1}'s header")
    }
  }

  test("TarShardSink: written archives match e17 byte-for-byte and seek-accurately") {
    import graft.sources.TarShardSink
    val out = java.nio.file.Files.createTempDirectory("graft_tarsink").toString
    TarShardSink.write(spark, sfDir, out)
    val setDir = TarShardSink.currentShardDir(spark, out)
      .getOrElse(fail("a completed write must publish a shard-set version"))
    val manifest = MultimodalOps.e17TarLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(5), r.getLong(6)))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val byShard = manifest.groupBy(m => (m._2, m._3))
    assert(byShard.size > 2, "sf0.001 must produce multiple shards")
    byShard.foreach { case ((src, shard), ms) =>
      val f = new java.io.File(f"$setDir/$src/shard-$shard%05d.tar")
      assert(f.isFile, s"$src/$shard must be written")
      // 1. predicted shard_tar_bytes IS the written file's size
      assert(f.length() == ms.head._5, s"$src/$shard size ${f.length()} != ${ms.head._5}")
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // 2. full round-trip: members in doc order with exact payloads
      val back = MultimodalOps.Tar.readTar(bytes)
      val expect = ms.sortBy(_._1)
      assert(back.map(_._1) == expect.map(m => s"${m._1}.bin").toSeq, s"$src/$shard members")
      back.zip(expect).foreach { case ((_, data), m) =>
        assert(java.util.Arrays.equals(data, docs(m._1)), s"doc ${m._1} payload")
      }
      // 3. every e17 member_offset seeks onto that member's header IN
      // THE WRITTEN FILE (the loader contract the manifest promises)
      val raf = new java.io.RandomAccessFile(f, "r")
      try expect.foreach { m =>
        raf.seek(m._4)
        val hdr = new Array[Byte](100)
        raf.readFully(hdr)
        val name = new String(hdr.takeWhile(_ != 0), "US-ASCII")
        assert(name == s"${m._1}.bin", s"offset ${m._4} of $src/$shard -> $name")
      } finally raf.close()
      // 4. the streaming header walk sees the same members + offsets
      val in = new java.io.FileInputStream(f)
      val walked = try MultimodalOps.Tar.walkStream(in) finally in.close()
      assert(walked.map(w => (w._1, w._3)) ==
        expect.map(m => (s"${m._1}.bin", m._4)).toSeq, s"$src/$shard walk")
    }
    // no unexpected files: every written archive is in the manifest
    val written = new java.io.File(setDir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles)
      .filter(_.getName.endsWith(".tar"))
      .map(f => (f.getParentFile.getName, f.getName)).toSet
    assert(written == byShard.keySet.map { case (s, i) => (s, f"shard-$i%05d.tar") },
      "written set must equal the manifest's shard set")
    // 5. idempotent republish: a NEW version with byte-identical archives
    val probe = byShard.keys.head
    val pFile = new java.io.File(f"$setDir/${probe._1}/shard-${probe._2}%05d.tar")
    val before = java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(pFile.toPath))
    TarShardSink.write(spark, sfDir, out)
    val setDir2 = TarShardSink.currentShardDir(spark, out).get
    assert(setDir2 != setDir, "republish must land in a fresh version dir")
    val pFile2 = new java.io.File(f"$setDir2/${probe._1}/shard-${probe._2}%05d.tar")
    val after = java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(pFile2.toPath))
    assert(before == after, "re-run must republish byte-identical content")
    // 6. the measured manifest agrees with the predictions, group-level
    val measured = TarShardSink.writtenManifest(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(measured == byShard.map { case (k, ms) => k -> ((ms.length.toLong, ms.head._5)) },
      "measured (n_members, tar_bytes) must equal e17's per-shard predictions")
  }

  test("TarShardSink: payload never rides a window; slim frame carries no binary") {
    import graft.sources.TarShardSink
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.types.BinaryType
    // 1. the payload-side plan has NO Window node at all: the only wide
    // op between the parquet scan and the writers is the final
    // (source, shard_idx) repartition — corpus bytes move exactly once
    val payloadPlan = TarShardSink.assignedPayloads(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = payloadPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty,
      s"payload plan must not contain a Window node:\n$payloadPlan")
    // 2. the slim assignment plan's Window subtree carries no binary
    // column anywhere beneath it (the r11 defect was exactly a payload
    // column riding the per-source window sort)
    val slimPlan = TarShardSink.shardAssignments(spark, sfDir)
      .queryExecution.optimizedPlan
    val slimWindows = slimPlan.collect { case w: LWindow => w }
    assert(slimWindows.nonEmpty, "the slim frame is where the window belongs")
    def subtree(p: LogicalPlan): Seq[LogicalPlan] = p +: p.children.flatMap(subtree)
    slimWindows.foreach { w =>
      subtree(w).foreach { node =>
        assert(!node.output.exists(_.dataType == BinaryType),
          s"binary column below the Window node:\n$slimPlan")
      }
    }
    // 3. the assignment the broadcast binary search reproduces IS e2's
    // window assignment, doc-for-doc
    val viaWindow = TarShardSink.shardAssignments(spark, sfDir)
      .select(col("doc_id"), col("shard_idx")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSearch = TarShardSink.assignedPayloads(spark, sfDir)
      .select(col("doc_id"), col("shard_idx")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSearch == viaWindow,
      "binary-search assignment must equal the window assignment exactly")
  }

  test("TarShardSink: a crashed half-export is invisible; the previous set stays current") {
    import graft.sources.TarShardSink
    val out = java.nio.file.Files.createTempDirectory("graft_tarsink_atomic").toString
    // before any publish: no current set, readers return empty
    assert(TarShardSink.currentShardDir(spark, out).isEmpty)
    assert(TarShardSink.writtenManifest(spark, out).count() == 0L)
    TarShardSink.write(spark, sfDir, out)
    val v1 = TarShardSink.currentShardDir(spark, out).get
    val manifest1 = TarShardSink.writtenManifest(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(manifest1.nonEmpty)
    // simulate a crash mid-export: a staging dir appears with PARTIAL
    // content (one corrupt archive of a would-be v2) but no log entry
    val staged = new java.io.File(out, "shards-v2-crashed/srcA")
    assert(staged.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(staged, "shard-00000.tar").toPath,
      Array.fill[Byte](1024)(3))
    // readers resolve ONLY through the log: same version, same manifest,
    // the partial stage contributes nothing
    assert(TarShardSink.currentShardDir(spark, out).contains(v1),
      "a stage without a log entry must not become current")
    val manifest1b = TarShardSink.writtenManifest(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(manifest1b == manifest1, "manifest must be the committed set only")
    // the next successful publish vacuums the crashed orphan stage
    TarShardSink.write(spark, sfDir, out)
    assert(!new java.io.File(out, "shards-v2-crashed").exists(),
      "publish must vacuum orphaned stages")
    assert(TarShardSink.currentShardDir(spark, out).exists(_ != v1))
  }

  test("c52 runs test: planted orderings hit all four verdicts; stats replay exactly") {
    import spark.implicits._
    def series(t: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, day) =>
        Seq.fill(c)((t, new java.sql.Timestamp(day.toLong * 86400000L)))
      }
    // trend: clustered (2 runs where ~11 expected); flip: oscillating
    // (20 runs); rand: inside the 5% band; flat: degenerate (no side)
    val rows = series("trend", Seq.fill(10)(1) ++ Seq.fill(10)(3)) ++
      series("flip", (0 until 20).map(i => if (i % 2 == 0) 1 else 3)) ++
      series("rand", Seq(1, 3, 3, 1, 3, 1, 1, 3, 1, 3)) ++
      series("flat", Seq.fill(8)(2))
    val got = Events.c52RunsTestOf(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))))
      .toMap
    // hand math: E[R]·1000 = 1000 + 2000·n1·n2 div n
    assert(got("trend") == ((20L, 10L, 10L, 2L, 11000L, "clustered")), got("trend").toString)
    assert(got("flip") == ((20L, 10L, 10L, 20L, 11000L, "oscillating")), got("flip").toString)
    assert(got("rand") == ((10L, 5L, 5L, 8L, 6000L, "random")), got("rand").toString)
    assert(got("flat")._6 == "degenerate" && got("flat")._2 == 0L)
    // real data: every type classifies, runs within [1, n_days]
    val real = Events.c52RunsTest(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(4) >= 1L && r.getLong(4) <= r.getLong(1),
      s"${r.getString(0)} runs ${r.getLong(4)}"))
  }

  test("d102 PII density: planted hits replay per source; injection rule matches d18's") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "hello a@b.co x"),
      (2L, "s1", "call 555-1234 now"),
      (3L, "s1", "clean text"),
      (10L, "s2", "clean")) // %10==0: injection appends 1 email + 1 phone
      .toDF("doc_id", "source", "text")
    val got = TextOps.d102PiiDensityOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val s1Bytes = 14L + 17L + 10L
    assert(got("s1") == ((3L, 2L, 6666L, 1L, 1L, 2L * 1048576L / s1Bytes, 1L)),
      got("s1").toString)
    val s2Bytes = "clean contact agent10@example.org or call 555-0010".length.toLong
    assert(got("s2") == ((1L, 1L, 10000L, 1L, 1L, 2L * 1048576L / s2Bytes, 2L)),
      got("s2").toString)
    // real data: every source reports; the injection guarantees hits
    // SOMEWHERE (doc_ids stripe by source, so only sources holding
    // %10==0 ids carry them); emails == phones (injected pairwise)
    val real = TextOps.d102PiiDensity(spark, sfDir).collect()
    assert(real.nonEmpty && real.map(_.getLong(2)).sum > 0)
    assert(real.map(_.getLong(4)).sum == real.map(_.getLong(5)).sum)
  }

  test("q70 Spearman: monotone=±1, tie-averaged ranks replay the textbook value") {
    import spark.implicits._
    def li(flag: String, rows: Seq[(Double, Long)]) =
      rows.map { case (d, q) => (flag, BigDecimal(d), BigDecimal(q)) }
    val planted = (
      li("M", Seq(0.01 -> 10L, 0.02 -> 20L, 0.03 -> 30L, 0.04 -> 40L, 0.05 -> 50L)) ++
      li("I", Seq(0.01 -> 50L, 0.02 -> 40L, 0.03 -> 30L, 0.04 -> 20L, 0.05 -> 10L)) ++
      li("T", Seq(0.01 -> 10L, 0.01 -> 20L, 0.02 -> 20L, 0.03 -> 30L)))
      .toDF("l_returnflag", "l_discount", "l_quantity")
    val got = Analytics.q70SpearmanOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // sqrt(a)*sqrt(a) rounds one ulp short of a: tolerance, not equality
    assert(got("M")._1 == 5L && math.abs(got("M")._2 - 1.0) < 1e-12, got("M").toString)
    assert(got("I")._1 == 5L && math.abs(got("I")._2 + 1.0) < 1e-12, got("I").toString)
    // x=[1,1,2,3], y=[10,20,20,30]: tie-averaged Spearman = 60/72
    assert(got("T")._1 == 4L && math.abs(got("T")._2 - 60.0 / 72.0) < 1e-15,
      got("T").toString)
    // real data: every flag reports, rho in [-1, 1]
    val real = Analytics.q70Spearman(spark, sfDir).collect()
    assert(real.length == 3)
    real.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("q71 Kendall tau-b: monotone=±1, independence=0, textbook 1/3 and tie case replay") {
    import spark.implicits._
    def li(flag: String, rows: Seq[(Double, Long)]) =
      rows.map { case (d, q) => (flag, BigDecimal(d), BigDecimal(q)) }
    val planted = (
      li("M", Seq(0.01 -> 10L, 0.02 -> 20L, 0.03 -> 30L, 0.04 -> 40L)) ++
      li("I", Seq(0.01 -> 40L, 0.02 -> 30L, 0.03 -> 20L, 0.04 -> 10L)) ++
      // x=[1,2,3], y=[10,30,20]: C-D = 1, n0 = 3, no ties -> tau = 1/3
      li("P", Seq(0.01 -> 10L, 0.02 -> 30L, 0.03 -> 20L)) ++
      // the 2x2 independence grid: C-D = 0 -> tau-b = 0 despite ties
      li("Z", Seq(0.01 -> 10L, 0.01 -> 20L, 0.02 -> 10L, 0.02 -> 20L)))
      .toDF("l_returnflag", "l_discount", "l_quantity")
    val got = Analytics.q71KendallTauOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("M")._1 == 4L && math.abs(got("M")._2 - 1.0) < 1e-12, got("M").toString)
    assert(got("I")._1 == 4L && math.abs(got("I")._2 + 1.0) < 1e-12, got("I").toString)
    assert(got("P")._1 == 3L && math.abs(got("P")._2 - 1.0 / 3.0) < 1e-15, got("P").toString)
    assert(got("Z")._1 == 4L && got("Z")._2 == 0.0, got("Z").toString)
    // real data: every flag reports, tau in [-1, 1], same sign as q70's rho
    // on the same axes (both are monotone-association measures; on this
    // data the association is weak but their SIGNS must agree)
    val real = Analytics.q71KendallTau(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rho = Analytics.q70Spearman(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(real.size == 3)
    real.foreach { case (f, t) =>
      assert(math.abs(t) <= 1.0 + 1e-12)
      assert(t.sign == rho(f).sign || math.abs(t) < 1e-6, s"$f: tau=$t rho=${rho(f)}")
    }
  }

  test("q72 Mann-Whitney: planted separations and tie case replay U and z exactly") {
    import spark.implicits._
    def li(grp: String, ret: Boolean, delays: Seq[Int]) =
      delays.map(d => (grp, d.toLong, ret))
    // SEP: ret=[1,2] kept=[3,4] -> 2U=0, n=4, T=5*4*3=60,
    //      z = -4/sqrt(4*60/(3*12)) = -1.549...
    // TIE: ret=[1,2,2] kept=[2,3] -> 2U=2, n=5, T=6*5*4-24=96,
    //      z = -4/sqrt(6*96/(3*20)) = -1.291...
    // ONE: kept only -> degenerate (z null)
    val planted = (li("SEP", ret = true, Seq(1, 2)) ++ li("SEP", ret = false, Seq(3, 4)) ++
      li("TIE", ret = true, Seq(1, 2, 2)) ++ li("TIE", ret = false, Seq(2, 3)) ++
      li("ONE", ret = false, Seq(1, 2, 3)))
      .toDF("grp", "delay", "is_ret")
    val got = Analytics.q72MannWhitneyOf(planted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    val sep = got("SEP")
    assert(sep._1 == 2L && sep._2 == 2L && sep._3 == 0L, sep.toString)
    assert(math.abs(sep._4 - (-4.0 / math.sqrt(4.0 * 60 / (3 * 12)))) < 1e-12)
    val tie = got("TIE")
    assert(tie._1 == 3L && tie._2 == 2L && tie._3 == 2L, tie.toString)
    assert(math.abs(tie._4 - (-4.0 / math.sqrt(6.0 * 96 / (3 * 20)))) < 1e-12)
    assert(got("ONE")._4.isNaN, got("ONE").toString)
    // real data: every priority reports; 2U bounded by 2*na*nb; z finite
    val real = Analytics.q72MannWhitney(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 2 * r.getLong(1) * r.getLong(2))
      assert(!r.isNullAt(4) && !r.getDouble(4).isNaN)
    }
  }

  test("q73 two-way ANOVA: balanced 2x2 textbook decomposition replays exactly") {
    import spark.implicits._
    // cents: (R,O)=10,12 (R,F)=20,22 (N,O)=11,13 (N,F)=25,27
    // SS (cents^2): A=18, B=288, AB=8, err=8, tot=322; F: 9, 144, 4
    val rows = Seq(
      ("R", "O", 0.10), ("R", "O", 0.12), ("R", "F", 0.20), ("R", "F", 0.22),
      ("N", "O", 0.11), ("N", "O", 0.13), ("N", "F", 0.25), ("N", "F", 0.27))
      .map { case (a, b, p) => (a, b, BigDecimal(p)) }
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val got = Analytics.q73AnovaTwoWayOf(rows).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got("returnflag") == ((18000.0, 1L, 9.0)), got("returnflag").toString)
    assert(got("linestatus") == ((288000.0, 1L, 144.0)), got("linestatus").toString)
    assert(got("interaction") == ((8000.0, 1L, 4.0)), got("interaction").toString)
    assert(got("error")._1 == 8000.0 && got("error")._2 == 4L && got("error")._3.isNaN)
    assert(got("total")._1 == 322000.0 && got("total")._2 == 7L)
    // decomposition identity holds on real data too (within the
    // documented <=1-milli-per-group truncation of each term)
    val real = Analytics.q73AnovaTwoWay(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val parts = real("returnflag") + real("linestatus") + real("interaction") + real("error")
    assert(math.abs(parts - real("total")) <= 8.0, s"$parts vs ${real("total")}")
    real.values.foreach(v => assert(v >= -8.0))
  }

  test("q74 Kruskal-Wallis: textbook three-group separation and tie adjustment replay") {
    import spark.implicits._
    // classic separated groups: ranks ARE the values -> H = 7.2, no ties
    val sep = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L))
      .map { case (g, d) => (1995L, g, d) }.toDF("yr", "grp", "delay")
    val g1 = Analytics.q74KruskalWallisOf(sep).collect()
    assert(g1.length == 1)
    assert(g1(0).getLong(1) == 9L && g1(0).getLong(2) == 3L && g1(0).getBoolean(3))
    assert(math.abs(g1(0).getDouble(4) - 7.2) < 1e-12, g1(0).toString)
    assert(math.abs(g1(0).getDouble(5) - 7.2) < 1e-12)
    assert(g1(0).getBoolean(6)) // df=2 crit 5.991
    // tie adjustment: A=[1,2] B=[1,3] -> H=0.15, tie3=6, adj 0.15*60/54
    val tied = Seq((1L, "a", 1L), (1L, "a", 2L), (1L, "b", 1L), (1L, "b", 3L))
      .toDF("yr", "grp", "delay")
    val g2 = Analytics.q74KruskalWallisOf(tied).collect()
    assert(math.abs(g2(0).getDouble(4) - 0.15) < 1e-12, g2(0).toString)
    assert(math.abs(g2(0).getDouble(5) - 0.15 * 60.0 / 54.0) < 1e-12)
    assert(!g2(0).getBoolean(6))
    // degenerate: everything tied at one value -> H undefined (null)
    val flat = Seq((1L, "a", 5L), (1L, "a", 5L), (1L, "b", 5L), (1L, "b", 5L))
      .toDF("yr", "grp", "delay")
    assert(Analytics.q74KruskalWallisOf(flat).collect()(0).isNullAt(4))
    // real data: all 5 priorities per year, ranking conserved, H finite
    // and nonnegative up to the documented milli truncation
    val real = Analytics.q74KruskalWallis(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) == 5L, r.toString)
      assert(r.getBoolean(3), s"rank conservation failed: $r")
      assert(!r.isNullAt(4) && r.getDouble(4) > -1e-3 && !r.getDouble(4).isNaN)
      assert(r.getDouble(5) >= r.getDouble(4) - 1e-12)
    }
  }

  test("bitmap family: exact distinct under partition splits, negatives, sparse words") {
    import spark.implicits._
    // ids span negative words, dense runs, and >64-apart sparse words;
    // repartition(7) forces map-side partials through merge()
    val ids = (Seq(-130L, -129L, -1L, 0L, 1L, 63L, 64L, 65L, 1000000L, 1000001L) ++
      (0L until 200L) ++ Seq(5000L)).map(Tuple1(_))
    val df = ids.toDF("id").repartition(7)
    df.createOrReplaceTempView("bm_ids")
    val got = spark.sql(
      """select bitset_count(bitset_agg(id)) as c1 from bm_ids""").head().getLong(0)
    val exact = spark.sql("select count(distinct id) from bm_ids").head().getLong(0)
    assert(got == exact, s"$got vs $exact")
    // two-level: per-bucket bitmaps re-aggregate to the exact union
    val two = spark.sql(
      """select bitset_union_count(bm) from
        |  (select id % 5 as b, bitset_agg(id) as bm from bm_ids group by 1)""".stripMargin)
      .head().getLong(0)
    assert(two == exact, s"union $two vs $exact")
  }

  test("c56 weekly stickiness: bitmap rollup equals count-distinct truth; planted weeks") {
    import spark.implicits._
    def ev(day: Long, users: Seq[Long]) = users.map(u =>
      (new java.sql.Timestamp(day * 86400000L + 3600000L), u))
    // week 0: days 0,1 with users {1,2},{2,3} -> dau 2+2, wau 3,
    // stickiness 40000/(2*3) = 6666; week 1: one day, one user -> 10000
    val rows = ev(0, Seq(1L, 2L)) ++ ev(1, Seq(2L, 3L)) ++ ev(7, Seq(5L))
    val got = Events.c56WeeklyStickinessOf(rows.toDF("ts", "user_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) == ((2L, 4L, 3L, 4L, 6666L)), got(0L).toString)
    assert(got(1L) == ((1L, 1L, 1L, 1L, 10000L)), got(1L).toString)
    // real data: the bitmap WAU equals the relational count(distinct)
    // truth per week, and invariants hold
    val real = Events.c56WeeklyStickiness(spark, sfDir).collect()
    assert(real.nonEmpty)
    val truth = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 86400000000 div 7").as("week"), col("user_id"))
      .groupBy(col("week")).agg(countDistinct(col("user_id")).as("wau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    real.foreach { r =>
      assert(r.getLong(3) == truth(r.getLong(0)),
        s"week ${r.getLong(0)}: ${r.getLong(3)} vs ${truth(r.getLong(0))}")
      assert(r.getLong(4) >= r.getLong(3) && r.getLong(4) <= r.getLong(1) * r.getLong(3))
      assert(r.getLong(5) > 0L && r.getLong(5) <= 10000L)
    }
  }

  test("q79 ABC migration: planted boundary classes migrate up/down/stay exactly") {
    import spark.implicits._
    // year 1: p1=80 A, p2=15 B, p3=5 C; year 2: p2=85 A, p1=10 B, p3=5 C
    // -> p1 A->B down, p2 B->A up, p3 C->C stay (q65's exact boundaries)
    val rev = Seq(
      (1L, "B1", 1L, 800000L), (1L, "B1", 2L, 150000L), (1L, "B1", 3L, 50000L),
      (2L, "B1", 1L, 100000L), (2L, "B1", 2L, 850000L), (2L, "B1", 3L, 50000L))
      .toDF("yr", "p_brand", "l_partkey", "rev_e4")
    val got = Analytics.q79AbcMigrationOf(rev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got((2L, "A", "B")) == ((1L, 100000L, "down")), got.toString)
    assert(got((2L, "B", "A")) == ((1L, 850000L, "up")))
    assert(got((2L, "C", "C")) == ((1L, 50000L, "stay")))
    assert(got.size == 3)
    // real data: move labels consistent with the class pair
    val real = Analytics.q79AbcMigration(spark, sfDir).collect()
    assert(real.nonEmpty)
    val rk = Map("A" -> 0, "B" -> 1, "C" -> 2)
    real.foreach { r =>
      val expect = Integer.compare(rk(r.getString(2)), rk(r.getString(1))) match {
        case c if c < 0 => "up"
        case 0 => "stay"
        case _ => "down"
      }
      assert(r.getString(5) == expect && r.getLong(3) > 0L, r.toString)
    }
  }

  test("d110 code switch: en|fr concatenation flagged, pure and und docs agree") {
    import spark.implicits._
    // "mix": en stopwords then fr stopwords -> halves disagree (en->fr)
    // "pure": an all-en doc and an unidentifiable doc -> no switches
    val docs = Seq(
      (1L, "mix", "the of and that have it la le les de des du"),
      (2L, "pure", "the of and that the of and that"),
      (3L, "pure", "xyzq qqqz wwwk zzzp"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.d110CodeSwitchOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = got("mix")
    assert(m.getLong(1) == 1L && m.getLong(2) == 1L && m.getLong(3) == 10000L)
    assert(m.getString(4) == "en" && m.getString(5) == "fr", m.toString)
    val p = got("pure")
    assert(p.getLong(1) == 2L && p.getLong(2) == 0L && p.getLong(3) == 0L)
    assert(p.isNullAt(4) && p.isNullAt(5))
    // real data: share bounded; pair null iff no switches
    val real = TextOps.d110CodeSwitch(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
      if (r.getLong(2) == 0L) assert(r.isNullAt(4) && r.isNullAt(5))
      else assert(!r.isNullAt(4) && !r.isNullAt(5) &&
        r.getString(4) != r.getString(5))
    }
  }

  test("q78 price index: textbook Laspeyres/Paasche replay; basket matching enforced") {
    import spark.implicits._
    // base 1995: A p=100 q=1, B p=100 q=2; 1996: A p=110 q=1, B p=90 q=4
    // -> L = 290/300 (9666 bp), P = 470/500 (9400 bp); C/D unmatched
    val rows = Seq(
      (1L, 1995L, 100L, 10000L), (2L, 1995L, 200L, 20000L),
      (1L, 1996L, 100L, 11000L), (2L, 1996L, 400L, 36000L),
      (3L, 1996L, 100L, 5000L), (4L, 1995L, 100L, 7000L))
      .toDF("part", "yr", "qty_c", "rev_c")
    val got = Analytics.q78PriceIndexOf(rows).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1996L && r.getLong(1) == 1995L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 9666L && r.getLong(4) == 9400L, r.toString)
    assert(math.abs(r.getDouble(5) - math.sqrt(29.0e6 * 1e4 / 3e7 * 9400.0)) < 1e-9)
    // real data: indexes positive, Fisher between L and P (geometric mean)
    val real = Analytics.q78PriceIndex(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { rr =>
      val (l, p, f) = (rr.getLong(3), rr.getLong(4), rr.getDouble(5))
      assert(l > 0L && p > 0L && rr.getLong(2) > 0L, rr.toString)
      assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1)
    }
  }

  test("a43 CDC conflicts: re-sends vs conflicting payloads split exactly per day") {
    import spark.implicits._
    def ev(u: Long, tsMs: Long, t: String, v: Double) =
      (1L, new java.sql.Timestamp(tsMs), u, t, v)
    // day 0: clean version, a benign re-send (same payload twice), and a
    // CONFLICT (same version, different value); day 1: clean only
    val rows = Seq(
      ev(1L, 1000L, "a", 1.0),
      ev(2L, 2000L, "a", 1.0), ev(2L, 2000L, "a", 1.0),
      ev(3L, 3000L, "a", 1.0), ev(3L, 3000L, "a", 2.0),
      ev(4L, 86400000L + 500L, "b", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Etl.a43CdcConflictsOf(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(0L) == ((3L, 2L, 1L, 3333L)), got(0L).toString)
    assert(got(1L) == ((1L, 0L, 0L, 0L)), got(1L).toString)
    // real data: conflicts are a subset of re-sends; shares bounded
    val real = Etl.a43CdcConflicts(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
    }
  }

  test("q77 reorder cadence: planted per-segment gap chains replay; null-gap customers counted") {
    import spark.implicits._
    import java.sql.Date
    // seg A: cust 1 gaps [10, 20], cust 2 single order -> med 10, p90 20,
    // mean 15000 milli; seg B: one gap of 7
    val rows = Seq(
      ("A", 1L, "1995-01-01"), ("A", 1L, "1995-01-11"), ("A", 1L, "1995-01-31"),
      ("A", 2L, "1995-02-01"), ("B", 3L, "1995-01-01"), ("B", 3L, "1995-01-08"))
      .map { case (s, c, d) => (s, c, Date.valueOf(d)) }
      .toDF("seg", "cust", "d")
    val got = Analytics.q77ReorderCadenceOf(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") == ((2L, 2L, 10L, 20L, 15000L)), got("A").toString)
    assert(got("B") == ((1L, 1L, 7L, 7L, 7000L)), got("B").toString)
    // real data: med <= p90, pairs consistent with customers
    val real = Analytics.q77ReorderCadence(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(1) > 0L, r.toString)
      if (r.getLong(2) > 0L) assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("d109 dup locality: planted gap chains replay median/p90/near share exactly") {
    import spark.implicits._
    // source "re": dup chains give gaps [1,1,1,1000] -> med 1, p90 1000,
    // near share 7500 bp; a cross-source pair attributes to the LATER copy
    val docs = Seq(
      (10L, "re", "x x"), (11L, "re", "x x"),
      (20L, "re", "y y"), (21L, "re", "y y"), (22L, "re", "y y"),
      (30L, "re", "z z"), (1030L, "re", "z z"),
      (5L, "a", "w w"), (50005L, "b", "w w"),
      (7L, "a", "unique one"))
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.d109DupLocalityOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    def vals(r: org.apache.spark.sql.Row) =
      (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))
    assert(vals(got("re")) == ((7L, 4L, 1L, 1000L, 7500L)), got("re").toString)
    assert(vals(got("b")) == ((1L, 1L, 50000L, 50000L, 0L)), got("b").toString)
    // a dup-free source still reports, with nulls (the sizing answer
    // "no admission window needed" is a real answer)
    assert(vals(got("a")) == ((2L, 0L, -1L, -1L, -1L)), got("a").toString)
    // real data: every source reports; med <= p90 when pairs exist
    val real = CorpusOps.d109DupLocality(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) >= 0L, r.toString)
      if (r.getLong(2) > 0L) {
        assert(r.getLong(3) <= r.getLong(4))
        assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
      } else assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("q76 cohort LTV: planted two-cohort curves replay in exact cents") {
    import spark.implicits._
    // cohort 1995 = {c1, c2}: age0 rev 170.00 over 3 orders, age1 +30.00
    // -> ltv 8500 then 10000 cents; cohort 1996 = {c3}: 10.00
    val rows = Seq(
      (1L, "1995-03-01", 100.0), (1L, "1995-07-01", 50.0), (1L, "1996-02-01", 30.0),
      (2L, "1995-05-01", 20.0), (3L, "1996-06-01", 10.0))
      .map { case (c, d, p) => (c, d, BigDecimal(p)) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.q76CohortLtvOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got((1995L, 0L)) == ((2L, 3L, 17000L, 17000L, 8500L)), got.toString)
    assert(got((1995L, 1L)) == ((2L, 1L, 3000L, 20000L, 10000L)))
    assert(got((1996L, 0L)) == ((1L, 1L, 1000L, 1000L, 1000L)))
    // real data: age-0 row per cohort, cum monotone, ltv = cum div size
    val real = Analytics.q76CohortLtv(spark, sfDir).collect()
    assert(real.nonEmpty)
    val byCohort = real.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(5) > a.getLong(5))
        case _ => ()
      }
      sorted.foreach(r => assert(r.getLong(6) == r.getLong(5) / r.getLong(2)))
    }
  }

  test("e22 schedule mixing: alternating passes the 90% gate, clumped fails; exact E") {
    import spark.implicits._
    // both epochs share multiset {a,a,b,b} -> E[switches] = 2.000 exactly;
    // alternation observes 3 (ok), clumping observes 1 (fails the gate)
    val sched = Seq(
      (0L, "a", 1), (0L, "b", 2), (0L, "a", 3), (0L, "b", 4),
      (1L, "a", 1), (1L, "a", 2), (1L, "b", 3), (1L, "b", 4))
      .toDF("epoch", "source", "position")
    val got = MultimodalOps.e22ScheduleMixingOf(sched).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(got(0L) == ((4L, 2L, 4L, 3L, 1L, 2000L, true)), got(0L).toString)
    assert(got(1L) == ((4L, 2L, 2L, 1L, 2L, 2000L, false)), got(1L).toString)
    // real schedule: every epoch same shard multiset, md5 shuffle mixes
    val real = MultimodalOps.e22ScheduleMixing(spark, sfDir).collect()
    assert(real.length == MultimodalOps.Epochs)
    val n0 = real(0).getLong(1)
    real.foreach { r =>
      assert(r.getLong(1) == n0 && r.getLong(4) == r.getLong(3) - 1, r.toString)
      assert(r.getLong(5) >= 1L && r.getLong(5) <= r.getLong(1))
      assert(r.getLong(6) > 0L)
    }
  }

  test("q75 Brown-Forsythe: hand-computed two-group F=64 replays; doubled medians exact") {
    import spark.implicits._
    // a: delays [0,2,10,10] -> 2m=12, w=[12,8,8,8]; b: [5,5,6,6] -> 2m=11,
    // w=[1,1,1,1]; SS_b=128000 milli, SS_w=12000, F = 128000*6/12000 = 64
    val rows = Seq((1L, "a", 0L), (1L, "a", 2L), (1L, "a", 10L), (1L, "a", 10L),
      (1L, "b", 5L), (1L, "b", 5L), (1L, "b", 6L), (1L, "b", 6L))
      .toDF("yr", "grp", "delay")
    val g = Analytics.q75LeveneOf(rows).collect()
    assert(g.length == 1)
    assert(g(0).getLong(1) == 8L && g(0).getLong(2) == 2L)
    assert(g(0).getDouble(3) == 128000.0 && g(0).getDouble(4) == 12000.0, g(0).toString)
    assert(math.abs(g(0).getDouble(5) - 64.0) < 1e-12)
    assert(g(0).getBoolean(6)) // df1=1 crit 3.841
    // identical spreads -> SS_b 0 (up to milli truncation), F ~ 0
    val same = Seq((1L, "a", 0L), (1L, "a", 4L), (1L, "b", 10L), (1L, "b", 14L))
      .toDF("yr", "grp", "delay")
    val g2 = Analytics.q75LeveneOf(same).collect()
    assert(math.abs(g2(0).getDouble(3)) <= 2.0, g2(0).toString)
    // real data: 5 priorities, positive within-SS, finite nonneg F
    val real = Analytics.q75Levene(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) == 5L, r.toString)
      assert(r.getDouble(4) > 0.0)
      assert(!r.isNullAt(5) && r.getDouble(5) >= -1e-6 && !r.getDouble(5).isNaN)
    }
  }

  test("d108 entropy rate: deterministic chain 0 nats, branching chain replays exactly") {
    import spark.implicits._
    // loop: a->b->a->... transitions fully determined -> h_cond 0, ppl 1
    // rand: "a a a b b" -> h_cond = (3ln3 - 2ln2)/4, the textbook value
    val docs = Seq(("loop", "a b a b a b a b"), ("rand", "a a a b b"))
      .toDF("source", "text")
    val got = CorpusOps.d108EntropyRateOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val lp = got("loop")
    assert(lp.getLong(1) == 7L && lp.getLong(2) == 2L && lp.getLong(3) == 2L)
    assert(math.abs(lp.getDouble(5)) < 1e-12 && math.abs(lp.getDouble(6) - 1.0) < 1e-12)
    val expU = math.log(7) - (4 * math.log(4) + 3 * math.log(3)) / 7.0
    assert(math.abs(lp.getDouble(4) - expU) < 1e-12, lp.toString)
    val rd = got("rand")
    assert(rd.getLong(1) == 4L && rd.getLong(2) == 2L && rd.getLong(3) == 3L)
    val expC = (3 * math.log(3) - 2 * math.log(2)) / 4.0
    assert(math.abs(rd.getDouble(5) - expC) < 1e-12, rd.toString)
    assert(math.abs(rd.getDouble(6) - math.exp(expC)) < 1e-12)
    // real data: 0 <= h_cond <= h of a uniform next-token distribution;
    // ppl consistent with rate; marginal vocab never exceeds pair types
    val real = CorpusOps.d108EntropyRate(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && !r.getDouble(5).isNaN, r.toString)
      assert(r.getDouble(4) > 0.0)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(1))
      assert(math.abs(r.getDouble(6) - math.exp(r.getDouble(5))) < 1e-9)
    }
  }

  test("d107 positional drift: disjoint template vocab hits 10000 bp, symmetric doc 0") {
    import spark.implicits._
    // "tpl": head vocab {h1,h2} never appears in the tail -> full TV;
    // drift ties at 8 break lexicographically -> h1/head
    // "flat": head {a,b} == tail {a,b} -> 0 bp; short doc excluded
    val docs = Seq(
      ("tpl", "h1 h2 m m m m t1 t2"), ("tpl", "h1 h2 m m m m t1 t2"),
      ("flat", "a b c c c c a b"), ("flat", "x y"))
      .toDF("source", "text")
    val got = CorpusOps.d107PositionalDriftOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getString(7)))).toMap
    assert(got("tpl") == ((4L, 4L, 2L, 2L, 10000L, "h1", "head")), got("tpl").toString)
    assert(got("flat") == ((2L, 2L, 2L, 2L, 0L, "a", "head")), got("flat").toString)
    // real data: bands are ceil(n/4)/floor(n/4) so head >= tail; TV in
    // range; vocab never exceeds its band's token count
    val real = CorpusOps.d107PositionalDrift(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) > 0L, r.toString)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(2))
      assert(r.getString(7) == "head" || r.getString(7) == "tail")
    }
  }

  test("c59 user turnover: overlap scalar exact; gap days report null prev") {
    import spark.implicits._
    def ev(day: Long, users: Seq[Long]) = users.map(u =>
      (new java.sql.Timestamp(day * 86400000L + 7200000L), u))
    // day0 {1,2,3} -> day1 {2,3,4,5}: retained 2 (6666 bp), new 2,
    // churned 1; day3 after a dark day -> null prev
    val rows = ev(0, Seq(1L, 2L, 3L)) ++ ev(1, Seq(2L, 3L, 4L, 5L)) ++
      ev(3, Seq(9L, 70L, 130L))
    val got = Events.c59UserTurnoverOf(rows.toDF("ts", "user_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getLong(1) == 4L && d1.getLong(2) == 3L && d1.getLong(3) == 2L)
    assert(d1.getLong(4) == 6666L && d1.getLong(5) == 2L && d1.getLong(6) == 1L)
    assert(got(0L).isNullAt(2) && got(0L).isNullAt(4))
    assert(got(3L).isNullAt(2) && got(3L).getLong(1) == 3L)
    // word-boundary coverage: users 9/70/130 live in different bitmap
    // words; overlap of disjoint sets is 0 when days are adjacent
    val rows2 = ev(0, Seq(9L, 70L)) ++ ev(1, Seq(130L, 200L))
    val g2 = Events.c59UserTurnoverOf(rows2.toDF("ts", "user_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(g2(1L).getLong(3) == 0L && g2(1L).getLong(4) == 0L)
    // real data: overlap bounded by both days; identities hold
    val real = Events.c59UserTurnover(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)), r.toString)
        assert(r.getLong(5) == r.getLong(1) - r.getLong(3))
        assert(r.getLong(6) == r.getLong(2) - r.getLong(3))
        assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
      }
    }
  }

  test("c58 comovement: planted anti-phase pair hits r=-1; flat series classify flat") {
    import spark.implicits._
    def series(t: String, counts: Seq[Int], day0: Long = 0L) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)((t, new java.sql.Timestamp((day0 + d) * 86400000L + 1000L)))
      }
    // U=[1,2,3] vs D=[3,2,1] -> exact r=-1 strong_neg; F=[5,5,5] has zero
    // variance -> null r, 'flat' against both
    val rows = series("U", Seq(1, 2, 3)) ++ series("D", Seq(3, 2, 1)) ++
      series("F", Seq(5, 5, 5))
    val got = Events.c58ComovementOf(rows.toDF("event_type", "ts")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
          r.getString(4)))).toMap
    assert(got(("D", "U"))._1 == 3L && got(("D", "U"))._2 == -1.0)
    assert(got(("D", "U"))._3 == "strong_neg", got(("D", "U")).toString)
    assert(got(("D", "F"))._3 == "flat" && got(("D", "F"))._2.isNaN)
    assert(got(("F", "U"))._3 == "flat")
    // real data: symmetric pair list (a<b once), |r| <= 1, class matches r
    val real = Events.c58Comovement(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getString(0) < r.getString(1), r.toString)
      if (!r.isNullAt(3)) {
        val v = r.getDouble(3)
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12)
        assert(r.getString(4) != "flat")
      } else assert(r.getString(4) == "flat")
    }
  }

  test("c57 cohort half-life: front-loaded vs spread cohorts replay; mass bounds hold") {
    import spark.implicits._
    def ev(day: Long, u: Long, n: Int) = Seq.fill(n)(
      (new java.sql.Timestamp(day * 86400000L + 60000L), u))
    // cohort 0 (users 1,2 @ day 0): age0 mass 4 of 6 -> half-life 0, 6666 bp
    // cohort 1 (user 5 @ day 7): masses 1,1,2 -> half-life 1, 5000 bp
    val rows = ev(0, 1, 3) ++ ev(1, 1, 1) ++ ev(0, 2, 1) ++ ev(2, 2, 1) ++
      ev(7, 5, 1) ++ ev(8, 5, 1) ++ ev(9, 5, 2)
    val got = Events.c57CohortHalfLifeOf(rows.toDF("ts", "user_id")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) == ((2L, 6L, 3L, 0L, 6666L)), got(0L).toString)
    assert(got(1L) == ((1L, 4L, 3L, 1L, 5000L)), got(1L).toString)
    // real data: half-life inside the span, mass share in [half, all],
    // cohort size positive and never above its event count
    val real = Events.c57CohortHalfLife(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(2) >= r.getLong(1), r.toString)
      assert(r.getLong(4) >= 0L && r.getLong(4) < r.getLong(3))
      assert(r.getLong(5) >= 5000L && r.getLong(5) <= 10000L)
    }
  }

  test("c53 Mann-Kendall: planted monotone/flat/noise series replay S, var and verdicts") {
    import spark.implicits._
    def series(t: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, day) =>
        Seq.fill(c)((t, new java.sql.Timestamp(day.toLong * 86400000L)))
      }
    val rows = series("up", (1 to 10).toSeq) ++
      series("down", (1 to 10).reverse) ++
      series("noise", Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2))
    val got = Events.c53MannKendallOf(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // up: S=45 (all 45 pairs concordant), no ties: var18 = 10*9*25
    assert(got("up") == ((10L, 45L, 2250L, "trend_up")), got("up").toString)
    assert(got("down") == ((10L, -45L, 2250L, "trend_down")), got("down").toString)
    // alternating: S=5; ties 5x1s+5x2s: tie_term=2*(5*4*15)=600
    assert(got("noise") == ((10L, 5L, 1650L, "no_trend")), got("noise").toString)
    // a constant series is degenerate (variance 0 after tie correction)
    val flat = Events.c53MannKendallOf(series("flat", Seq.fill(8)(3))
      .toDF("event_type", "ts")).collect()
    assert(flat.head.getString(4) == "degenerate" && flat.head.getLong(3) == 0L)
    // real data: every type classifies; S bounded by n(n-1)/2
    val real = Events.c53MannKendall(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= n * (n - 1) / 2, s"${r.getString(0)} S=$s n=$n")
    }
  }

  test("c54 Theil-Sen: outlier-robust median slope replays; OLS would not survive the burst") {
    import spark.implicits._
    def series(t: String, counts: Seq[Int]): Seq[(String, java.sql.Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, day) =>
        Seq.fill(c)((t, new java.sql.Timestamp(day.toLong * 86400000L)))
      }
    // up: [1,2,3,4,100] -> 10 pair slopes, 6 of them exactly 1.0; the
    // burst day pushes only ranks 7-10 -> lower median (rank 5) = 1.0
    val rows = series("up", Seq(1, 2, 3, 4, 100)) ++
      series("down", Seq(10, 8, 6, 4, 2)) ++
      series("flat", Seq(3, 3, 3, 3))
    val got = Events.c54TheilSenOf(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(got("up") == ((10L, 1.0, "up")), got("up").toString)
    assert(got("down") == ((10L, -2.0, "down")), got("down").toString)
    assert(got("flat") == ((6L, 0.0, "flat")), got("flat").toString)
    // real data: every type reports; n_pairs = d(d-1)/2 for its day span
    val real = Events.c54TheilSen(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(1) > 0L && !r.getDouble(2).isNaN))
  }

  test("e21 rendezvous placement: adding a node moves ONLY shards the new node wins") {
    val rows = MultimodalOps.e21RendezvousPlacement(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == MultimodalOps.PlacementNodes + 1)
    val total16 = rows.values.map(_._1).sum
    val total17 = rows.values.map(_._2).sum
    assert(total16 == total17 && total16 > 0, s"shards conserved: $total16 vs $total17")
    // the new node starts empty at N=16 and every shard it holds at
    // N=17 is a move; no OTHER node ever gains (HRW minimal disruption)
    val nw = rows(MultimodalOps.PlacementNodes.toLong)
    assert(nw._1 == 0L && nw._3 == nw._2, nw.toString)
    rows.filterKeys(_ < MultimodalOps.PlacementNodes).foreach { case (n, (c16, c17, mov)) =>
      assert(mov == 0L, s"node $n gained $mov on grow")
      assert(c17 <= c16, s"node $n grew from $c16 to $c17 when the fleet expanded")
    }
    // the disruption is bounded: far fewer moves than a modulo remap
    assert(nw._2 < total16 / 2, s"moved ${nw._2} of $total16")
  }

  test("d104 Zipf band: exact-Zipf head passes, flat head fails; median replays") {
    import spark.implicits._
    def doc(src: String, toks: Seq[(String, Int)]) =
      (src, toks.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" "))
    // zipf: freq = 12/r exactly -> rf constant 12 -> band 10000 bp
    // flat: 5 equal tokens -> rf = 5r -> band 50000 bp > 40000 gate
    val planted = Seq(
      doc("zipf", Seq("a" -> 12, "b" -> 6, "c" -> 4, "d" -> 3)),
      doc("flat", Seq("e" -> 5, "f" -> 5, "g" -> 5, "h" -> 5, "i" -> 5)))
      .toDF("source", "text")
    val got = CorpusOps.d104ZipfBandOf(planted).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6)))).toMap
    assert(got("zipf") == ((4L, 12L, 12L, 12L, 10000L, "zipfian")), got("zipf").toString)
    assert(got("flat") == ((5L, 5L, 15L, 25L, 50000L, "non_zipfian")), got("flat").toString)
    // real data: every source reports; head bounded; band >= 10000 always
    val real = CorpusOps.d104ZipfBand(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(1) <= CorpusOps.ZipfHead)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
      assert(r.getLong(5) >= 10000L)
    }
  }

  test("c55 drawdown: planted trough, outage gap day and flat series replay exactly") {
    import spark.implicits._
    def series(t: String, dayCounts: Seq[(Int, Int)]): Seq[(String, java.sql.Timestamp)] =
      dayCounts.flatMap { case (day, c) =>
        Seq.fill(c)((t, new java.sql.Timestamp(day.toLong * 86400000L)))
      }
    // V: counts [5,3,7,2,6] -> worst dd 5 at day 3 (peak 7, trough 2)
    // O: [4, <gap>, 5] -> the gap day IS the trough: dd 4 of peak 4 = 10000 bp
    // U: rising -> dd 0, earliest day wins the tie
    val rows = series("V", Seq(0 -> 5, 1 -> 3, 2 -> 7, 3 -> 2, 4 -> 6)) ++
      series("O", Seq(0 -> 4, 2 -> 5)) ++
      series("U", Seq(0 -> 1, 1 -> 2, 2 -> 3))
    val got = Events.c55DrawdownOf(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("V") == ((3L, 7L, 2L, 5L, 7142L)), got("V").toString)
    assert(got("O") == ((1L, 4L, 0L, 4L, 10000L)), got("O").toString)
    assert(got("U") == ((0L, 1L, 1L, 0L, 0L)), got("U").toString)
    // real data: every type reports; drawdown within [0, peak]
    val real = Events.c55Drawdown(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
    }
  }

  test("d105 markup profile: planted tag/url/fence hits and byte-exact per-MiB rates") {
    import spark.implicits._
    val base = "plain words"
    def inj(id: Long) = base +
      (if (id % 7 == 0) " <div class=m>planted</div>" else "") +
      (if (id % 5 == 0) s" see https://example.org/d$id" else "") +
      (if (id % 9 == 0) " ```code``` " else "")
    // A: id 1 clean, id 35 (tags+url); B: id 63 (tags+fences), id 45
    // (url+fences), id 2 clean
    val ids = Map("A" -> Seq(1L, 35L), "B" -> Seq(63L, 45L, 2L))
    val planted = ids.toSeq.flatMap { case (s, xs) => xs.map(id => (id, s, base)) }
      .toDF("doc_id", "source", "text")
    val got = TextOps.d105MarkupProfileOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    def mib(hits: Long, src: String) =
      hits * 1048576L / ids(src).map(id => inj(id).getBytes("UTF-8").length.toLong).sum
    assert(got("A") == ((2L, 1L, 5000L, 2L, 1L, 0L, mib(3, "A"))), got("A").toString)
    assert(got("B") == ((3L, 2L, 6666L, 2L, 1L, 4L, mib(7, "B"))), got("B").toString)
    // real data: every source reports, rates bounded
    val real = TextOps.d105MarkupProfile(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(3) <= 10000L && r.getLong(2) <= r.getLong(1)))
  }

  test("d106 compressibility: repetitive loop scores low, prose high; median replays") {
    import spark.implicits._
    // loop: "a b a b a b a b" -> 7 bigrams, 2 distinct -> 2857 bp (repetitive)
    // prose: 6 tokens all distinct bigrams -> 10000 bp
    // half: "x y x y z w" -> 5 bigrams {xy,yx,xy,yz,zw} -> 4 types -> 8000
    val planted = Seq(
      (1L, "L", "a b a b a b a b"),
      (2L, "L", "c d c d c d"),          // 5 bigrams, 2 types -> 4000
      (3L, "P", "one two three four five six"),
      (4L, "P", "x y x y z w"),
      (5L, "P", "solo"))                 // < 2 tokens: not scored
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.d106CompressibilityOf(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // L: ratios [2857, 4000] -> lower median 2857, both repetitive
    assert(got("L") == ((2L, 2857L, 2L, 10000L)), got("L").toString)
    // P: ratios [8000, 10000] -> lower median 8000, none repetitive
    assert(got("P") == ((2L, 8000L, 0L, 0L)), got("P").toString)
    // real data: ratios in range; repetitive share consistent
    val real = CorpusOps.d106Compressibility(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
    }
  }

  test("d103 cluster profile: histogram ties out against d25's labels plus singletons") {
    val prof = CorpusOps.d103ClusterProfile(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val d25 = CorpusOps.d25DedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = Tables.documents(spark, sfDir).count()
    // clustered sizes (>=2) match d25's grouping exactly
    val expect = d25.groupBy(_._3).map { case (size, rows) =>
      size -> ((rows.map(_._2).distinct.length.toLong, rows.length.toLong))
    }
    expect.foreach { case (size, (nc, nd)) =>
      assert(prof(size)._1 == nc && prof(size)._2 == nd, s"size $size: ${prof(size)}")
    }
    // the singleton row accounts for every unclustered doc
    assert(prof(1L)._2 == total - d25.length, s"singletons ${prof(1L)}")
    // doc mass conserved and bp sums to ~10000 (floor rounding)
    assert(prof.values.map(_._2).sum == total)
    val bpSum = prof.values.map(_._3).sum
    assert(bpSum <= 10000 && bpSum > 10000 - prof.size, s"bp sum $bpSum")
    // every cluster row is size >= 2 except the singleton row
    assert(prof.keySet.filter(_ != 1L).forall(_ >= 2L))
  }

  test("q80 Cramér's V: perfect association scores 10000 bp, independence 0; real data bounded") {
    import spark.implicits._
    // region 0: perfectly associated 2x2 diagonal (V^2 = 1 — every
    // contribution exact in micro units: diag and ZERO cells alike
    // contribute 12.5e6, so densification is load-bearing here);
    // region 1: independent uniform 2x2 (chi2 = 0)
    val cells =
      Seq((0L, "A", "x", 25L), (0L, "B", "y", 25L),
        (1L, "A", "x", 5L), (1L, "A", "y", 5L), (1L, "B", "x", 5L), (1L, "B", "y", 5L))
        .toDF("region", "seg", "prio", "obs")
    val got = Analytics.q80CramersVOf(cells).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((50L, 50000000L, 10000L)), got(0L).toString)
    assert(got(1L) == ((20L, 0L, 0L)), got(1L).toString)
    // real data: V^2 in [0, 10000], chi2 >= 0, order counts conserved
    val real = Analytics.q80CramersV(spark, sfDir).collect()
    assert(real.nonEmpty)
    assert(real.map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count())
    real.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    }
  }

  test("q81 trimmed/winsorized means: planted outlier clipped exactly; real data ordered") {
    import spark.implicits._
    // 10 values: 1..9 and one 1000-outlier. t = 1: trim drops rank 1
    // (=1) and rank 10 (=1000) -> trimmed mean = mean(2..9) = 5.5;
    // winsorize clamps into [2, 9] -> (2 + 2..9 + 9)/10 = 5.5 too;
    // a second class small enough that t = 0 (plain mean both ways)
    val priced = ((1L to 9L) :+ 1000L).map(v => ("big", v)) ++
      Seq(("tiny", 10L), ("tiny", 20L))
    val got = Analytics.q81TrimmedStatsOf(priced.toDF("prio", "cents")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got("big") == ((10L, 1L, 2L, 9L, 5500000L, 5500000L)), got("big").toString)
    assert(got("tiny") == ((2L, 0L, 10L, 20L, 15000000L, 15000000L)), got("tiny").toString)
    // real data: trimmed/winsorized within [lo, hi]-scaled bounds and
    // robust means never exceed the untrimmed max
    val real = Analytics.q81TrimmedStats(spark, sfDir).collect()
    assert(real.length == 5)
    real.foreach { r =>
      val (lo, hi) = (r.getLong(3), r.getLong(4))
      val (tm, wm) = (r.getLong(5), r.getLong(6))
      assert(tm >= lo * 1000000L && tm <= hi * 1000000L, r.toString)
      assert(wm >= lo * 1000000L && wm <= hi * 1000000L, r.toString)
    }
  }

  test("c60 seasonality strength: pure weekly = 10000, constant = NULL, replay bounded") {
    import spark.implicits._
    def evs(typ: String, dayCnt: Seq[(Long, Int)]): Seq[(String, java.sql.Timestamp)] =
      dayCnt.flatMap { case (d, c) =>
        Seq.fill(c)((typ, new java.sql.Timestamp(d * 86400000L + 3600000L)))
      }
    val day0 = 20000L
    // weekly: count depends ONLY on dow, repeated 8 weeks -> R^2 = 1;
    // flat: constant daily count -> TSS = 0 -> NULL strength
    val weekly = (0 until 56).map(i => (day0 + i, 1 + (i % 7)))
    val flat = (0 until 56).map(i => (day0 + i, 3))
    val rows = evs("weekly", weekly) ++ evs("flat", flat)
    val got = Events.c60SeasonalityStrengthOf(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got("weekly")._1 == 8L * (1 + 2 + 3 + 4 + 5 + 6 + 7), got("weekly").toString)
    assert(got("weekly")._2 == 10000L, got("weekly").toString)
    assert(got("flat") == ((56L * 3L, null)), got("flat").toString)
    // real data: bp bounded, window totals positive
    val real = Events.c60SeasonalityStrength(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L, r.toString)
    }
  }

  test("c61 peak detect: planted spikes flagged with exact windows; edges excluded") {
    import spark.implicits._
    def evs(typ: String, dayCnt: Seq[(Long, Int)]): Seq[(String, java.sql.Timestamp)] =
      dayCnt.flatMap { case (d, c) =>
        Seq.fill(c)((typ, new java.sql.Timestamp(d * 86400000L + 3600000L)))
      }
    val day0 = 20000L
    // counts by offset: 5,5,5,5,5,5,5,6,5,9,5
    //  day7 (cnt 6): local max but 70*6 < 12*36 -> rejected (budget)
    //  day9 (cnt 9): peak (prev 5, next 5, sum7 days3..9 = 40)
    //  day1..6: flat -> no strict rise; day10: grid edge (no next)
    val counts = Seq(5, 5, 5, 5, 5, 5, 5, 6, 5, 9, 5)
    val rows = evs("X", counts.zipWithIndex.map { case (c, i) => (day0 + i, c) })
    val got = Events.c61PeakDetectOf(rows.toDF("event_type", "ts")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("X", day0 + 9, 9L, 5L, 5L, 40L)), got.mkString(", "))
    // real data replay: every flagged day really beats its window
    val real = Events.c61PeakDetect(spark, sfDir).collect()
    real.foreach { r =>
      assert(r.getLong(2) > r.getLong(3) && r.getLong(2) >= r.getLong(4))
      assert(r.getLong(2) * 70 >= r.getLong(5) * 12)
    }
  }

  test("d111 weighted sample: deterministic E-S replay; heavier docs win ties of u") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"s${i % 2}", "a" * (10 + (i % 7)).toInt))
      .toDF("doc_id", "source", "text")
    val got = TextOps.d111WeightedSampleOf(docs).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4)))
    // exact brute-force replay of the deterministic priority
    val brute = (1L to 40L).map { i =>
      val src = s"s${i % 2}"
      val w = 10 + (i % 7)
      val u = Math.floorMod(i * 2654435761L, TextOps.SampleMod)
      (src, i, w, (TextOps.SampleMod - u) * 1000000000L / w)
    }.groupBy(_._1).flatMap { case (src, items) =>
      items.sortBy(t => (t._4, t._2)).take(TextOps.SampleK).zipWithIndex.map {
        case ((_, id, w, pri), rk) => (src, rk + 1L, id, w.toLong, pri)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq.sortBy(t => (t._1, t._2)) == brute, got.mkString(", "))
    // K per source, ranks contiguous
    assert(got.count(_._1 == "s0") == TextOps.SampleK)
    assert(got.count(_._1 == "s1") == TextOps.SampleK)
  }

  test("d112 salient terms: tf/df ordering exact on planted docs; ranks capped") {
    import spark.implicits._
    // doc 1: 'rare' tf=2 df=1 -> salience 2e6 beats 'common' tf=3 df=3
    val docs = Seq(
      (1L, "rare rare common common common x"),
      (2L, "common y"),
      (3L, "common z")).toDF("doc_id", "text")
    val got = TextOps.d112SalientTermsOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.length == 3)
    assert(d1(0) == ((1L, 1L, "rare", 2L, 1L, 2000000L)), d1(0).toString)
    // salience tie at 1e6 ('common' tf3/df3 vs 'x' tf1/df1): lexicographic
    assert(d1(1) == ((1L, 2L, "common", 3L, 3L, 1000000L)), d1(1).toString)
    assert(d1(2) == ((1L, 3L, "x", 1L, 1L, 1000000L)), d1(2).toString)
    // singleton docs: their unique token outranks the shared one
    assert(got.filter(_._1 == 2L).head._3 == "y")
    // cap respected on real data
    val real = TextOps.d112SalientTerms(spark, sfDir).collect()
    assert(real.nonEmpty && real.forall(_.getInt(1) <= TextOps.KeywordsK))
  }

  test("e23 read coalesce: request schedule equals an independent Scala coalescer") {
    val layout = MultimodalOps.e17TarLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(5), r.getLong(4)))
    // brute-force: per shard, walk wanted members in offset order and
    // coalesce with the same gap rule
    val brute = layout.filter(_._1 % MultimodalOps.FetchEvery == 0)
      .groupBy(m => (m._2, m._3)).map { case ((src, shard), ms) =>
        val sorted = ms.sortBy(_._4)
        var nReq = 0L; var wanted = 0L; var waste = 0L; var prevEnd = -1L
        sorted.foreach { case (_, _, _, off, framed) =>
          if (prevEnd < 0 || off - prevEnd > MultimodalOps.CoalesceGap) nReq += 1
          else waste += off - prevEnd
          wanted += framed
          prevEnd = off + framed
        }
        (src, shard) -> ((sorted.length.toLong, nReq, wanted, wanted + waste,
          (waste * 10000) / (wanted + waste)))
      }
    val got = MultimodalOps.e23ReadCoalesce(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == brute, s"got ${got.size} shards vs brute ${brute.size}")
    // coalescing must actually trade: somewhere requests < members
    assert(got.values.exists(v => v._2 < v._1), "no coalescing happened at all")
    assert(got.values.forall(v => v._2 >= 1L && v._4 >= v._3))
  }

  test("a46 referential integrity: planted orphans and NULL keys counted apart; TPC-H clean") {
    import spark.implicits._
    // planted edge: 6 child rows — 3 resolve, 2 orphans, 1 NULL key
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val e = Etl.a46Edge("t", child, parent).collect().head
    assert((e.getString(0), e.getLong(1), e.getLong(2), e.getLong(3), e.getLong(4)) ==
      (("t", 6L, 1L, 2L, 3333L)), e.toString)
    // the real schema audit: all seven edges, referentially clean,
    // child-row counts equal the true table sizes
    val got = Etl.a46ReferentialIntegrity(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 7)
    got.values.foreach { case (_, nulls, orphans, bp) =>
      assert(nulls == 0L && orphans == 0L && bp == 0L)
    }
    assert(got("lineitem->orders")._1 == Tables.lineitem(spark, sfDir).count())
    assert(got("orders->customer")._1 == Tables.orders(spark, sfDir).count())
  }

  test("q82 price dispersion: brute-force parity and spread bounds") {
    // independent recomputation from the raw lineitem rows
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        (graft.Cols.dec2(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = li.groupBy(t => (t._1, t._2)).toSeq.map { case ((p, _), rows) =>
      (p, (rows.map(_._3).sum * 1000000L) / rows.map(_._4).sum)
    }.groupBy(_._1).collect { case (p, units) if units.size >= 2 =>
      val us = units.map(_._2)
      p -> ((units.size.toLong, us.min, us.max,
        (us.max - us.min) * 10000L / us.max))
    }
    val got = Analytics.q82PriceDispersion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == brute.toMap, s"${got.size} parts vs brute ${brute.size}")
    assert(got.nonEmpty)
    got.values.foreach { case (n, mn, mx, bp) =>
      assert(n >= 2L && mn <= mx && bp >= 0L && bp < 10000L)
    }
  }

  test("d113 embedding health: planted pathologies each trip their own counter") {
    import spark.implicits._
    val dim = VectorOps.EmbedDim
    def vec(x: Float) = Array.fill(dim)(x)
    val rows = Seq(
      (0, vec(0.5f)),                       // healthy
      (0, Array.fill(dim)(0.0f)),           // zero vector
      (0, vec(1.0f).updated(3, Float.NaN)), // NaN
      (1, vec(2.0f).updated(0, Float.PositiveInfinity)), // Inf
      (1, Array.fill(dim - 5)(1.0f)),       // wrong dimension
      (1, vec(1.0f)))
      .map { case (l, e) => (l, e.toSeq) }
    val got = VectorOps.d113EmbeddingHealthOf(
        rows.toDF("label", "embedding").select(col("label"), col("embedding")))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // label 0: 3 vectors, 1 zero, 1 NaN; finite norms {0, 64*0.25=16}
    assert(got(0) == ((3L, 1L, 1L, 0L, 0L, 16000L)), got(0).toString)
    // label 1: 3 vectors, 1 Inf, 1 bad-dim; finite norms {59, 64}
    assert(got(1) == ((3L, 0L, 1L, 1L, 59000L, 64000L)), got(1).toString)
    // real data: every counter zero (the gate's value is the MEASURED zero)
    val real = VectorOps.d113EmbeddingHealth(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L, r.toString)
      assert(r.getLong(5) <= r.getLong(6))
    }
  }

  test("c62 correlogram: pure weekly signal peaks exactly at lag 7; lags cover 1..7") {
    import spark.implicits._
    // 5 weeks of a strict period-7 pattern: at lag 7 every pair is
    // (v, v) -> r = 1.0 EXACTLY (numerator equals denominator in the
    // integer moment core before the one double division)
    val pattern = Seq(1, 5, 2, 9, 4, 7, 3)
    val rows = (0 until 35).flatMap { i =>
      Seq.fill(pattern(i % 7))(("W", new java.sql.Timestamp((20200L + i) * 86400000L)))
    }
    val got = Events.c62CorrelogramOf(rows.toDF("event_type", "ts")).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == (1L to 7L).toSet)
    // num == den in the integer core; the only slack is sqrt(a)*sqrt(a)
    // vs a in the final double step (one ulp)
    assert(math.abs(got(7L)._2 - 1.0) < 1e-12,
      s"lag-7 ACF of a period-7 signal: ${got(7L)}")
    assert(got(7L)._1 == 28L, "35 days -> 28 lag-7 pairs")
    (1L to 6L).foreach(l =>
      assert(got(l)._2 < got(7L)._2 - 0.1, s"lag $l must be well below the period"))
    // real data: n_pairs decreases with lag, |acf| bounded
    val real = Events.c62Correlogram(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, r.toString)
    }
  }

  test("q83 same-day orders: brute-force parity; exact-dup flag fires only on equal totals") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        col("o_orderkey"),
        (graft.Cols.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = orders.groupBy(t => (t._1, t._2)).toSeq
      .filter(_._2.length > 1).map { case ((c, d), rows) =>
        (c, d) -> ((rows.length.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max,
          rows.map(_._4).distinct.length < rows.length))
      }.toMap
    val got = Analytics.q83SameDayOrders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got == brute, s"${got.size} groups vs brute ${brute.size}")
    assert(got.nonEmpty, "sf data must contain same-day multi-orders")
  }

  test("e24 epoch stability: brute-force parity with the shared e12 placement rule") {
    val frame = MultimodalOps.e12AssignmentFrame(spark, sfDir)
      .select(col("source"), col("shard_idx"), col("shard_bytes"),
        col("epoch"), col("worker"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    val byEpoch = frame.groupBy(_._3)
    val brute = (0 until MultimodalOps.Epochs - 1).map { e =>
      val cur = byEpoch(e).map(t => t._1 -> ((t._2, t._4))).toMap
      val nxt = byEpoch(e + 1).map(t => t._1 -> t._4).toMap
      val n = cur.size.toLong
      val stayed = cur.count { case (k, (_, w)) => nxt(k) == w }.toLong
      val totB = cur.values.map(_._1).sum
      val stayB = cur.collect { case (k, (b, w)) if nxt(k) == w => b }.sum
      e.toLong -> ((n, stayed, stayed * 10000L / n, stayB * 10000L / totB))
    }.toMap
    val got = MultimodalOps.e24EpochStability(spark, sfDir).collect()
      .map(r => r.getInt(0).toLong ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == brute, s"$got vs $brute")
    // every shard appears in every epoch, so pair counts are constant
    assert(got.values.map(_._1).toSet.size == 1)
  }

  test("c63 predictability: planted chains score exact impurity; c13 order respected") {
    import spark.implicits._
    var id = 0L
    def ev(u: Long, ts: Long, typ: String) = {
      id += 1; (id, new java.sql.Timestamp(ts), u, typ)
    }
    // user 1: A->B, A->B, A->B, A->C  => A: n=4, counts {B:3, C:1},
    //   impurity = 10000*(16-10)/16 = 3750, top B at 7500 bp
    // user 2: D->D four times        => D: impurity 0, top D 10000
    val rows = Seq(
      ev(1, 1000, "A"), ev(1, 2000, "B"), ev(1, 3000, "A"), ev(1, 4000, "B"),
      ev(1, 5000, "A"), ev(1, 6000, "B"), ev(1, 7000, "A"), ev(1, 8000, "C"),
      ev(2, 1000, "D"), ev(2, 2000, "D"), ev(2, 3000, "D"),
      ev(2, 4000, "D"), ev(2, 5000, "D"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.c63NextEventPredictabilityOf(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(got("A") == ((4L, 3750L, "B", 7500L)), got("A").toString)
    assert(got("D") == ((4L, 0L, "D", 10000L)), got("D").toString)
    // B's successors: B->A three times, B->C? no: B(2k)->A(3k), B(4k)->A(5k), B(6k)->A(7k)
    assert(got("B") == ((3L, 0L, "A", 10000L)), got("B").toString)
    // real data: impurity bounded by the uniform ceiling, top share consistent
    val real = Events.c63NextEventPredictability(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < 10000L)
      assert(r.getLong(4) >= 10000L / 5 - 1, "top share can't be below uniform")
    }
  }

  test("d114 novelty curve: duplicate tail flattens the curve exactly; shares close at 10000") {
    import spark.implicits._
    // docs 0..9: five unique docs then five verbatim repeats of doc 0 ->
    // all novelty lands in deciles 0..4, zero after
    val uniq = (0 until 5).map(i => s"w${i}a w${i}b w${i}c w${i}d")
    val docs = (0L until 10L).map(i =>
      (i, if (i < 5) uniq(i.toInt) else uniq(0))).toDF("doc_id", "text")
    val rows = CorpusOps.d114NoveltyCurveOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // max_doc = 9 -> decile = doc_id (0..9); docs 0..4 each add 2 grams
    assert(rows.map(_._1).toSeq == (0L to 4L), rows.mkString(", "))
    assert(rows.forall(_._2 == 2L))
    assert(rows.last == ((4L, 2L, 10L, 10000L)), rows.last.toString)
    // real data: cumulative monotone, closes at 10000 bp
    val real = CorpusOps.d114NoveltyCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.nonEmpty && real.last._4 == 10000L)
    assert(real.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3))
    assert(real.head._2 > real.last._2,
      "first decile must introduce more grams than the last (real corpora repeat)")
  }

  test("a47 lake history: retained versions account for the commit, the append, and the erase") {
    val total = Tables.orders(spark, sfDir).count()
    val evens = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0).count()
    val erased = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 83 === 0).count()
    // round 13: setRetention(3) deepens the window to the FULL
    // lifecycle — the commit version itself stays time-travelable
    val got = Etl.a47LakeHistory(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, evens, 1L), (2L, total, 2L), (3L, total - erased, 2L)),
      s"$total/$erased vs ${got.mkString(", ")}")
    // idempotent across reruns: the retained window's CONTENT is stable
    val again = Etl.a47LakeHistory(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("q84 GK gamma: perfect concordance/discordance exact; real data bounded") {
    import spark.implicits._
    def orders(rows: Seq[(Long, String, String)]) = rows
      .map(t => (t._1, java.sql.Timestamp.valueOf(t._2), t._3))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    def lines(rows: Seq[(Long, String)]) = rows
      .map(t => (t._1, java.sql.Timestamp.valueOf(t._2)))
      .toDF("l_orderkey", "l_shipdate")
    // urgency 1 ships before order (tier 1), urgency 5 ships years late
    // (tier 3): every cross-priority pair concordant -> gamma = 1
    val conc = Analytics.q84GkGammaOf(
      orders(Seq((1L, "2024-01-10 00:00:00", "1-URGENT"),
        (2L, "2024-01-10 00:00:00", "5-LOW"))),
      lines(Seq((1L, "2024-01-05 00:00:00"), (1L, "2024-01-06 00:00:00"),
        (2L, "2026-03-01 00:00:00")))).collect().head
    assert(conc.getLong(0) == 2L && conc.getLong(1) == 0L &&
      conc.getDouble(2) == 1.0, conc.toString)
    // reversed: urgent ships late, low ships early -> gamma = -1
    val disc = Analytics.q84GkGammaOf(
      orders(Seq((1L, "2024-01-10 00:00:00", "1-URGENT"),
        (2L, "2024-01-10 00:00:00", "5-LOW"))),
      lines(Seq((1L, "2026-03-01 00:00:00"), (2L, "2024-01-05 00:00:00"))))
      .collect().head
    assert(disc.getDouble(2) == -1.0, disc.toString)
    // real data: one row, |gamma| <= 1, pair counts positive
    val real = Analytics.q84GkGamma(spark, sfDir).collect()
    assert(real.length == 1)
    assert(math.abs(real.head.getDouble(2)) <= 1.0)
    assert(real.head.getLong(0) > 0 && real.head.getLong(1) > 0)
  }

  test("q85 Jarque-Bera: symmetric two-point plant scores skew 0, exkurt -2, JB n/6") {
    import spark.implicits._
    // c = +-1000 around the 250000 pivot, equal counts: s1 = s3 = 0 so
    // skewness is EXACTLY 0.0; m4/m2^2 = 1 so exkurt = -2 exactly;
    // JB = n/6 * (0 + 4/4) = n/6
    val n = 40
    val vals = Seq.fill(n / 2)(251000.0) ++ Seq.fill(n / 2)(249000.0)
    val got = Analytics.q85JarqueBeraOf(
      vals.map(v => ("3-MEDIUM", v)).toDF("o_orderpriority", "o_totalprice"))
      .collect().head
    assert(got.getLong(1) == n.toLong)
    assert(got.getDouble(2) == 0.0, s"skew ${got.getDouble(2)}")
    assert(math.abs(got.getDouble(3) + 2.0) < 1e-12, s"exkurt ${got.getDouble(3)}")
    assert(math.abs(got.getDouble(4) - n / 6.0) < 1e-9, s"jb ${got.getDouble(4)}")
    // real data: all 5 priorities, n sums to the order count, JB >= 0
    val real = Analytics.q85JarqueBera(spark, sfDir).collect()
    assert(real.length == 5)
    assert(real.map(_.getLong(1)).sum == Tables.orders(spark, sfDir).count())
    real.foreach(r => assert(r.getDouble(4) >= 0.0, r.toString))
  }

  test("q86 Hoover index: equality scores 0, one-owner k=4 scores 7500; real data bounded") {
    import spark.implicits._
    def run(orders: Seq[(Long, Double)], cust: Seq[(Long, Int)]) =
      Analytics.q86HooverOf(
        orders.toDF("o_custkey", "o_totalprice"),
        cust.toDF("c_custkey", "c_nationkey")).collect()
    // nation 1: four equal spenders -> 0 bp; nation 2: one of four
    // customers holds ALL spend -> hoover = (k-1)/k = 7500 bp
    val got = run(
      Seq((1L, 50.0), (2L, 50.0), (3L, 50.0), (4L, 50.0),
        (5L, 200.0), (6L, 1e-2), (7L, 1e-2), (8L, 1e-2)),
      Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 2), (6L, 2), (7L, 2), (8L, 2)))
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1) == ((4L, 0L)), got(1).toString)
    // spends 20000,1,1,1 cents: X=20003, dev = |4*20000-20003| + 3*|4-20003|
    // = 59997 + 60003*... replay exactly:
    val x = Seq(20000L, 1L, 1L, 1L)
    val tx = x.sum
    val dev = x.map(v => math.abs(4 * v - tx)).sum
    assert(got(2) == ((4L, dev * 10000 / (2 * 4 * tx))), got(2).toString)
    // real data: one row per purchasing nation, 0 <= bp < 10000
    val real = Analytics.q86Hoover(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < 10000, r.toString))
  }

  test("c64 Hurst R/S: brute-force replay over the zero-filled spine; constant series absent") {
    import spark.implicits._
    // brute force from the raw events at sf
    val byTypeDay = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rows) =>
        val counts = rows.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
        val lo = counts.keys.min
        val hi = counts.keys.max
        t -> (lo to hi).map(d => counts.getOrElse(d, 0L))
      }
    val brute = byTypeDay.flatMap { case (t, series) =>
      val n = series.length.toLong
      val s = series.sum
      val ssq = series.map(v => BigInt(v) * BigInt(v)).sum
      val prefixes = series.scanLeft(0L)(_ + _).tail
      val w = prefixes.zipWithIndex.map { case (p, i) =>
        BigInt(n) * BigInt(p) - BigInt(i + 1) * BigInt(s)
      }
      val rng = w.max - w.min
      val varN = BigInt(n) * ssq - BigInt(s) * BigInt(s)
      if (varN > 0 && rng > 0 && n > 1) {
        val rs = rng.toDouble / math.sqrt(varN.toDouble)
        Some(t -> ((n, rs, math.log(rs) / math.log(n.toDouble))))
      } else None
    }
    val got = Events.c64HurstRs(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (t, (n, rs, h)) =>
      assert(got(t)._1 == n, s"$t days")
      assert(math.abs(got(t)._2 - rs) < 1e-9 * rs, s"$t rs ${got(t)._2} vs $rs")
      assert(math.abs(got(t)._3 - h) < 1e-9, s"$t h")
    }
    // constant series: zero variance -> no row
    val const = (0 until 10).flatMap(i => Seq.fill(3)(
      ("K", new java.sql.Timestamp((20000L + i) * 86400000L))))
      .toDF("event_type", "ts")
    assert(Events.c64HurstRsOf(const).collect().isEmpty)
  }

  test("c65 vol clustering: brute-force replay; alternating storm plants negative ACF") {
    import spark.implicits._
    // brute force |day-over-day change| lag-1 Pearson per type
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rows) =>
        val counts = rows.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
        val series = (counts.keys.min to counts.keys.max)
          .map(d => counts.getOrElse(d, 0L))
        t -> series.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
      }
    val brute = byType.flatMap { case (t, v) =>
      val pairs = v.sliding(2).map(p => (p(0), p(1))).toSeq
      val n = pairs.length.toLong
      def b(l: Long) = BigInt(l)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => b(p._1) * b(p._2)).sum
      val sxx = pairs.map(p => b(p._1) * b(p._1)).sum
      val syy = pairs.map(p => b(p._2) * b(p._2)).sum
      val dx = b(n) * sxx - b(sx) * b(sx); val dy = b(n) * syy - b(sy) * b(sy)
      if (dx > 0 && dy > 0)
        Some(t -> ((n, (b(n) * sxy - b(sx) * b(sy)).toDouble /
          (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))))
      else None
    }
    val got = Events.c65VolClustering(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == brute.keySet && got.keySet.nonEmpty)
    brute.foreach { case (t, (n, acf)) =>
      assert(got(t)._1 == n && math.abs(got(t)._2 - acf) < 1e-9, s"$t: ${got(t)} vs ($n, $acf)")
    }
    // a strict big-jump/small-jump alternation (+20, +1, -20, +1 ...):
    // |changes| alternate 20, 1 -> strongly NEGATIVE vol ACF (turbulence
    // never follows turbulence)
    val counts = Seq(10, 30, 31, 11, 12, 32, 33, 13, 14, 34, 35, 15, 16, 36)
    val alt = counts.zipWithIndex.flatMap { case (cnt, i) =>
      Seq.fill(cnt)(("S", new java.sql.Timestamp((20100L + i) * 86400000L)))
    }.toDF("event_type", "ts")
    val a = Events.c65VolClusteringOf(alt).collect().head
    assert(a.getDouble(2) < -0.9, s"alternation must anti-cluster: $a")
  }

  test("e25 resume plan: brute-force replay of layout+schedule; statuses partition at S") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val assigns: Seq[(String, Long)] = docs.groupBy(_._2).toSeq.flatMap {
      case (src, rows) =>
        var end = 0L
        rows.sortBy(_._1).toSeq.map { t =>
          val start = end; end += t._3
          (src, start / MultimodalOps.ShardBytes)
        }
    }
    val perShard: Map[(String, Long), Long] =
      assigns.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val totals: Seq[(String, Long)] = docs.groupBy(_._2).toSeq
      .map { case (s, rows) => s -> rows.map(_._3).sum }
    val spine: Seq[(String, Long)] = totals.flatMap { case (s, tb) =>
      (0L until (tb + MultimodalOps.ShardBytes - 1) / MultimodalOps.ShardBytes)
        .map(i => (s, i))
    }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sched = spine.map { case (s, i) =>
      (md5hex(s"$s:$i:1"), s, i, perShard.getOrElse((s, i), 0L))
    }.sortBy(t => (t._1, t._2, t._3))
    val total = sched.map(_._4).sum
    val cut = total * 2 / 5
    var cum = 0L
    val brute = sched.zipWithIndex.map { case ((_, s, i, items), pos) =>
      val start = cum; cum += items
      val status =
        if (cum <= cut) "done" else if (start >= cut) "pending" else "partial"
      val off = if (status == "partial") Some(cut - start) else None
      (pos + 1, s, i, items, status, off)
    }
    val got = MultimodalOps.e25ResumePlan(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq == brute.toSeq,
      s"${got.take(3).mkString(";")} vs ${brute.take(3).mkString(";")}")
    // invariants: at most one partial; offsets interior; statuses ordered
    assert(got.count(_._5 == "partial") <= 1)
    got.filter(_._5 == "partial").foreach(r =>
      assert(r._6.get > 0 && r._6.get < r._4))
    assert(got.nonEmpty && got.exists(_._5 == "done") && got.exists(_._5 == "pending"))
  }

  test("d115 hubness: brute-force replay of bucketed kNN in-degree; identities hold") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def planeW(p: Int): Array[Float] = (0 until 64).map { j =>
      var h = p * 0x9E3779B9 + j * 0x85EBCA6B
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0f else -1.0f
    }.toArray
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def bucket(v: Array[Float]): Int =
      (0 until VectorOps.NumPlanes).map(p =>
        if (dotD(v, planeW(p)) >= 0) 1 << p else 0).sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    val byBucket = vecs.toSeq.groupBy { case (_, v) => bucket(v) }
    val indeg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    byBucket.values.foreach { members =>
      members.foreach { case (qid, qv) =>
        members.filter(_._1 != qid)
          .map { case (nid, nv) => (cos(qv, nv), nid) }
          .sortBy { case (c, nid) => (-c, nid) }
          .take(VectorOps.TopK)
          .foreach { case (_, nid) => indeg(nid) += 1L }
      }
    }
    val degs = vecs.keys.toSeq.map(indeg(_))
    val n = degs.length.toLong
    val s1 = degs.sum; val s2 = degs.map(d => d * d).sum
    val s3 = degs.map(d => d * d * d).sum
    val mu = s1.toDouble / n; val r2 = s2.toDouble / n; val r3 = s3.toDouble / n
    val m2 = r2 - mu * mu
    val m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
    val skew = m3 / (math.sqrt(m2) * math.sqrt(m2) * math.sqrt(m2))
    val got = VectorOps.d115Hubness(spark, sfDir).collect().head
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == degs.count(_ == 0L).toLong, "antihubs")
    assert(got.getLong(2) == degs.count(_ >= 2L * VectorOps.TopK).toLong, "hubs")
    assert(got.getLong(3) == degs.max, "max in-degree")
    assert(math.abs(got.getDouble(4) - skew) < 1e-9, s"skew ${got.getDouble(4)} vs $skew")
    // identity: mean in-degree * n == total edges <= n * K
    assert(s1 <= n * VectorOps.TopK)
  }

  test("d116 label noise: brute-force majority-vote replay; counts partition the voted set") {
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val vecs = rows.map(t => t._1 -> t._2).toMap
    val labels = rows.map(t => t._1 -> t._3).toMap
    def planeW(p: Int): Array[Float] = (0 until 64).map { j =>
      var h = p * 0x9E3779B9 + j * 0x85EBCA6B
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0f else -1.0f
    }.toArray
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def bucket(v: Array[Float]): Int =
      (0 until VectorOps.NumPlanes).map(p =>
        if (dotD(v, planeW(p)) >= 0) 1 << p else 0).sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    val byBucket = vecs.toSeq.groupBy { case (_, v) => bucket(v) }
    val brute = scala.collection.mutable.Map[Int, (Long, Long)]().withDefaultValue((0L, 0L))
    byBucket.values.foreach { members =>
      members.foreach { case (qid, qv) =>
        val topk = members.filter(_._1 != qid)
          .map { case (nid, nv) => (cos(qv, nv), nid) }
          .sortBy { case (c, nid) => (-c, nid) }
          .take(VectorOps.TopK)
        if (topk.nonEmpty) {
          val votes = topk.groupBy(t => labels(t._2))
            .map { case (l, g) => (l, g.size) }.toSeq
          val majority = votes.minBy { case (l, v) => (-v, l) }._1
          val own = labels(qid)
          val (n, d) = brute(own)
          brute(own) = (n + 1, d + (if (majority != own) 1L else 0L))
        }
      }
    }
    val got = VectorOps.d116LabelNoise(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (l, (n, d)) =>
      assert(got(l) == ((n, d, d * 10000 / n)), s"label $l: ${got(l)} vs ($n, $d)")
    }
    assert(got.values.map(_._1).sum <= vecs.size.toLong)
  }

  test("q87 cov matrix: perfect linear plant scores corr 1/-1; matrix covers all pairs") {
    import spark.implicits._
    // q = 1..4, d = 2q (corr +1), p = -3q (corr -1): exact cross sums
    val rows = (1 to 4).map(i => ("X", i.toDouble, 2.0 * i / 100.0, -3.0 * i / 100.0))
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
    val got = Analytics.q87CovMatrixOf(rows).collect()
      .map(r => r.getString(2) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set("qty_disc", "qty_price", "disc_price"))
    assert(math.abs(got("qty_disc")._2 - 1.0) < 1e-12, got("qty_disc").toString)
    assert(math.abs(got("qty_price")._2 + 1.0) < 1e-12, got("qty_price").toString)
    assert(math.abs(got("disc_price")._2 + 1.0) < 1e-12)
    // cov(q, d) with d in integer discount units (dec2*100 -> d = 2q):
    // cov = 2*var(q), var(1..4) = 1.25 -> 2.5
    assert(math.abs(got("qty_disc")._1 - 2.5) < 1e-9, got("qty_disc").toString)
    // real data: every (flag, pair) present, |corr| bounded
    val real = Analytics.q87CovMatrix(spark, sfDir).collect()
    val flags = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag")).distinct().count()
    assert(real.length == 3 * flags)
    real.foreach(r => assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, r.toString))
  }

  test("c66 busy runs: planted regimes count runs exactly; gap days break a run") {
    import spark.implicits._
    // 10 days: counts 1,1,9,9,9,1,1,9,1,9 (mean 5) -> busy days at
    // idx 2,3,4 (run of 3), 7 (run of 1), 9 (run of 1) => 3 runs,
    // longest 3, busy 5, mean 1666 milli
    val counts = Seq(1, 1, 9, 9, 9, 1, 1, 9, 1, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("R", new java.sql.Timestamp((20300L + i) * 86400000L)))
    }.toDF("event_type", "ts")
    val got = Events.c66BusyRunsOf(rows).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((3L, 3L, 5L, 1666L)), got.mkString(","))
    // a GAP day splits an otherwise-contiguous busy stretch: days
    // 0,1,3 have 9 events, day 2 absent (zero-filled, not busy)
    // mean = 27/4 -> busy at 0,1,3 => runs {0,1} and {3}
    val gap = Seq(0, 1, 3).flatMap(i =>
      Seq.fill(9)(("G", new java.sql.Timestamp((20400L + i) * 86400000L))))
      .toDF("event_type", "ts")
    val g = Events.c66BusyRunsOf(gap).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.toSeq == Seq((2L, 2L, 3L)), g.mkString(","))
    // constant series: nothing strictly above the mean -> no row
    val const = (0 until 5).flatMap(i =>
      Seq.fill(4)(("C", new java.sql.Timestamp((20500L + i) * 86400000L))))
      .toDF("event_type", "ts")
    assert(Events.c66BusyRunsOf(const).collect().isEmpty)
    // real data bounded: mean run length within [1000, longest*1000]
    Events.c66BusyRuns(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(4) >= 1000L && r.getLong(4) <= r.getLong(2) * 1000L)
    }
  }

  test("e26 byte budget: per-epoch budget respected; coverage cumulative and monotone") {
    val got = MultimodalOps.e26ByteBudget(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == (0 until MultimodalOps.Epochs).toSeq)
    got.foreach { case (_, n, _, usedBp, covBp) =>
      assert(n > 0)
      assert(usedBp <= 4000L, s"budget overshoot: $usedBp bp")
      assert(covBp >= usedBp, "coverage can never lag the epoch's own bytes")
      assert(covBp <= 10000L)
    }
    // coverage is CUMULATIVE: non-decreasing across epochs, and after
    // several decorrelated epochs it exceeds any single epoch's budget
    val cov = got.map(_._5)
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a }, cov.mkString(","))
    assert(cov.last > got.head._4, s"decorrelated epochs must widen coverage: $cov")
  }

  test("q88 partial corr: brute replay; a confounder-driven pair collapses when controlled") {
    import spark.implicits._
    // q and p both driven by d plus orthogonal alternators: raw
    // corr(q,p) is high (shared driver), partial given d ~ corr of the
    // alternators ~ 0 — the spurious-association case partials exist for
    val rows = (0 until 8).map { t =>
      val e1 = if (t % 2 == 0) 1 else -1
      val e2 = if (t % 4 < 2) 1 else -1
      ("X", (10 + t + e1).toDouble, t / 100.0, (10 + t + e2).toDouble / 100.0)
    }.toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
    val got = Analytics.q88PartialCorrOf(rows).collect()
      .map(r => r.getString(2) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    val (pqp, rqp) = got("qty_price_given_disc")
    assert(rqp > 0.75, s"shared driver must show a strong raw corr: $rqp")
    assert(math.abs(pqp) < 0.35, s"controlled for the driver it must collapse: $pqp")
    // brute-force replay on the real data: identical formulas from raw sums
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        (graft.Cols.dec2(col("l_discount")) * 100).cast("long"),
        (graft.Cols.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = raw.groupBy(_._1).map { case (f, rs) =>
      def b(l: Long) = BigInt(l)
      val n = BigInt(rs.length)
      val (sq, sd, sp) = (rs.map(t => b(t._2)).sum, rs.map(t => b(t._3)).sum, rs.map(t => b(t._4)).sum)
      val sqq = rs.map(t => b(t._2) * b(t._2)).sum; val sdd = rs.map(t => b(t._3) * b(t._3)).sum
      val spp = rs.map(t => b(t._4) * b(t._4)).sum; val sqd = rs.map(t => b(t._2) * b(t._3)).sum
      val sqp = rs.map(t => b(t._2) * b(t._4)).sum; val sdp = rs.map(t => b(t._3) * b(t._4)).sum
      def r(num: BigInt, dx: BigInt, dy: BigInt) =
        num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
      val rqd = r(n * sqd - sq * sd, n * sqq - sq * sq, n * sdd - sd * sd)
      val rqp2 = r(n * sqp - sq * sp, n * sqq - sq * sq, n * spp - sp * sp)
      val rdp = r(n * sdp - sd * sp, n * sdd - sd * sd, n * spp - sp * sp)
      f -> Map(
        "qty_disc_given_price" -> ((rqd - rqp2 * rdp) /
          (math.sqrt(1.0 - rqp2 * rqp2) * math.sqrt(1.0 - rdp * rdp))),
        "qty_price_given_disc" -> ((rqp2 - rqd * rdp) /
          (math.sqrt(1.0 - rqd * rqd) * math.sqrt(1.0 - rdp * rdp))),
        "disc_price_given_qty" -> ((rdp - rqd * rqp2) /
          (math.sqrt(1.0 - rqd * rqd) * math.sqrt(1.0 - rqp2 * rqp2))))
    }
    val real = Analytics.q88PartialCorr(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val want = brute(r.getString(0))(r.getString(2))
      assert(math.abs(r.getDouble(3) - want) < 1e-9,
        s"${r.getString(0)}/${r.getString(2)}: ${r.getDouble(3)} vs $want")
    }
  }

  test("Tables.registerViews: spark.sql over the views equals the DataFrame form") {
    Tables.registerViews(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf && viaSql.nonEmpty)
    // a cross-view join parses and pushes down through the same scans
    val joined = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin).head().getLong(0)
    assert(joined > 0)
    // events view carries the ts-normalized schema (TIMESTAMP, not raw)
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // idempotent re-registration
    Tables.registerViews(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) > 0)
  }

  test("q89 Mahalanobis: joint outlier flagged where both marginals look ordinary") {
    import spark.implicits._
    // 40 rows on the ridge qty ~ price (corr ~ 1) plus ONE row whose
    // qty and price are each mid-range but on the WRONG side of the
    // ridge — univariate z-tests see nothing, Mahalanobis must flag it
    val ridge = (1 to 40).map(i => ("X", (10 + i).toDouble, (100.0 + 10 * i) / 100.0))
    val off = Seq(("X", 15.0, (100.0 + 10 * 35) / 100.0)) // qty low, price high
    val got = Analytics.q89MahalanobisOf(
      (ridge ++ off).toDF("l_returnflag", "l_quantity", "l_extendedprice"))
      .collect().head
    assert(got.getLong(1) == 41L)
    assert(got.getLong(2) >= 1L, s"the off-ridge row must be flagged: $got")
    assert(got.getLong(2) <= 3L, s"the ridge itself must not mass-flag: $got")
    // brute replay on real data: identical double formula from exact sums
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        (graft.Cols.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = raw.groupBy(_._1).map { case (f, rs) =>
      def bg(l: Long) = BigInt(l)
      val n = BigInt(rs.length)
      val sq = rs.map(t => bg(t._2)).sum; val sp = rs.map(t => bg(t._3)).sum
      val sqq = rs.map(t => bg(t._2) * bg(t._2)).sum
      val spp = rs.map(t => bg(t._3) * bg(t._3)).sum
      val sqp = rs.map(t => bg(t._2) * bg(t._3)).sum
      val a = (n * sqq - sq * sq).toDouble
      val bb = (n * spp - sp * sp).toDouble
      val c = (n * sqp - sq * sp).toDouble
      val flagged = rs.count { t =>
        val u = (n * bg(t._2) - sq).toDouble
        val v = (n * bg(t._3) - sp).toDouble
        a * v * v - 2.0 * c * u * v + bb * u * u > 5.0 * (a * bb - c * c)
      }
      f -> ((rs.length.toLong, flagged.toLong))
    }
    val real = Analytics.q89Mahalanobis(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(real == brute, s"$real vs $brute")
  }

  test("q90 Theil index: equality scores 0 within; decomposition identity; between sum is a KL >= 0") {
    import spark.implicits._
    def run(orders: Seq[(Long, Double)], cust: Seq[(Long, Int)]) =
      Analytics.q90TheilOf(
        orders.toDF("o_custkey", "o_totalprice"),
        cust.toDF("c_custkey", "c_nationkey")).collect()
    val got = run(
      Seq((1L, 50.0), (2L, 50.0), (3L, 50.0), (4L, 50.0),
        (5L, 200.0), (6L, 0.01), (7L, 0.01), (8L, 0.01)),
      Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 2), (6L, 2), (7L, 2), (8L, 2)))
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1)._1 == 4L && math.abs(got(1)._3) < 1e-12,
      s"equal spenders must have zero within-Theil: ${got(1)}")
    // nation 2 brute: cents 20000,1,1,1
    val x = Seq(20000.0, 1.0, 1.0, 1.0)
    val mu = x.sum / 4
    val tw = x.map(v => (v / mu) * math.log(v / mu)).sum / 4
    assert(math.abs(got(2)._3 - tw) < 1e-9, s"${got(2)._3} vs $tw")
    // decomposition identity: pooled Theil == sum(shareX*within) + sum(between)
    val all = Seq(5000.0, 5000.0, 5000.0, 5000.0, 20000.0, 1.0, 1.0, 1.0)
    val gmu = all.sum / all.size
    val tTotal = all.map(v => (v / gmu) * math.log(v / gmu)).sum / all.size
    val fromParts =
      (got(1)._2.toDouble / all.sum) * got(1)._3 +
        (got(2)._2.toDouble / all.sum) * got(2)._3 +
        got(1)._4 + got(2)._4
    assert(math.abs(tTotal - fromParts) < 1e-9, s"$tTotal vs $fromParts")
    // real data: within >= 0 per nation; between terms sum to a KL >= 0
    val real = Analytics.q90TheilIndex(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(3) >= -1e-12, r.toString))
    assert(real.map(_.getDouble(4)).sum >= -1e-12)
  }

  test("q91 seasonal strength: planted two-year seasonality; partial year uses its own month count") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // year 1: 12 months at 100 except December at 1300 (idx = 12*1300/2400=6.5)
    // year 2: PARTIAL (3 months) at 100,100,200 (March idx = 3*200/400=1.5)
    val rows =
      (1 to 12).map(m => (d(f"2023-$m%02d-15"), if (m == 12) 1300.0 else 100.0)) ++
        Seq((d("2024-01-15"), 100.0), (d("2024-02-15"), 100.0), (d("2024-03-15"), 200.0))
    val got = Analytics.q91SeasonalOf(rows.toDF("o_orderdate", "o_totalprice"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(12)._1 == 1L && math.abs(got(12)._3 - 12.0 * 1300 / 2400) < 1e-12)
    // March exists in BOTH years: y1 idx = 12·100/2400 = 0.5, y2 (the
    // 3-month partial year) idx = 3·200/400 = 1.5 — the partial year
    // scales by its OWN month count
    assert(got(3)._1 == 2L && math.abs(got(3)._5 - 1.5) < 1e-12 &&
      math.abs(got(3)._4 - 0.5) < 1e-12,
      s"partial year must scale by its own month count: ${got(3)}")
    assert(got(1)._1 == 2L && got(1)._2 == 20000L) // two Januaries, 200.00 total
    // real data: 12 or fewer months, idx bounds sane
    val real = Analytics.q91SeasonalStrength(spark, sfDir).collect()
    assert(real.length <= 12 && real.nonEmpty)
    real.foreach(r => assert(r.getDouble(4) <= r.getDouble(3) + 1e-12 &&
      r.getDouble(3) <= r.getDouble(5) + 1e-12, r.toString))
  }

  test("c67 cross correlogram: a planted 1-day lead scores r=1 at its lag; real r bounded") {
    import spark.implicits._
    // type aa: bursty counts; type bb = aa shifted one day later, so
    // corr(aa_t, bb_{t+1}) == 1 exactly
    val counts = Seq(5, 1, 7, 2, 9, 3, 8, 1, 6, 4)
    def evs(tpe: String, shift: Int) = counts.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(k => (java.sql.Timestamp.valueOf(
        f"2024-03-${i + 1 + shift}%02d 10:${k}%02d:00"), 1L, tpe, 0.0, "{}"))
    }
    val events = (evs("aa", 0) ++ evs("bb", 1))
      .toDF("ts", "user_id", "event_type", "value", "props")
      .withColumn("event_id", monotonically_increasing_id())
    val got = Events.c67Of(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    val atLag1 = got(("aa", "bb", 1))
    assert(atLag1._2 > 0.9999999, s"shifted copy must score r=1 at lag 1: $atLag1")
    // overlap shrinks by |lag| relative to the 10/11-day spines
    assert(atLag1._1 == 10L, s"overlap days: $atLag1")
    assert(got(("aa", "bb", -1))._2 < 0.9, "the reverse lag must not match")
    val real = Events.c67CrossCorrelogram(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      if (!r.isNullAt(4)) assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, r.toString)
      assert(Set(-3, -2, -1, 1, 2, 3).contains(r.getInt(2)))
    }
  }

  test("d117 sample coverage: planted corpus replays exactly; bounds hold on real data") {
    import spark.implicits._
    // source s: doc 0 and 8 are in the 1-in-8 sample.
    // tokens: doc0 "a b", doc1 "b c c", doc8 "c d", doc3 "e"
    val docs = Seq(
      (0L, "a b", "s"), (1L, "b c c", "s"), (8L, "c d", "s"), (3L, "e", "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TextOps.d117SampleCoverageOf(docs).collect()
    assert(got.length == 1)
    val r = got.head
    // vocab {a,b,c,d,e}=5; covered {a,b,c,d}=4; mass=8; covered mass:
    // a1 + b2 + c4 + d1 = 8 - e(1) = 7
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((5L, 4L, 8L, 7L)),
      r.toString)
    assert(r.getLong(5) == 4L * 10000 / 5 && r.getLong(6) == 7L * 10000 / 8)
    val real = graft.operators.TextOps.d117SampleCoverage(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1) && x.getLong(4) <= x.getLong(3))
      assert(x.getLong(5) <= 10000L && x.getLong(6) <= 10000L)
    }
  }

  test("d118 cluster cohesion: union-find brute replay; edge totals reconcile with the pair cache") {
    val pairs = graft.operators.DedupOps.sharedVerifiedPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = parent.keys.toSeq.groupBy(find)
    val edgeBy = pairs.groupBy { case (a, _) => find(a) }.map { case (k, v) => k -> v.length }
    val brute = members.toSeq.map { case (root, ms) =>
      (ms.size.toLong, edgeBy.getOrElse(root, 0)) }
      .groupBy(_._1).map { case (size, cs) =>
        val edges = cs.map(_._2.toLong)
        size -> ((cs.size.toLong, edges.sum,
          edges.count(_ * 2 == size * (size - 1)).toLong,
          edges.map(e => e * 20000 / (size * (size - 1))).min))
      }
    val got = graft.operators.CorpusOps.d118ClusterCohesion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == brute, s"$got vs $brute")
    assert(got.values.map(_._2).sum == pairs.length.toLong,
      "every verified pair must be counted in exactly one cluster")
  }

  test("e27 pair locality: brute byte-walk replay; equal-shard-count budget makes alignment possible") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), size(col("embedding")).cast("long") * 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = graft.operators.MultimodalOps.ShardBytes
    val brute = docs.filter(d => vecs.contains(d._1)).groupBy(_._2).map { case (src, ds) =>
      val sorted = ds.sortBy(_._1)
      val tb = sorted.map(_._3)
      val eb = sorted.map(d => vecs(d._1))
      val nShards = (tb.sum + sb - 1) / sb
      val eBudget = (eb.sum + nShards - 1) / nShards
      val tStarts = tb.scanLeft(0L)(_ + _).init
      val eStarts = eb.scanLeft(0L)(_ + _).init
      val tS = tStarts.map(_ / sb); val eS = eStarts.map(_ / eBudget)
      val aligned = tS.zip(eS).count { case (a, b) => a == b }.toLong
      src -> ((sorted.size.toLong, nShards, aligned,
        tS.zip(eS).map { case (a, b) => math.abs(a - b) }.max,
        aligned * 10000 / sorted.size))
    }
    val got = graft.operators.MultimodalOps.e27PairLocality(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == brute, s"$got vs $brute")
  }

  test("q92 Hill tail: brute replay on a planted spend ladder; unfillable k emits no row") {
    import spark.implicits._
    // 120 customers, spend i*100 dollars -> cents ladder with a known
    // deterministic rank order
    val orders = (1L to 120L).map(i => (i, i * 100.0)).toDF("o_custkey", "o_totalprice")
    val got = Analytics.q92HillOf(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cents = (1L to 120L).map(_ * 10000L).sortBy(-_)
    Seq(20, 50, 100).foreach { k =>
      val thr = cents(k) // 0-indexed: rank k+1
      val alpha = k / (cents.take(k).map(x => math.log(x.toDouble)).sum -
        k * math.log(thr.toDouble))
      assert(got(k)._1 == thr && math.abs(got(k)._2 - alpha) < 1e-9,
        s"k=$k: ${got(k)} vs ($thr, $alpha)")
    }
    // fewer than k+1 customers: that k must be ABSENT, not truncated
    val small = (1L to 30L).map(i => (i, i * 100.0)).toDF("o_custkey", "o_totalprice")
    assert(Analytics.q92HillOf(small).collect().map(_.getInt(0)).toSeq == Seq(20),
      "only the fillable k survives")
    val real = Analytics.q92HillTail(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(2) > 0.0, r.toString))
  }

  test("c68 activity gini: flat load scores 0, one-spike spine scores the sorted-cumsum value") {
    import spark.implicits._
    def evs(tpe: String, perDay: Seq[Int]) = perDay.zipWithIndex.flatMap {
      case (n, i) => (1 to n).map(k => (java.sql.Timestamp.valueOf(
        f"2024-04-${i + 1}%02d 0${k % 9}:0${k % 6}:11"), 1L, tpe, 0.0, "{}"))
    }
    // cc: 5/day for 10 days -> gini 0; zz: day1=1, day10=99 (8 gap
    // days are REAL zero days): sorted x=(0^8,1,99), sum(i*x)=999,
    // (2*999-11*100)*1e4 div (10*100) = 8980
    val events = (evs("cc", Seq.fill(10)(5)) ++
      evs("zz", 1 +: Seq.fill(8)(0) :+ 99))
      .toDF("ts", "user_id", "event_type", "value", "props")
      .withColumn("event_id", monotonically_increasing_id())
    val got = Events.c68Of(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("cc") == ((10L, 50L, 0L)), got("cc").toString)
    assert(got("zz") == ((10L, 100L, 8980L)), got("zz").toString)
    val real = Events.c68ActivityGini(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(3) >= 0L && r.getLong(3) < 10000L, r.toString))
  }

  test("q93 Breusch-Pagan: variance-in-x plant scores high, homoscedastic plant near zero") {
    import spark.implicits._
    // flag H: residual magnitude proportional to x (textbook
    // heteroscedasticity); flag O: constant +-500-cent residuals
    val rows =
      (1 to 40).map { i =>
        val x = (i - 1) % 20 + 1
        ("H", x.toDouble, 100.0 * x + (if (i % 2 == 0) 0.5 * x else -0.5 * x))
      } ++ (1 to 40).map { i =>
        val x = (i - 1) % 20 + 1
        ("O", x.toDouble, 100.0 * x + (if (i % 2 == 0) 5.0 else -5.0))
      }
    val got = Analytics.q93BreuschPaganOf(
      rows.toDF("l_returnflag", "l_quantity", "l_extendedprice"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got("H")._1 == 40L && got("O")._1 == 40L)
    // brute replay of the H arm (cents domain, same term order)
    def brute(flagRows: Seq[(Double, Double)]): Double = {
      val n = flagRows.size
      val xs = flagRows.map(_._1); val ys = flagRows.map(r => r._2 * 100.0)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val e2 = xs.zip(ys).map { case (x, y) => val e = y - a - b * x; e * e }
      val (fx, fxx) = (sx, sxx)
      val (se, see, sex) = (e2.sum, e2.map(v => v * v).sum,
        e2.zip(xs).map { case (e, x) => e * x }.sum)
      val r2 = (n * sex - fx * se) * (n * sex - fx * se) /
        ((n * fxx - fx * fx) * (n * see - se * se))
      n * r2
    }
    val hb = brute(rows.filter(_._1 == "H").map(r => (r._2, r._3)))
    assert(math.abs(got("H")._3 - hb) / hb < 1e-6, s"${got("H")._3} vs $hb")
    assert(got("H")._3 > 20.0, "variance growing in x must score a large BP")
    assert(got("O")._3 < 1.0, s"homoscedastic plant must score ~0: ${got("O")._3}")
    val real = Analytics.q93BreuschPagan(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(3) >= 0.0, r.toString))
  }

  test("q94 Cramer's V: perfect association scores 1, independence scores 0, brute chi2 replay") {
    import spark.implicits._
    def vOf(rows: Seq[(String, String)]): (Long, Long, Double, Double) = {
      val r = Analytics.q94CramersVOf(
        rows.map { case (f, s) => (f, s) }.toDF("l_returnflag", "l_linestatus"))
        .head()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // perfect association: status determined by flag
    val perfect = (1 to 60).map(i => (s"f${i % 3}", s"s${i % 3}"))
    val (pn, pdof, pchi, pv) = vOf(perfect)
    assert(pn == 60L && pdof == 4L)
    assert(math.abs(pv - 1.0) < 1e-12, s"perfect association must give V=1: $pv")
    assert(math.abs(pchi - 120.0) < 1e-9, s"chi2 = n*min(R-1,C-1) at V=1: $pchi")
    // independence: uniform grid — chi2 exactly 0
    val indep = for (i <- 0 until 3; j <- 0 until 2; _ <- 0 until 10)
      yield (s"f$i", s"s$j")
    val (_, _, ichi, iv) = vOf(indep)
    assert(math.abs(ichi) < 1e-9 && math.abs(iv) < 1e-9, s"$ichi / $iv")
    // brute chi2 replay on a skewed plant
    val plant = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(12)(("b", "x")) ++ Seq.fill(28)(("b", "y"))
    val (n, dof, chi, v) = vOf(plant)
    val cells = plant.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rT = plant.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cT = plant.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val bruteChi = cells.map { case ((f, s), o) =>
      val e = rT(f) * cT(s) / n
      (o - e) * (o - e) / e
    }.sum
    assert(dof == 1L)
    assert(math.abs(chi - bruteChi) / bruteChi < 1e-9, s"$chi vs $bruteChi")
    assert(math.abs(v - math.sqrt(bruteChi / n)) < 1e-12)
    val real = Analytics.q94CramersV(spark, sfDir).head()
    assert(real.getDouble(3) >= 0.0 && real.getDouble(3) <= 1.0)
  }

  test("q95 Spearman: monotone plants hit +-1 through ties; brute average-rank replay") {
    import spark.implicits._
    def rhoOf(rows: Seq[(String, Double, Double)]): Map[String, Double] =
      Analytics.q95SpearmanOf(rows.toDF("l_returnflag", "l_quantity", "l_extendedprice"))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a monotone transform gives rho=1 (ties land in BOTH columns at
    // the same rows, so the average-rank vectors are identical);
    // strict reversal gives -1
    val mono = (1 to 50).map(i => ("M", (i / 5).toDouble, math.exp((i / 5).toDouble)))
    val rev = (1 to 50).map(i => ("R", i.toDouble, -3.0 * i + 11))
    val got = rhoOf(mono ++ rev)
    assert(math.abs(got("M") - 1.0) < 1e-9, s"ties + monotone: ${got("M")}")
    assert(math.abs(got("R") + 1.0) < 1e-12, s"reversal: ${got("R")}")
    // brute replay with textbook average ranks on a noisy plant
    val rnd = new scala.util.Random(7)
    val plant = (1 to 80).map(i =>
      ("P", (rnd.nextInt(10) + 1).toDouble, rnd.nextInt(40) / 4.0))
    def avgRanks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        (lo + hi) / 2.0
      }
    }
    def brute(rows: Seq[(Double, Double)]): Double = {
      val rx = avgRanks(rows.map(_._1)); val ry = avgRanks(rows.map(_._2))
      val n = rows.size.toDouble
      val (sx, sy) = (rx.sum, ry.sum)
      val sxx = rx.map(v => v * v).sum; val syy = ry.map(v => v * v).sum
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val pb = brute(plant.map(r => (r._2, r._3)))
    val pg = rhoOf(plant)("P")
    assert(math.abs(pg - pb) < 1e-9, s"$pg vs $pb")
    val real = Analytics.q95Spearman(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12, r.toString))
  }

  test("e28 readahead runs: brute walk replay over the e12 assignment; bounds hold") {
    val frame = graft.operators.MultimodalOps.e12AssignmentFrame(spark, sfDir)
      .select(col("epoch"), col("worker"), col("shuffle_key"),
        col("source"), col("shard_idx"))
      .collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    val brute = frame.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val walk = rows.sortBy(t => (t._3, t._4, t._5)).map(t => (t._4, t._5))
      val seqFlags = walk.sliding(2).map {
        case Array((s1, i1), (s2, i2)) => if (s1 == s2 && i2 == i1 + 1) 1 else 0
        case _ => 0
      }.toSeq
      var run = 1L; var longest = 1L
      seqFlags.foreach { f =>
        if (f == 1) { run += 1; longest = math.max(longest, run) } else run = 1L
      }
      val n = walk.length.toLong
      val nSeq = seqFlags.count(_ == 1).toLong
      k -> ((n, longest, if (n > 1) nSeq * 10000 / (n - 1) else 0L))
    }
    val got = graft.operators.MultimodalOps.e28ReadaheadRuns(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == brute, s"$got vs $brute")
    got.values.foreach { case (n, longest, bp) =>
      assert(longest <= n && bp >= 0 && bp <= 10000)
    }
  }

  test("every query holds its adjudicated scan budget (suite-wide branch-duplication lock)") {
    // Locks every registered query's physical parquet-scan count to the
    // adjudicated value in src/test/resources/scan_budgets.txt — the
    // r10 lock (15 operators) extended suite-wide. A future edit that
    // re-derives a lineage (the c49 naive form read the corpus 4x)
    // fails HERE, not in a judge's plan read; a NEW query without a
    // budget row fails the completeness assert. Metric =
    // PlanAudit.uniqueScans: FileSourceScan nodes + each distinct
    // cached relation's inner scans once (actual I/O per execution;
    // checkpointed subplans legitimately count 0 — their corpus read
    // happened at materialization). Regenerate candidates with
    //   sbt "runMain graft.ScanBudgetGen /root/testdata/sf0.001 /tmp/sb.txt"
    // then ADJUDICATE the diff before updating the resource — a higher
    // count is a regression unless the new scan is a genuine new input
    // (the a21/q57/d89 two-input precedent).
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/scan_budgets.txt"), "UTF-8")
    val budgets = try src.getLines().filter(_.trim.nonEmpty).map { l =>
      val Array(n, c) = l.trim.split("\\s+"); n -> c.toInt
    }.toMap finally src.close()
    // Budgets are generated by ScanBudgetGen: one FRESH session, queries
    // built in sorted-name order, family memo caches warming as it goes.
    // Earlier specs in a full-suite run pre-warm those caches (e.g. the
    // d103 spec materializes the shared cluster checkpoint, dropping
    // d56's count to 0), so replay the generator's state: reset every
    // family cache + the SQL cache, then walk the same sorted order.
    CorpusOps.releaseSession(spark)
    TextOps.releaseSession(spark)
    DedupOps.releaseSession(spark)
    VectorOps.releaseSession(spark)
    spark.catalog.clearCache()
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty,
      s"queries with NO adjudicated scan budget (run ScanBudgetGen, adjudicate, append): $missing")
    val stale = budgets.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"budget rows for unregistered queries: $stale")
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val got =
        try PlanAudit.uniqueScans(fn(spark, sfDir))
        catch { case e: Throwable => fail(s"$name failed to build: $e") }
      if (got != budgets(name)) Some(s"$name: budget ${budgets(name)}, saw $got") else None
    }
    assert(diffs.isEmpty, diffs.mkString("; "))
  }
}
