package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftPlanShim
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Global window audit — the round-11 verdict's closing assertion for
  * the NTILE retirement: NO registry query may run an UNPARTITIONED
  * window outside the reviewed bounded-spine allowlist below.
  *
  * An unpartitioned window (logical `Window` with an empty
  * partitionSpec) funnels its whole input through one task; that is
  * only legal when the input is BOUNDED by construction — a k-row
  * bucket/decile table, a score histogram (feature-domain grain), a
  * calendar spine (horizon grain), a per-threshold grid. Every
  * allowlisted name carries its bound class AND a numeric row cap,
  * and a second test EXECUTES each global window's child to assert
  * the measured input row count stays under the cap (round-12 verdict
  * item 2: review-asserted bounds are one wrong annotation away from
  * silently reintroducing the q61-class funnel; measured bounds are
  * not).
  *
  * Detection walks the OPTIMIZED logical plan with
  * `collectWithSubqueries` — the earlier executed-plan regex
  * (`windowspecdefinition\([^,()]+ (ASC|DESC)`) only matched windows
  * whose first ORDER BY expression was a bare attribute, so a global
  * window ordered by a composite expression silently passed the very
  * audit this spec exists to enforce (round-12 ADVICE item 1).
  */
class GlobalWindowAuditSpec extends SparkSpec {

  /** Queries whose global windows are bounded-spine by construction —
    * reviewed per entry. The bound class is one of:
    *   bucket   — k-row quality/decile/size bucket table (k ≤ 32)
    *   hist     — score/value histogram (feature-domain grain: the
    *              distinct-score table of a 2-feature probe, the
    *              bounded gap/day/priority domains)
    *   spine    — calendar/threshold spine (horizon or literal grid)
    *   dim      — a genuinely dimension-bounded table (≤ |nation|,
    *              ≤ |priority|, top-k output, ≤ vocab cutoff)
    * The Long is the measured-bound cap: the maximum rows ANY of the
    * query's global windows may receive, asserted by execution below.
    * Caps are structural (SF-independent by construction) — set from
    * the bound class's worst case, not from one fixture's reading.
    */
  private val boundedSpine: Map[String, (String, Long)] = Map(
    "llm_graph_bfs_hops" -> ("dim: hop table, <= graph diameter rows", 64L),
    "llm_graph_eff_diameter" -> ("dim: hop histogram, <= hops+1 rows", 64L),
    "llm_models_cost_curve" -> ("hist: score histogram cuts (feature-domain grain)", 4096L),
    "llm_models_gains" -> ("hist: score histogram cumulative", 4096L),
    "llm_pipeline_ivm_cost" -> ("spine: per-day delta table, <= horizon days", 4096L),
    "llm_sample_dsir" -> ("dim: rank AFTER .limit(DsirTopK) - <= 64 rows", 64L),
    "llm_sample_pps" -> ("bucket: size-bucket cumulative, <= bucket count", 64L),
    "llm_ta_bm25" -> ("dim: rank AFTER .limit(10)", 10L),
    "llm_ta_coverage" -> ("dim: rank AFTER .limit(CoverageKs.max) head table", 2048L),
    "llm_ta_vocab_growth" -> ("bucket: corpus-prefix bucket cumulative", 1024L),
    "llm_ta_zipf" -> ("dim: rank AFTER .limit(ZipfTopM)", 2048L),
    "q101_order_backlog" -> ("spine: month spine cumulative, <= horizon months", 256L),
    "q61_pareto_curve" -> ("bucket: gnt_bkt offsets (<= 1024) + 10-row decile cum", 1025L),
    "q66_quartile_migration" -> ("bucket: gnt_bkt offsets (<= 1024), twice (two periods)", 1025L),
    "q72_decile_lift" -> ("bucket: gnt_bkt offsets (<= 1024) + 10-row decile cum", 1025L),
    "q79_quarter_growth" -> ("spine: quarter spine lag, <= horizon quarters", 256L),
    "st_arrival_rate" -> ("spine: time-bucket spine lag, <= horizon buckets", 8192L),
    "st_cusum_drift" -> ("spine: per-day series cumulative, <= horizon days", 4096L),
    // q44_transitions, st_acf, st_dow_anomaly, st_new_vs_returning and
    // st_value_drift were allowlisted through round 12 but their
    // windows are PARTITIONED (user/type grain) in the current tree —
    // the stale-entry assertion below evicted them when this spec
    // moved from plan-text regexes to logical-plan node walks.
  )

  /** A window is a single-task funnel when its partitionSpec is empty
    * OR entirely foldable (partitionBy(lit(1)) routes every row to one
    * key — the same funnel wearing a partition clause). */
  private def globalWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: Window if w.partitionSpec.forall(_.foldable) => w
    }

  test("no unpartitioned window outside the bounded-spine allowlist") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val wins =
        try globalWindows(fn(spark, sf0001))
        catch { case e: Throwable => fail(s"$name: plan error $e") }
      if (wins.nonEmpty && !boundedSpine.contains(name))
        offenders += s"$name: ${wins.size} global window(s), e.g. " +
          wins.head.simpleString(120)
      graft.sources.Tables.releaseTransients(spark)
    }
    assert(offenders.isEmpty,
      s"${offenders.size} queries run an UNPARTITIONED window not in the " +
        "bounded-spine allowlist (add only after reviewing the bound):\n" +
        offenders.take(20).mkString("\n"))
  }

  /** Measured bounds: execute each allowlisted query's global-window
    * CHILD subtrees and assert their row counts stay under the cap.
    * Runs at sf0.01 (10x the sweep fixture) by default; point
    * GRAFT_WINDOW_BOUND_DIR at a replicated scale16/scale64 fixture
    * to produce the at-scale evidence draw (archived in
    * docs/bench/NOTES.md) — the caps are structural, so the assertion
    * is the same at every SF. Also fails on a STALE allowlist entry
    * (query no longer runs any global window), which keeps the
    * allowlist an honest inventory rather than a growing grant list.
    */
  test("allowlisted global windows stay within their measured caps") {
    val dir = sys.env.getOrElse("GRAFT_WINDOW_BOUND_DIR",
      "/root/testdata/sf0.01")
    val report = scala.collection.mutable.ListBuffer[String]()
    val failures = scala.collection.mutable.ListBuffer[String]()
    boundedSpine.toSeq.sortBy(_._1).foreach { case (name, (note, cap)) =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"allowlist names unknown query $name"))
      val wins = globalWindows(fn(spark, dir))
      if (wins.isEmpty)
        failures += s"$name: STALE allowlist entry - no global window in plan"
      val counts = wins.map { w =>
        GraftPlanShim.ofRows(spark, w.child).count()
      }
      counts.filter(_ > cap).foreach { n =>
        failures += s"$name: global-window input $n rows > cap $cap ($note)"
      }
      if (counts.nonEmpty)
        report += s"$name: max input ${counts.max} / cap $cap"
      graft.sources.Tables.releaseTransients(spark)
    }
    info(s"window-bound readings at $dir:\n  " + report.mkString("\n  "))
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
