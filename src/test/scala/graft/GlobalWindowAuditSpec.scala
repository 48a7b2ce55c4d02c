package graft

/** Global window audit — the round-11 verdict's closing assertion for
  * the NTILE retirement: NO registry query may run an UNPARTITIONED
  * window outside the reviewed bounded-spine allowlist below.
  *
  * An unpartitioned window (`Window [exprs], [order]` with no
  * partition clause in the executed plan) funnels its whole input
  * through one task; that is only legal when the input is BOUNDED by
  * construction — a k-row bucket/decile table, a score histogram
  * (feature-domain grain), a calendar spine (horizon grain), a
  * per-threshold grid. Every allowlisted name is annotated with its
  * bound; a new query that introduces a global window over anything
  * unbounded fails this sweep by name, which forces the review the
  * q61/q66/q72 NTILE windows originally escaped.
  *
  * Detection: in `executedPlan.toString`, a Window line prints
  * `Window [functions], [partitionCols], [orderCols]` when
  * partitioned and `Window [functions], [orderCols]` when global —
  * the bracket-group count separates them mechanically.
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
    */
  private val boundedSpine: Map[String, String] = Map(
    "llm_graph_bfs_hops" -> "dim: hop table, <= graph diameter rows",
    "llm_models_cost_curve" -> "hist: score histogram cuts (feature-domain grain)",
    "llm_models_gains" -> "hist: score histogram cumulative",
    "llm_pipeline_ivm_cost" -> "spine: per-day delta table, <= horizon days",
    "llm_sample_dsir" -> "dim: rank AFTER .limit(DsirTopK) - <= 64 rows",
    "llm_sample_pps" -> "bucket: size-bucket cumulative, <= bucket count",
    "llm_ta_bm25" -> "dim: rank AFTER .limit(10)",
    "llm_ta_coverage" -> "dim: rank AFTER .limit(CoverageKs.max) head table",
    "llm_ta_vocab_growth" -> "bucket: corpus-prefix bucket cumulative",
    "llm_ta_zipf" -> "dim: rank AFTER .limit(ZipfTopM)",
    "q101_order_backlog" -> "spine: month spine cumulative, <= horizon months",
    "q44_transitions" -> "hist: (prev,next) type-pair table, <= |types|^2",
    "q61_pareto_curve" -> "bucket: gnt_bkt offsets (<= 1024) + 10-row decile cum",
    "q66_quartile_migration" -> "bucket: gnt_bkt offsets (<= 1024), twice (two periods)",
    "q72_decile_lift" -> "bucket: gnt_bkt offsets (<= 1024) + 10-row decile cum",
    "q79_quarter_growth" -> "spine: quarter spine lag, <= horizon quarters",
    "st_arrival_rate" -> "spine: time-bucket spine lag, <= horizon buckets",
    "st_cusum_drift" -> "spine: per-day series cumulative, <= horizon days",
    "st_value_drift" -> "spine: per-day series, <= horizon days",
    "st_dow_anomaly" -> "spine: day-of-week profile, <= 7 x horizon rows",
    "st_new_vs_returning" -> "spine: per-day first-seen series, <= horizon days",
    "st_acf" -> "spine: per-bucket series x lag grid, horizon-bounded",
  )

  test("no unpartitioned window outside the bounded-spine allowlist") {
    // a window line prints `Window [fns], [partitionCols], [orderCols]`
    // when partitioned and `Window [fns], [orderCols]` when global;
    // partition-ONLY (unordered) windows also print two groups, so the
    // discriminator is the windowspecdefinition's FIRST argument: order
    // columns carry a sort direction, partition columns never do.
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN-ERROR: $e" }
      val globals = plan.split("\n").filter { l =>
        val t = l.replaceAll("^[\\s+:|-]*", "")
        t.startsWith("Window [") &&
          """windowspecdefinition\([^,()]+ (ASC|DESC) """.r
            .findFirstIn(t).isDefined
      }
      if (globals.nonEmpty && !boundedSpine.contains(name))
        offenders += s"$name:\n  ${globals.mkString("\n  ")}"
      graft.sources.Tables.releaseTransients(spark)
    }
    assert(offenders.isEmpty,
      s"${offenders.size} queries run an UNPARTITIONED window not in the " +
        "bounded-spine allowlist (add only after reviewing the bound):\n" +
        offenders.take(20).mkString("\n"))
  }
}
