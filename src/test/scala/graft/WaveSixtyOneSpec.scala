package graft

import org.apache.spark.sql.functions._

import graft.llm.{Graph, Models, Multimodal, Sampling}

/** Value-level invariants for the round-12 wave (mm resolution tiers /
  * caption stats / duration mix / band occupancy, per-lang token
  * quota, cost-sensitive operating points, degree Gini) — conservation
  * laws and naive-reference recounts the DuckDB oracle can't express.
  */
class WaveSixtyOneSpec extends SparkSpec {
  import spark.implicits._

  test("resolution tiers partition the corpus; shares sum to 1") {
    val rows = Multimodal.mmResolutionTiers(spark, sf0001).collect()
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == n)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // every tier label is one of the three canonical resolutions
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("256", "512", "1024")))
  }

  test("caption stats: captioned never exceeds docs; mean within cap") {
    Multimodal.mmCaptionStats(spark, sf0001).collect().foreach { r =>
      val (n, c) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_captioned"))
      assert(c <= n)
      if (c > 0) {
        val m = r.getAs[Double]("mean_caption_chars")
        assert(m >= 1.0 && m <= 128.0, s"mean caption $m outside [1,128]")
      }
    }
  }

  test("duration mix shares sum to 1 and minutes recount naively") {
    val rows = Multimodal.mmDurationMix(spark, sf0001).collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // naive per-doc recount of one source's total milliseconds
    val src = rows.head.getString(0)
    val ms = graft.sources.Tables.documents(spark, sf0001)
      .filter($"source" === src).select($"text").collect()
      .map(r => (r.getString(0).getBytes("UTF-8").length.toLong / 2) / 16)
      .sum
    assert(rows.head.getAs[Double]("total_minutes")
      == BigDecimal(ms / 60000.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("band occupancy conserves entries and matches the phash pair bill") {
    val rows = Multimodal.mmBandOccupancy(spark, sf0001).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    // each doc contributes exactly one entry per band
    (0 until 4).foreach { b =>
      val e = rows.filter(_.getAs[Int]("band") == b)
        .map(_.getAs[Long]("n_entries")).sum
      assert(e == nDocs, s"band $b holds $e entries for $nDocs docs")
    }
    // pair_mass is the exact candidate bill: sum over buckets of C(n,2)
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_mass") >= 0L)
      val (nb, ne) = (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_entries"))
      assert(ne >= nb, "a bucket holds at least one entry")
    }
  }

  test("lang quota: kept tokens fit the quota and the floor is real") {
    val rows = Sampling.sampleLangQuota(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kept, quota) =
        (r.getAs[Long]("tokens_kept"), r.getAs[Long]("quota_tokens"))
      assert(kept <= quota, s"${r.getString(0)}: kept $kept > quota $quota")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(quota <= r.getAs[Long]("tokens_total") * 3 / 10 + 1)
    }
    // greedy-by-quality: no skipped doc of strictly higher quality than
    // the floor may fit — verified per lang against a naive prefix
    val q = graft.llm.TextAnalysis.taQuality(spark, sf0001)
      .select($"doc_id", $"n_tokens".cast("long").as("tok"), $"quality")
      .join(graft.sources.Tables.documents(spark, sf0001)
        .select($"doc_id", $"lang"), "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok"),
        r.getAs[Double]("quality"), r.getString(3)))
    rows.foreach { lr =>
      val lang = lr.getString(0)
      val docs = q.filter(_._4 == lang)
        .sortBy(d => (-d._3, d._1))
      val quota = docs.map(_._2).sum * 3 / 10
      var cum = 0L; var nKept = 0L; var tokKept = 0L
      docs.foreach { d =>
        cum += d._2
        if (cum <= quota) { nKept += 1; tokKept += d._2 }
      }
      assert(lr.getAs[Long]("n_kept") == nKept, s"$lang n_kept")
      assert(lr.getAs[Long]("tokens_kept") == tokKept, s"$lang tokens_kept")
    }
  }

  test("cost curve: reported points are global cost minima") {
    val rows = Models.costCurve(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("cost_ratio")).toSeq == Seq(1L, 2L, 5L, 10L))
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cost")
        == r.getAs[Long]("fp") + r.getAs[Long]("cost_ratio") * r.getAs[Long]("fn"))
    }
    // the ratio-10 threshold can never sit ABOVE the ratio-1 threshold:
    // pricier false negatives only ever push the gate looser
    val t1 = rows.find(_.getLong(0) == 1L).get.getAs[Double]("threshold")
    val t10 = rows.find(_.getLong(0) == 10L).get.getAs[Double]("threshold")
    assert(t10 <= t1 + 1e-9, s"ratio-10 threshold $t10 above ratio-1 $t1")
    // confusion counts stay consistent with the class totals
    val n = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fp") +
      rows.head.getAs[Long]("tn") + rows.head.getAs[Long]("fn")
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp")
        + r.getAs[Long]("tn") + r.getAs[Long]("fn") == n)
    }
  }

  test("degree gini matches the naive per-node rank formula") {
    val rows = Graph.degreeGini(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("customer", "supplier"))
    // naive: collect degrees, sort asc, apply 2*sum(i*x)/(n*T)-(n+1)/n
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey")
    val l = graft.sources.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey")
    val pairs = o.join(l, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (nd, xs) => (nd, xs.length.toLong) }
    rows.foreach { r =>
      val side = r.getString(0)
      val ds = deg.filter { case (nd, _) =>
        (nd % 2 == 0) == (side == "customer") }.values.toSeq.sorted
      val n = ds.length.toLong
      val t = ds.sum
      val s2 = ds.zipWithIndex.map { case (x, i) =>
        BigInt(2) * (i + 1) * x }.sum
      val gini = (BigDecimal(s2) / (BigDecimal(n) * BigDecimal(t))
        - BigDecimal(n + 1) / BigDecimal(n)).toDouble
      assert(r.getAs[Long]("n_nodes") == n)
      assert(r.getAs[Long]("max_degree") == ds.max)
      assert(math.abs(r.getAs[Double]("gini")
        - BigDecimal(gini).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6,
        s"$side gini diverges")
    }
  }

  test("plan: lang quota never sorts a language globally; windows partition") {
    val plan = Sampling.sampleLangQuota(spark, sf0001)
      .queryExecution.executedPlan.toString
    // every window must partition by lang (bucket table) or
    // (lang, bkt) (boundary bucket) — a lang-wide or global sort of
    // doc rows is exactly what this op exists to avoid
    val winLines = plan.split("\n").filter(_.contains("windowspecdefinition"))
    assert(winLines.forall(_.matches(".*windowspecdefinition\\(lang#\\d+.*")),
      "window not partitioned by lang:\n" + winLines.mkString("\n"))
    assert(!plan.contains("Exchange SinglePartition")
      || !plan.contains("rangepartitioning(quality"),
      "doc rows funneled through a global quality sort:\n" + plan.take(900))
  }
}
