package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Graph, Models, Multimodal, Similarity, TextAnalysis}
import graft.operators.RelationalQueries

/** Value-level invariants for the round-8 second wave (the DuckDB
  * oracle covers exact values at the driver gate; these cover the
  * algebraic claims the oracle can't express: exact-once triangle
  * counting vs a naive reference, banding completeness for the
  * perceptual hash, bit-packing fidelity, share/total conservation).
  */
class WaveEightInvariantsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- triangles

  test("triangle census matches a naive all-triples reference") {
    val edges = graft.sources.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
      .as("a").join(
        graft.sources.Tables.lineitem(spark, sf0001)
          .select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2")).distinct()
          .as("b"),
        $"ok" === $"ok2" && $"sk" < $"sk2")
      .select($"sk".as("s1"), $"sk2".as("s2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var naive = 0L
    for {
      a <- nodes; b <- nodes if a < b && adj(a)(b)
      c <- nodes if b < c && adj(a)(c) && adj(b)(c)
    } naive += 1
    val row = Graph.triangles(spark, sf0001).head()
    // at sf0.001 the candidate set is far below the backbone cap, so
    // the backbone IS the full co-occurrence graph and the naive
    // reference needs no support ranking
    assert(row.getAs[Long]("n_candidate_edges") == edges.size)
    assert(row.getAs[Long]("n_candidate_edges") <= 2000L,
      "naive reference assumes the backbone cap does not engage at sf0.001")
    assert(row.getAs[Long]("n_triangles") == naive)
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_excluded_orders") == 0L)
    val cc = row.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0, s"cc=$cc")
  }

  // --------------------------------------------------------------- phash

  test("banded phash pairs equal the brute-force hamming<=3 definition") {
    val pairs = Multimodal.mmPhash(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference over the same hash definition, recomputed
    // independently from the raw text in Scala
    val hashes = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val pfx = r.getString(1).take(240).padTo(240, ' ')
        val bs = Array.tabulate(60)(b =>
          (0 until 4).map(i => pfx(b * 4 + i).toInt).sum)
        val mn = bs.sum.toDouble / 60.0
        val h = (0 until 60).foldLeft(0L)((acc, b) =>
          if (bs(b) > mn) acc + (1L << b) else acc)
        (r.getLong(0), h)
      }
    val naive = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ida, idb, d)).toSet
    assert(pairs == naive,
      s"banded=${pairs.size} naive=${naive.size} diff=${
        (pairs diff naive).take(3)} / ${(naive diff pairs).take(3)}")
  }

  // ---------------------------------------------------- binary hamming

  test("binary codes pack the sign pattern exactly") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val top = Similarity.ssBinaryHamming(spark, sf0001).collect()
    assert(top.nonEmpty)
    def code(v: Seq[Float]): Long =
      v.zipWithIndex.foldLeft(0L)((acc, p) =>
        if (p._1 > 0.0f) acc + (1L << p._2) else acc)
    top.foreach { r =>
      val (q, n, h) = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("hamming"))
      assert(java.lang.Long.bitCount(code(vecs(q)) ^ code(vecs(n))) == h)
    }
  }

  // ---------------------------------------------------------- logreg

  test("logistic probe model card is well-formed and beats coin flip on its own labels") {
    val row = Models.logreg(spark, sf0001).head()
    val n = row.getAs[Long]("n")
    val nPos = row.getAs[Long]("n_pos")
    val acc = row.getAs[Double]("accuracy")
    assert(n == graft.sources.Tables.documents(spark, sf0001).count())
    assert(nPos >= 0 && nPos <= n)
    assert(acc >= 0.0 && acc <= 1.0)
    Seq("w_chars", "w_words", "intercept").foreach { c =>
      assert(!row.getAs[Double](c).isNaN, s"$c is NaN")
    }
  }

  // ------------------------------------------------------- code detect

  test("code detector scores are bounded and line counts consistent") {
    val rows = TextAnalysis.taCodeDetect(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Double]("code_score")
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getAs[Int]("n_stmt_lines") <= r.getAs[Int]("n_lines"))
      assert(r.getAs[Int]("n_indent_lines") <= r.getAs[Int]("n_lines"))
      assert(r.getAs[Boolean]("is_code") == (score >= 0.5))
    }
  }

  // --------------------------------------------------------- graph ann

  test("beam search returns ranked, distinct, reachable neighbors deterministically") {
    val a = Similarity.ssGraphAnn(spark, sf0001).collect()
    val b = Similarity.ssGraphAnn(spark, sf0001).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "beam search must be deterministic across runs")
    a.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == rs.length)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y },
        "cosine must be non-increasing in rank")
    }
  }

  // -------------------------------------------------------------- q49

  test("q49 market shares are valid fractions of the market total") {
    val rows = RelationalQueries.q49MarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("nation_rev") <= r.getAs[Double]("market_rev"))
      assert(r.getAs[Long]("n_items") > 0)
    }
  }

  // ------------------------------------------------------ bloom filter

  test("bloom prefilter has zero false negatives and covers the whole batch") {
    val rows = Dedup.ddBloomPrefilter(spark, sf0001).collect()
    val nBatch = graft.sources.Tables.documents(spark, sf0001)
      .filter($"source" === "src0").count()
    assert(rows.length == nBatch)
    rows.foreach { r =>
      if (r.getAs[Boolean]("in_corpus"))
        assert(r.getAs[Boolean]("bloom_hit"),
          s"false negative at doc ${r.getAs[Long]("doc_id")} — impossible for a Bloom filter")
      val o = r.getAs[String]("outcome")
      assert(Set("true_positive", "false_positive", "true_negative")(o))
    }
  }

  // ---------------------------------------------------- heavy hitters

  test("count-min estimates never undercount (the CMS theorem) and track the true top") {
    val rows = TextAnalysis.taHeavyHitters(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS undercounted ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("cms_est") >=
        r.getAs[Long]("exact_count"))
    }
    // the exact side must agree with an independent count
    val top = rows.head
    val freq = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("t"))
      .filter($"t" === top.getAs[String]("term")).count()
    assert(top.getAs[Long]("exact_count") == freq)
  }

  // ----------------------------------------------------- dedup ledger

  test("dedup ledger reconciles with the corpus and the exact-dedup canon") {
    val rows = graft.llm.Pipeline.dedupLedger(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n,
      "every doc must appear in exactly one ledger cell")
    // exact-removal mass across the ledger equals the non-canonical
    // copy mass ddExact reports
    val exactRemoved = rows.filter(_.getAs[String]("status") == "removed_exact")
      .map(_.getAs[Long]("n_docs")).sum
    val copies = graft.llm.Dedup.ddExact(spark, sf0001).collect()
      .map(r => r.getAs[Long]("n_copies") - 1).sum
    assert(exactRemoved == copies)
    rows.foreach { r =>
      val f = r.getAs[Double]("frac")
      assert(f > 0.0 && f <= 1.0)
    }
  }

  // -------------------------------------------------------------- q50

  test("q50 histogram covers every customer exactly once, including zero-order ones") {
    val rows = RelationalQueries.q50OrderHistogram(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nCust = graft.sources.Tables.customer(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    val weighted = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    assert(weighted == graft.sources.Tables.orders(spark, sf0001).count(),
      "count-weighted histogram mass must equal the order count")
  }

  // ------------------------------------------------------- q46 / q47

  test("q46 promo shares are percentages and monthly revenue sums to the corpus total") {
    val rows = RelationalQueries.q46PromoEffect(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("promo_share_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Double]("promo_rev") <= r.getAs[Double]("total_rev"))
    }
    val monthly = BigDecimal(rows.map(_.getAs[Double]("total_rev")).sum)
    val flat = graft.sources.Tables.lineitem(spark, sf0001)
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,6)")).cast("double")).head().getDouble(0)
    assert((monthly - flat).abs < 1e-3, s"monthly=$monthly flat=$flat")
  }

  // ------------------------------------------------------------- mmr

  test("MMR picks are distinct members of the relevance shortlist, rank 1 = argmax relevance") {
    val rows = Similarity.ssMmr(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == 3)
      val r1 = rs.find(_.getAs[Int]("rank") == 1).get
      // rank 1 is the pure-relevance argmax: its relevance bounds the rest
      assert(rs.forall(_.getAs[Double]("relevance")
        <= r1.getAs[Double]("relevance")))
      assert(r1.getAs[Double]("mmr_score") == r1.getAs[Double]("relevance"))
    }
  }

  // ------------------------------------------------------- eff tokens

  test("effective tokens never exceed raw tokens and shrinkage is bounded") {
    val rows = graft.llm.Pipeline.effTokens(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("eff_tokens") <=
        r.getAs[Long]("n_tokens").toDouble + 1e-6)
      val s = r.getAs[Double]("token_shrinkage")
      assert(s >= 0.0 && s < 1.0, s"shrinkage=$s")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.sources.Tables.documents(spark, sf0001).count())
  }

  // ------------------------------------------------------------- q48

  test("q48 returns exactly the suppliers achieving the window-revenue max") {
    val res = RelationalQueries.q48TopSupplier(spark, sf0001).collect()
    assert(res.nonEmpty)
    val revs = graft.sources.Tables.lineitem(spark, sf0001)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        && $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .groupBy($"l_suppkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,6)")).cast("double").as("rev"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mx = revs.map(_._2).max
    val expect = revs.filter(_._2 == mx).map(_._1).sorted.toSeq
    assert(res.map(_.getAs[Long]("s_suppkey")).toSeq == expect)
    res.foreach(r => assert(r.getAs[Double]("total_rev") == mx))
  }

  test("q47 small-quantity line count is a strict subset of the fact") {
    val row = RelationalQueries.q47SmallQtyRevenue(spark, sf0001).head()
    val nAll = graft.sources.Tables.lineitem(spark, sf0001).count()
    assert(row.getAs[Long]("n_small_lines") < nAll)
    assert(row.getAs[Long]("n_parts") <=
      graft.sources.Tables.part(spark, sf0001).count())
    assert(row.getAs[Double]("avg_yearly") >= 0.0)
  }
}
