package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator properties for the pure algorithmic kernels
  * (SURVEY §5's property-test plan): the top-k Aggregator against the
  * sort-based specification, and the merge/reduce algebra partial
  * aggregation relies on. Uses seeded sampling (no scalatest-plus
  * bridge in the offline cache), so runs are deterministic.
  */
class PropertySpec extends AnyFunSuite {

  private val agg = new graft.functions.TopKDoubles(5)
  private val doubles: Gen[List[Double]] = Gen.listOf(Gen.chooseNum(-1e9, 1e9))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("TopKDoubles reduce-fold equals sorted take(k)") {
    samples(doubles, 200).foreach { xs =>
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      assert(got == xs.sortBy(-_).take(5), s"input $xs")
    }
  }

  test("TopKDoubles merge is equivalent to concatenated fold (partial-agg safety)") {
    val pairs = samples(Gen.zip(doubles, doubles), 200)
    pairs.foreach { case (a, b) =>
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == (a ++ b).sortBy(-_).take(5), s"inputs $a / $b")
    }
  }

  test("VecDot eval equals reference fold for arbitrary vectors") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vec = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    samples(Gen.zip(vec, vec), 200).foreach { case (a, b) =>
      val expr = graft.functions.VecDot(
        Literal.create(a.toArray, ArrayType(DoubleType)),
        Literal.create(b.toArray, ArrayType(DoubleType)))
      val got = expr.eval(null).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      assert(got == want, s"inputs $a / $b")
    }
  }

  test("SQ8 codec: round-trip error <= half-step for arbitrary value/range") {
    // the scalar spec of llm_ss_sq8/llm_ss_sq8_search's codec:
    // code = round((x-mn)/(mx-mn)*255), deq = mn + code*(mx-mn)/255
    def deq(x: Double, mn: Double, mx: Double): Double =
      if (mx == mn) mn
      else mn + math.round((x - mn) / (mx - mn) * 255).toDouble * (mx - mn) / 255.0
    val cases = samples(for {
      mn <- Gen.chooseNum(-1e3, 1e3)
      w <- Gen.chooseNum(0.0, 1e3)
      f <- Gen.chooseNum(0.0, 1.0)
    } yield (mn, mn + w, mn + w * f), 500)
    cases.foreach { case (mn, mx, x) =>
      val err = math.abs(x - deq(x, mn, mx))
      val halfStep = (mx - mn) / 255.0 / 2.0
      assert(err <= halfStep + 1e-9 * math.max(1.0, math.abs(mx)),
        s"x=$x in [$mn,$mx]: err $err > half-step $halfStep")
    }
  }
}
