package graft.pipeline

import graft.SparkSpec
import graft.pipeline.typed.TypedAggs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Typed Aggregator laws (ScalaCheck) + the Spark udaf execution path.
  *
  * The laws are the `AggregateOperation` contract Jet's two-stage aggregation
  * depends on (reference: aggregate/AggregateOperation.java:87-103 —
  * combineFn must be associative/commutative, and accumulate-then-combine
  * over any partitioning must equal a single-pass accumulate). Spark's
  * partial+final hash aggregation assumes exactly the same algebra, so these
  * properties are what make the udaf path correct under ANY shuffle layout.
  */
class TypedAggsSpec extends SparkSpec {

  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("topN: partition-split accumulate+merge == single-pass accumulate") {
    val agg = TypedAggs.topN(5)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1e6, 1e6))
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    check("topN split", Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(whole) == agg.finish(split)
    })
  }

  test("topN: merge is commutative") {
    val agg = TypedAggs.topN(3)
    val bufGen = Gen.listOf(Gen.chooseNum(-1e3, 1e3)).map(_.foldLeft(agg.zero)(agg.reduce))
    check("topN comm", Prop.forAll(bufGen, bufGen) { (a, b) =>
      agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a))
    })
  }

  test("linearTrend: merge associativity within float tolerance; stable at large x offsets") {
    val agg = TypedAggs.LinearTrend
    // the central-moment (Welford/Chan) form trades BITWISE merge
    // associativity (which the old raw-sum form had on integer inputs) for
    // numerical stability — the law here is associativity of the FINISHED
    // slope within float tolerance, which is what two-phase aggregation
    // actually requires of the result
    val ptGen = Gen.zip(Gen.chooseNum(-1000, 1000).map(_.toDouble),
                        Gen.chooseNum(-1000, 1000).map(_.toDouble))
    val bufGen = Gen.listOf(ptGen).map(_.foldLeft(agg.zero)(agg.reduce))
    def close(x: Option[Double], y: Option[Double]): Boolean = (x, y) match {
      case (None, None) => true
      case (Some(a), Some(b)) => math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a))
      case _ => false
    }
    check("trend assoc", Prop.forAll(bufGen, bufGen, bufGen) { (a, b, c) =>
      close(agg.finish(agg.merge(agg.merge(a, b), c)),
        agg.finish(agg.merge(a, agg.merge(b, c))))
    })
    // the stability payoff: x = unix-timestamp-sized offsets, spread 3600 —
    // the raw moment-sum form loses every significant digit here
    val big = (0 until 1000).map(i => (1.7e9 + i * 3.6, 2.5 * (1.7e9 + i * 3.6) + 7.0))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    val slope = agg.finish(buf).get
    assert(math.abs(slope - 2.5) < 1e-6, s"unstable slope at large offset: $slope")
  }

  test("reducing: split == whole for associative combine") {
    val agg = TypedAggs.reducing(0L)(_ + _)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    check("reducing split", Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)) == whole
    })
  }

  test("kmvDistinct: split == whole, and estimate is near exact count") {
    val agg = TypedAggs.kmvDistinct(64)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0.0, 1.0))
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    check("kmv split", Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(whole) == agg.finish(split)
    })
    // accuracy on a real-ish cardinality: 2000 distinct deterministic hashes
    val rnd = new scala.util.Random(7)
    val est = agg.finish((1 to 2000).map(_ => rnd.nextDouble()).foldLeft(agg.zero)(agg.reduce))
    assert(math.abs(est - 2000) / 2000.0 < 0.3, s"estimate $est too far from 2000")
  }

  test("udaf path: topN + linearTrend over a repartitioned Dataset") {
    val top3 = udaf(TypedAggs.topN(3))
    val trend = udaf(TypedAggs.LinearTrend)
    // y = 3x + 1 exactly -> slope must be exactly 3.0 per key
    val df = (1 to 100).flatMap(i => Seq(("a", i.toDouble, 3.0 * i + 1), ("b", i.toDouble, 3.0 * i + 1)))
      .toDF("k", "x", "y")
      .repartition(7) // force multi-partition partial aggregation
    val out = df.groupBy($"k")
      .agg(top3($"y").as("top"), trend($"x", $"y").as("slope"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getSeq[Double](1) == Seq(301.0, 298.0, 295.0))
    // central-moment slope is exact to ~1 ulp, not bitwise (stability tradeoff)
    assert(math.abs(out("a").getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(out("b").getDouble(2) - 3.0) < 1e-9)
  }
}
