package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** ScalaCheck properties over the pure JVM kernels behind the custom
  * sketch aggregates — the order/partition-independence and guarantee
  * CLAIMS the scaladocs make, checked across randomized inputs,
  * shuffles, and partitionings instead of single fixtures. No
  * SparkSession: these drive the TypedImperativeAggregate buffer ops
  * (update/merge/serialize) directly, exactly as Spark's aggregation
  * paths do.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  /** Split into 1-4 random contiguous chunks of a random shuffle — the
    * model of "any partitioning, any arrival order".
    */
  private def partition[A](xs: Seq[A], rnd: scala.util.Random): Seq[Seq[A]] = {
    val shuffled = rnd.shuffle(xs)
    if (shuffled.isEmpty) Seq(Seq.empty)
    else {
      val n = 1 + rnd.nextInt(4)
      shuffled.grouped(math.max(1, math.ceil(shuffled.size.toDouble / n).toInt)).toSeq
    }
  }

  private val seededInput = for {
    hs <- Gen.listOf(Gen.chooseNum(0L, 500L)) // tight domain forces duplicates
    seed <- Gen.long
  } yield (hs, seed)

  test("theta sketch retains exactly the k smallest distinct hashes under any layout") {
    val K = 8
    val agg = graft.plans.ThetaSketchAgg(BoundReference(0, LongType, nullable = true), K)
    check("theta", Prop.forAll(seededInput) { case (hs, seed) =>
      val rnd = new scala.util.Random(seed)
      val bufs = partition(hs, rnd).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach(h => agg.update(b, InternalRow(h)))
        b
      }
      val total = rnd.shuffle(bufs).foldLeft(agg.createAggregationBuffer())(agg.merge)
      // iterator, not asScala-the-Set: the Set view forgets TreeSet order
      total.iterator().asScala.map(_.toLong).toSeq == hs.distinct.sorted.take(K)
    })
  }

  test("quantile sample keeps bottom-k by hash with min-value collision rule, any layout") {
    val K = 8
    val agg = graft.plans.QuantileSampleAgg(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), K)
    val gen = for {
      pairs <- Gen.listOf(for {
        h <- Gen.chooseNum(0L, 100L) // collisions guaranteed
        v <- Gen.chooseNum(-50, 50).map(_.toDouble)
      } yield (h, v))
      seed <- Gen.long
    } yield (pairs, seed)
    check("qsample", Prop.forAll(gen) { case (pairs, seed) =>
      val rnd = new scala.util.Random(seed)
      val bufs = partition(pairs, rnd).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach { case (h, v) => agg.update(b, InternalRow(h, v)) }
        b
      }
      // exercise the wire format on the way: Spark serializes partials
      val total = rnd.shuffle(bufs)
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val want = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min)
        .toSeq.sortBy(_._1).take(K)
      total.entrySet().iterator().asScala
        .map(e => (e.getKey.toLong, e.getValue.toDouble)).toSeq == want
    })
  }

  test("CMS never undercounts and is linear under any partitioning") {
    val (depth, width) = (4, 32) // narrow width forces real collisions
    val agg = graft.plans.CountMinSketchAgg(
      BoundReference(0, LongType, nullable = true), depth, width)
    check("cms", Prop.forAll(seededInput) { case (hs, seed) =>
      val rnd = new scala.util.Random(seed)
      val bufs = partition(hs, rnd).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach(h => agg.update(b, InternalRow(h)))
        b
      }
      val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
      val direct = agg.createAggregationBuffer()
      hs.foreach(h => agg.update(direct, InternalRow(h)))
      val linear = merged.sameElements(direct) // linear sketch: merge = add
      val noUndercount = hs.distinct.forall { h =>
        val exact = hs.count(_ == h).toLong
        val est = (0 until depth).map(i =>
          merged(i * width + graft.plans.CountMinSketchAgg.rowIndex(h, i, width))).min
        est >= exact
      }
      linear && noUndercount
    })
  }

  test("Misra-Gries guarantees every item above N/(k+1) survives any layout") {
    val K = 4
    val agg = graft.plans.MisraGriesAgg(
      BoundReference(0, StringType, nullable = true), K)
    val gen = for {
      // skewed alphabet: a few heavy letters + noise, so the guarantee
      // threshold is actually crossed in most cases
      items <- Gen.listOf(Gen.frequency(
        5 -> Gen.const("heavy"), 3 -> Gen.const("mid"),
        1 -> Gen.oneOf("a", "b", "c", "d", "e", "f")))
      seed <- Gen.long
    } yield (items, seed)
    check("mg", Prop.forAll(gen) { case (items, seed) =>
      val rnd = new scala.util.Random(seed)
      val bufs = partition(items, rnd).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach(s => agg.update(b, InternalRow(UTF8String.fromString(s))))
        b
      }
      val total = rnd.shuffle(bufs).foldLeft(agg.createAggregationBuffer())(agg.merge)
      val n = items.size.toLong
      val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
      counts.forall { case (item, c) =>
        c * (K + 1) <= n || total.contains(item) // freq > N/(k+1) ⇒ present
      } && counts.forall { case (item, c) =>
        // counters never overcount (undercount bound is the guarantee's dual)
        total.get(item).forall(_ <= c)
      }
    })
  }

  test("MinHash signature is an elementwise-min fold, independent of layout") {
    val K = 16
    val agg = graft.plans.MinHashSigAgg(BoundReference(0, LongType, nullable = true), K)
    check("minhash", Prop.forAll(seededInput) { case (hs, seed) =>
      val rnd = new scala.util.Random(seed)
      val bufs = partition(hs, rnd).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach(h => agg.update(b, InternalRow(h)))
        b
      }
      val merged = rnd.shuffle(bufs).foldLeft(agg.createAggregationBuffer())(agg.merge)
      val direct = agg.createAggregationBuffer()
      hs.foreach(h => agg.update(direct, InternalRow(h)))
      // signature is a pure per-permutation min over the value SET —
      // duplicates, order, and partitioning must all be invisible
      val dedup = agg.createAggregationBuffer()
      rnd.shuffle(hs.distinct).foreach(h => agg.update(dedup, InternalRow(h)))
      merged.sameElements(direct) && merged.sameElements(dedup)
    })
  }

  test("CMS cell addressing stays in range over the full 63-bit hash domain") {
    val gen = for {
      h <- Gen.chooseNum(0L, Long.MaxValue)
      i <- Gen.chooseNum(0, 3)
      w <- Gen.chooseNum(1, 4096)
    } yield (h, i, w)
    check("rowIndex", Prop.forAll(gen) { case (h, i, w) =>
      val idx = graft.plans.CountMinSketchAgg.rowIndex(h, i, w)
      idx >= 0 && idx < w
    })
  }
}
