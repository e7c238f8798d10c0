package graft

import graft.kernel.MapReduce
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the kernel laws of SURVEY.md §1.3:
  *  1. grouping is by key equality (equivalence, not identity)
  *  2. output globally sorted ascending by k3
  *  3. bag multiplicity preserved (nothing deduplicates)
  *  4. Reduce runs exactly once per distinct k2
  *
  * (scalatestplus isn't in the offline cache, so samples are drawn from
  * ScalaCheck generators with fixed seeds and asserted in plain suites.)
  */
class KernelLawsSpec extends SparkSpec {

  import spark.implicits._

  private val pairGen: Gen[List[(String, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0, 9)))

  private def samples(n: Int): Seq[List[(String, Int)]] =
    (1 to n).flatMap(i => pairGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("identity map/reduce preserves multiplicity and sorts by key") {
    for (pairs <- samples(8)) {
      val ds = spark.createDataset(pairs)
      val out = MapReduce.run(ds)(
        map = (k, v) => Iterator.single((k, v)))(
        reduce = (k, vs) => vs.map(v => (k, v))).collect().toList
      assert(out.sorted == pairs.sorted)           // bag multiplicity
      assert(out.map(_._1) == out.map(_._1).sorted) // globally sorted by k3
    }
  }

  test("reduce runs exactly once per distinct k2, with all its values") {
    for (pairs <- samples(8)) {
      val ds = spark.createDataset(pairs)
      val out = MapReduce.run(ds)(
        map = (k, v) => Iterator.single((k, v)))(
        reduce = (k, vs) => Iterator.single((k, vs.size))).collect().toList
      val expected = pairs.groupBy(_._1).view.mapValues(_.size).toList.sorted
      assert(out.sorted == expected)
      assert(out.map(_._1).distinct.size == out.size) // once per key
    }
  }

  test("map fan-out: 0..n emissions per input flow through (flatMap law)") {
    for (pairs <- samples(8)) {
      val ds = spark.createDataset(pairs)
      val out = MapReduce.run(ds)(
        map = (k, v) => List.fill(v % 3)((k, v)))(
        reduce = (k, vs) => vs.map(v => (k, v))).collect().toList
      val expected = pairs.flatMap { case (k, v) => List.fill(v % 3)((k, v)) }
      assert(out.sorted == expected.sorted)
    }
  }

  test("grouping is by value equality even for compound keys") {
    val pairs = List((("x", 1), "p"), (("x", 1), "q"), (("y", 2), "r"))
    val ds    = spark.createDataset(pairs)
    val out = MapReduce.run(ds)(
      map = (k, v) => Iterator.single((k, v)))(
      reduce = (k, vs) => Iterator.single((k, vs.mkString("+")))).collect().toList
    assert(out.size == 2) // ("x",1) instances coalesce into one group
    val xGroup = out.find(_._1 == (("x", 1))).get._2
    assert(Set("p+q", "q+p").contains(xGroup)) // in-group order unspecified (§1.3 pt 3)
  }

  test("kernel is re-runnable in-process with identical results (§1.3 pt 7)") {
    val pairs = samples(1).head
    val ds    = spark.createDataset(pairs)
    def go() = MapReduce.run(ds)(
      map = (k, v) => Iterator.single((k, v)))(
      reduce = (k, vs) => Iterator.single((k, vs.sum))).collect().toList
    assert(go() == go())
  }

  test("empty input produces empty output (zero-folders edge case)") {
    val ds = spark.createDataset(List.empty[(String, String)])
    val out = MapReduce.run(ds)(
      map = (k, v) => Iterator.single((k, v)))(
      reduce = (k, vs) => vs.map(v => (k, v))).collect()
    assert(out.isEmpty)
  }
}
