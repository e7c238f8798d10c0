package graft

import graft.ops.Events
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Semantic pin for the secondary-sort event operators: the debounce
  * recursion must equal its driver-side sequential definition exactly —
  * the distributed sorted-run pass may not drop, reorder, or double-keep
  * relative to a single-threaded replay of each user's stream.
  */
class EventsSpec extends SparkSpec {

  private val D = Events.DebounceMs

  test("debounce equals the sequential per-user replay; kept gaps honor the threshold") {
    val got = Events.debounceEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // driver-side replay: sort each user's events, walk once
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var lastKept = Long.MinValue
      var seq      = 0L
      sorted.flatMap { case (_, ms, eid) =>
        if (seq == 0L || ms - lastKept >= D) {
          lastKept = ms; seq += 1L; Some((u, eid, ms, seq))
        } else None
      }
    }
    assert(got.toSet == expected.toSet,
      s"debounce diverged from the sequential replay " +
        s"(got ${got.length}, expected ${expected.length})")

    // direct gap invariant on the output itself
    got.groupBy(_._1).foreach { case (u, ks) =>
      val ms = ks.sortBy(_._4).map(_._3)
      ms.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= D, s"user $u kept gap ${b - a} < $D")
        case _           =>
      }
    }
    // something was actually debounced at this threshold
    assert(got.length < raw.length, "threshold dropped nothing — test is vacuous")
  }

  test("frequent_sequences trigram counts equal the per-user sequential replay") {
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
      .groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[(String, String, String), Long]
    byUser.values.foreach { rows =>
      val seq = rows.map(_._2).sortBy { case (t, id, _) => (t, id) }.map(_._3)
      seq.sliding(3).filter(_.length == 3).foreach { w =>
        val k = (w(0), w(1), w(2)); counts(k) = counts.getOrElse(k, 0L) + 1L
      }
    }
    val total = counts.values.sum
    val got = Events.frequentSequences(spark, sfDir).collect()
    assert(got.length == math.min(20, counts.size))
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1), r.getString(2))
      assert(r.getLong(3) == counts(k), s"trigram $k: ${r.getLong(3)} vs replay ${counts(k)}")
      assert(r.getLong(4) == (BigInt(counts(k)) * 1000000 / total).toLong)
    }
    // the cut really is the top-20: every reported n >= every omitted n
    val reported = got.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val minKept  = got.map(_.getLong(3)).min
    counts.foreach { case (k, n) =>
      if (!reported(k)) assert(n <= minKept, s"omitted $k has support $n > kept min $minKept")
    }
  }

  test("interval_union equals the driver-side sweep and never exceeds the naive sum") {
    import org.apache.spark.sql.functions._
    val iv = 5L * 60 * 1000
    val evs = graft.tables.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(_._2).sorted
      var (nInt, covered, curS, curE) = (0L, 0L, -1L, -1L)
      sorted.foreach { s =>
        if (curE < 0 || s > curE) {
          if (curE >= 0) covered += curE - curS
          nInt += 1; curS = s; curE = s + iv
        } else curE = math.max(curE, s + iv)
      }
      if (curE >= 0) covered += curE - curS
      u -> (rows.size.toLong, nInt, covered)
    }
    val got = graft.ops.Events.intervalUnion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) =>
      assert(got(u) == w, s"user $u: ${got(u)} != $w")
      // union <= naive sum (overlaps deduplicated) and >= one interval
      assert(got(u)._3 <= w._1 * iv && got(u)._3 >= iv)
    }
    // the metric must actually deduplicate somewhere on the fixture
    assert(want.exists { case (_, (n, _, cov)) => cov < n * iv })
  }

  test("twap replays the last-value-holds integral and diverges from the plain mean") {
    import org.apache.spark.sql.functions._
    val evs = graft.tables.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("unix_millis(ts)").as("ms"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val span = sorted.last._3 - sorted.head._3
      val wsum = sorted.sliding(2).collect { case arr if arr.length == 2 =>
        BigInt(arr(0)._4) * (arr(1)._3 - arr(0)._3)
      }.sum
      u -> (rows.size.toLong, span,
        if (span > 0) Some((wsum * 1000 / span).toLong) else None)
    }
    val got = graft.ops.Events.twap(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u: ${got(u)} != $w") }
    // semantic pin: on at least one user, TWAP != plain mean (bursts
    // re-weighted) — else the op measures nothing the mean doesn't
    val diverges = evs.groupBy(_._1).exists { case (u, rows) =>
      got(u)._3.exists { tw =>
        val mean = rows.map(_._4).sum * 1000 / rows.size
        math.abs(tw - mean) > 1000
      }
    }
    assert(diverges, "TWAP equals the plain mean everywhere")
  }

  test("transition_stationary replays the quantized power iteration and sits at a fixpoint") {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = graft.tables.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("f"))
      .withColumn("t", lead(col("f"), 1).over(w))
      .filter(col("t").isNotNull)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val tot = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = cells.map { case (f, t, n) => (f, t) -> n * 1000000L / tot(f) }.toMap
    def sweep(pi: Map[String, Long]): Map[String, Long] =
      types.map(j => j -> types.map(i => pi(i) * p.getOrElse((i, j), 0L)).sum / 1000000L).toMap
    var pi = types.map(_ -> 1000000L / types.length).toMap
    (1 to 20).foreach(_ => pi = sweep(pi))
    val got = graft.ops.Events.transitionStationary(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == types.toSeq)
    got.foreach { case (t, nOut, piM) =>
      assert(nOut == tot.getOrElse(t, 0L) && piM == pi(t), s"type $t")
    }
    // mass conservation under flooring and fixpoint at micros resolution
    val mass = pi.values.sum
    assert(mass <= 1000000L && mass > 999000L, s"stationary mass $mass")
    // flooring bleeds ~1 micro per sweep, so an EXACT fixpoint never
    // lands — converged means the next sweep moves within quantization
    // noise, far below the ~10⁴-micros swings of the early sweeps
    val next = sweep(pi)
    types.foreach(t => assert(math.abs(next(t) - pi(t)) <= 2L,
      s"type $t still moving: ${pi(t)} -> ${next(t)}"))
  }

  test("variant_extract agrees with the schema-ful classic path row-for-row") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Events.variantExtract(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.isNullAt(5)))
    assert(got.nonEmpty)
    // every missing-path extraction is NULL; tag0 replays event_type
    assert(got.forall(_._6), "missing-path variant_get must be NULL")
    // classic reference: same values straight from the base columns
    val ref = tables.Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long"),
        (col("user_id") % 5).cast("long"),
        col("event_type"),
        graft.functions.TextFunctions.cents(col("value")))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), true))
      .sortBy(_._1)
    assert(got.toSeq == ref.toSeq, "variant path diverged from the classic JSON path")
  }
}
