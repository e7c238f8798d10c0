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
}
