package graft.kernel

import org.apache.spark.sql.{Dataset, Encoder}

/** The faithful, generic MapReduce surface of the reference engine,
  * re-expressed on typed Datasets.
  *
  * Reference semantics preserved (SURVEY.md §1.3; reference
  * `MapReduceFramework.cpp:698-765`):
  *  1. grouping is by key *equivalence*, not identity
  *     (`MapReduceFramework.cpp:83-91` groups via `operator<` on
  *     dereferenced keys; case-class equality plays that role here);
  *  2. Reduce runs exactly once per distinct k2 (`MapReduceEX.pdf` p.6
  *     step 4) — `groupByKey.flatMapGroups` guarantees this;
  *  3. bag multiplicity is preserved end-to-end — nothing here
  *     deduplicates values or output pairs;
  *  4. final output is globally sorted ascending by k3
  *     (`MapReduceFramework.cpp:546-558`) — the trailing `orderBy`;
  *  5. value order within a group is unspecified (reference: shuffle
  *     task-arrival order, `MapReduceFramework.cpp:441-448`; here:
  *     shuffle-read order) — user reduce functions must not depend on it,
  *     exactly as in the reference.
  *
  * What the reference hand-builds — ExecMap/ExecReduce thread pools,
  * chunked work-stealing, per-thread emit buffers, the shuffler thread,
  * the gather step (`MapReduceFramework.cpp:317-374,409-467,476-519,
  * 546-558`) — is Spark's job: task scheduling, sort-based shuffle,
  * map-side buffering, and a range-partitioned distributed sort. At
  * cluster scale this kernel is shuffle-bound only on the groupByKey and
  * the final sort, both of which scale by partitioning alone.
  */
object MapReduce {

  /** `runMapReduceFramework` ≙ `run`; `Emit2`/`Emit3` ≙ the iterables
    * returned by `map`/`reduce`; `multiThreadLevel` ≙ parallelism of the
    * underlying stages.
    */
  def run[K1, V1, K2, V2, K3, V3](
      input: Dataset[(K1, V1)])(
      map: (K1, V1) => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      k2Enc: Encoder[K2],
      kv2Enc: Encoder[(K2, V2)],
      kv3Enc: Encoder[(K3, V3)]): Dataset[(K3, V3)] = {
    val mapped  = input.flatMap { kv => map(kv._1, kv._2) }
    val reduced = mapped
      .groupByKey(_._1)
      .flatMapGroups { (k2: K2, pairs: Iterator[(K2, V2)]) =>
        reduce(k2, pairs.map(_._2))
      }
    // §1.3 pt 4: globally sorted ascending by k3. Tuple encoders expose
    // fields as _1/_2; sorting on a struct key is lexicographic, matching
    // the reference's operator< composition for compound keys.
    reduced.orderBy("_1")
  }
}
