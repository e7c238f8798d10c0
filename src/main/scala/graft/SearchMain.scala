package graft

import graft.kernel.MapReduce
import graft.sources.DirectorySource
import org.apache.spark.sql.SparkSession

/** The reference's flagship client, end to end: `Search <substr> <dir...>`
  * (`Search.cpp:277-308`; spec `MapReduceEX.pdf` pp.4-5).
  *
  * Faithful behaviors:
  *  - no args → usage line on stderr, non-zero exit (`Search.cpp:280-283`, O15)
  *  - each directory listed non-recursively, all entries incl. `.`/`..`
  *    and hidden names; invalid dirs silently skipped (O2)
  *  - case-sensitive substring filter in the Reduce stage (O8,
  *    `Search.cpp:207-228`); empty query matches everything
  *  - duplicate dirs → duplicate outputs (bag semantics, SURVEY §1.3 pt 5)
  *  - output space-separated with trailing space, sorted by the k3 key
  *    (the constant query word), file order within the group unspecified
  *    (O6/O16, `Search.cpp:301-303`)
  */
object SearchMain {

  def run(spark: SparkSession, word: String, dirs: Seq[String]): Seq[String] = {
    import spark.implicits._
    val input = DirectorySource.entries(spark, dirs.map(d => (word, d)))
    MapReduce.run(input)(
      map = (w, file) => Iterator.single((w, file)))(
      reduce = (w, files) => files.filter(_.contains(w)).map(f => (w, f)))
      .collect().map(_._2).toSeq
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("Usage: <substring to search> <folders, separated by space>")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-search")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // O14: on any failure inside the run, print the reference's
    // "MapReduceFramework Failure: X failed." stderr line and exit 1
    // (`MapReduceFramework.cpp:204-216`)
    val matches = graft.kernel.FailFast.guard("runMapReduceFramework", exitOnFailure = true) {
      run(spark, args.head, args.tail.toSeq)
    }
    print(matches.map(_ + " ").mkString) // trailing space, no newline (O16)
    spark.stop()
  }
}
