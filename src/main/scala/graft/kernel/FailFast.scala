package graft.kernel

import org.apache.spark.sql.SparkSession

/** Fail-fast error handling parity (O14): the reference checks every
  * syscall and on the first failure prints
  * `"MapReduceFramework Failure: FUNCTION_NAME failed."` to stderr and
  * exits (`MapReduceFramework.cpp:204-216`, `failureCheckerPrinter`;
  * spec `MapReduceEX.pdf` p.11).
  *
  * Spark's native posture is a *superset* — per-task retry
  * (`spark.task.maxFailures`) plus exception propagation to the action
  * call site. This shim adds the faithful mode on top:
  *
  *  - [[conf]] disables retries so the first task failure kills the
  *    job, like the reference's `exit(1)` kills the run (local[n]
  *    already defaults to 1 attempt; on a cluster the default is 4).
  *  - [[guard]] wraps an action and emits the reference's stderr line
  *    verbatim on the first failure, then rethrows (or exits, if asked
  *    for the full faithful behavior — default off so library users and
  *    tests keep the exception).
  */
object FailFast {

  /** session confs for the faithful fail-fast mode: first task failure
    * fails the job — no retry, mirroring the reference's immediate
    * `exit(1)`. Must be set before the SparkContext starts. */
  val conf: Map[String, String] = Map("spark.task.maxFailures" -> "1")

  /** a builder pre-configured for fail-fast (cluster-safe: the conf is
    * what differs from defaults, the rest is caller's choice). */
  def builder(): SparkSession.Builder =
    conf.foldLeft(SparkSession.builder()) { case (b, (k, v)) => b.config(k, v) }

  /** Run `body`; on the first failure print the reference's stderr line
    * (`MapReduceFramework.cpp:209-210` — note the literal trailing
    * period after "failed") and rethrow. `function` plays the role of
    * the reference's FUNCTION_NAME macro strings ("pthread_create()",
    * "fopen()", ...). Set `exitOnFailure = true` for the reference's
    * full `exit(EXIT_FAILURE)` behavior. */
  def guard[T](function: String, exitOnFailure: Boolean = false)(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        Console.err.println(s"MapReduceFramework Failure: $function failed.")
        if (exitOnFailure) sys.exit(1)
        throw e
    }
}
