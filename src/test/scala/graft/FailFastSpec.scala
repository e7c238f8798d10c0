package graft

import java.io.ByteArrayOutputStream

import graft.kernel.FailFast

/** O14 fail-fast parity: the reference prints
  * "MapReduceFramework Failure: X failed." to stderr on the first
  * failure (MapReduceFramework.cpp:204-216). */
class FailFastSpec extends SparkSpec {
  import spark.implicits._

  test("guard emits the reference stderr line on an induced task failure") {
    val err = new ByteArrayOutputStream()
    val thrown = intercept[Throwable] {
      Console.withErr(err) {
        FailFast.guard("runMapReduceFramework") {
          spark.createDataset(1 to 10)
            .map(i => if (i == 7) throw new RuntimeException("boom") else i)
            .count()
        }
      }
    }
    assert(err.toString.linesIterator.contains(
      "MapReduceFramework Failure: runMapReduceFramework failed."))
    // the failure still propagates (reference exits; we rethrow unless
    // exitOnFailure is requested)
    assert(thrown != null)
  }

  test("guard is transparent on success") {
    val err = new ByteArrayOutputStream()
    val n = Console.withErr(err) {
      FailFast.guard("runMapReduceFramework") {
        spark.createDataset(1 to 10).count()
      }
    }
    assert(n == 10)
    assert(!err.toString.contains("MapReduceFramework Failure"))
  }

  test("fail-fast conf disables task retry") {
    assert(FailFast.conf == Map("spark.task.maxFailures" -> "1"))
  }
}
