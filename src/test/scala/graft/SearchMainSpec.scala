package graft

import java.nio.file.Files

/** The PDF p.5 acceptance fixture and the spec's edge cases, against the
  * faithful Search client (SURVEY.md §5 regression list).
  */
class SearchMainSpec extends SparkSpec {

  private def mkFixture(): String = {
    val dir = Files.createTempDirectory("graft-search").toFile
    for (n <- Seq("TA", "BLA", "osTargil", "sos", "targilOs"))
      Files.createFile(new java.io.File(dir, n).toPath)
    dir.getAbsolutePath
  }

  test("PDF p.5 canonical example: query 'os' finds osTargil and sos") {
    val dir = mkFixture()
    val out = SearchMain.run(spark, "os", Seq(dir, "blabla"))
    assert(out.toSet == Set("osTargil", "sos")) // targilOs: case-sensitive
    assert(out.size == 2)
  }

  test("invalid path silently skipped; zero valid folders → empty output") {
    assert(SearchMain.run(spark, "x", Seq("/nonexistent-zzz")) == Nil)
    assert(SearchMain.run(spark, "x", Nil) == Nil)
  }

  test("duplicate folder args → duplicate outputs (bag semantics)") {
    val dir = mkFixture()
    val out = SearchMain.run(spark, "sos", Seq(dir, dir))
    assert(out == Seq("sos", "sos"))
  }

  test("empty query matches every entry incl. dot entries") {
    val dir = mkFixture()
    val out = SearchMain.run(spark, "", Seq(dir))
    assert(out.size == 7) // 5 files + . + ..
    assert(out.contains("."))
  }

  test("listing is non-recursive and includes subdir names as entries") {
    val dir  = mkFixture()
    val sub  = new java.io.File(dir, "osSubdir")
    val deep = new java.io.File(sub, "osDeep")
    sub.mkdir()
    Files.createFile(deep.toPath)
    val out = SearchMain.run(spark, "os", Seq(dir))
    assert(out.contains("osSubdir")) // the subdir itself is an entry
    assert(!out.contains("osDeep"))  // but is not descended into
  }
}
