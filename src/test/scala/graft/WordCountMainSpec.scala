package graft

import java.nio.file.Files

/** The PDF pp.3-4 wordcount example through the CLI client's run path. */
class WordCountMainSpec extends SparkSpec {

  test("wordcount over text files matches hand counts, sorted by word") {
    val dir = Files.createTempDirectory("graft-wc").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath, "the fox\nthe dog\n")
    Files.writeString(new java.io.File(dir, "b.txt").toPath, "the  cat jumps\n")
    val out = WordCountMain.run(spark, Seq(dir.getAbsolutePath))
    assert(out == Seq("cat" -> 1L, "dog" -> 1L, "fox" -> 1L, "jumps" -> 1L, "the" -> 3L))
  }
}
