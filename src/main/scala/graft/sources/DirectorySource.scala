package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's directory-scan source (O2, `Search.cpp:182-201`):
  * non-recursive listing of each input directory; every entry counts
  * (files, subdirectories, hidden names); invalid/non-directory paths
  * are silently skipped (`Search.cpp:186-189`).
  *
  * Shape: the (word, dir) input pairs become a Dataset and the listing
  * runs distributed via flatMap — with millions of input dirs the
  * listing itself parallelizes (this is how a filesystem-manifest scan
  * works at scale); for the CLI case it's a handful of driver rows.
  *
  * Fidelity notes: `java.io.File.list` omits the `.`/`..` entries a raw
  * `readdir` yields; the reference emits them (PDF p.5 "all the files
  * in the directory, including . / .."), so they're added explicitly.
  */
object DirectorySource {

  /** list (word, dir) pairs into (word, entryName) records. */
  def entries(spark: SparkSession, pairs: Seq[(String, String)]): Dataset[(String, String)] = {
    import spark.implicits._
    spark.createDataset(pairs).flatMap { case (word, dir) =>
      listDir(dir).map(name => (word, name))
    }
  }

  /** non-recursive entry names of one directory; Nil when invalid. */
  def listDir(dir: String): Seq[String] = {
    val f = new File(dir)
    if (!f.isDirectory) Nil // invalid path: silently skipped
    else {
      val children = Option(f.list()).map(_.toSeq).getOrElse(Nil)
      Seq(".", "..") ++ children
    }
  }

  def toDF(spark: SparkSession, pairs: Seq[(String, String)]): DataFrame =
    entries(spark, pairs).toDF("word", "file")
}
