package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2.3 "Scans/sources"): parquet is
  * the fixture default; csv/json/text round-trip through the same
  * DataFrame surface. Plus SQL registration of the custom expressions.
  */
class SourcesSpec extends SparkSpec {

  test("csv and json round-trip a table sample losslessly") {
    val tmp  = Files.createTempDirectory("graft-sources").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id").limit(50)
    docs.write.option("header", "true").csv(s"$tmp/csv")
    docs.write.json(s"$tmp/json")
    val fromCsv = spark.read.option("header", "true")
      .schema(docs.schema).csv(s"$tmp/csv")
    val fromJson = spark.read.schema(docs.schema).json(s"$tmp/json")
    assert(fromCsv.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    assert(fromJson.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("orc round-trips a table sample losslessly") {
    val tmp  = Files.createTempDirectory("graft-orc").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id").limit(50)
    docs.write.orc(s"$tmp/orc")
    val back = spark.read.orc(s"$tmp/orc")
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("text source reads raw lines") {
    val tmp = Files.createTempDirectory("graft-text").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").limit(20).write.text(s"$tmp/txt")
    assert(spark.read.text(s"$tmp/txt").count() == 20)
  }

  test("GraftExtensions injects the graft_* functions into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val old = spark // keep the shared session safe
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old, "expected a fresh session with extensions")
      val r = s2.sql(
        "SELECT graft_fingerprint('abc') AS fp, graft_simhash64(array('a','b')) AS sh")
        .collect().head
      // same values as the column-API expressions on the shared session
      import old.implicits._
      val expected = Seq("x").toDF("x").select(
        graft.functions.TextFunctions.fingerprint(lit("abc")),
        graft.functions.TextFunctions.simhash(array(lit("a"), lit("b"))))
        .collect().head
      assert(r.getLong(0) == expected.getLong(0))
      assert(r.getLong(1) == expected.getLong(1))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("custom expressions are callable from spark.sql after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_fingerprint(text) AS fp,
        |       graft_simhash64(split(text, ' ')) AS sh
        |FROM docs_v WHERE doc_id < 5 ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaApi = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        graft.functions.TextFunctions.simhash(split(col("text"), " ")).as("sh"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.size == 5)
  }

  // Fixture-contract guard (round-12 regression): the driver regenerated
  // events.parquet with ts as timestamp[us] (read as TIMESTAMP_NTZ) where
  // it had been TIMESTAMP(NANOS) (read as raw long under nanosAsLong),
  // silently breaking all 31 events-family queries. Tables.normalizeTs
  // must yield identical TimestampType micros rows for every encoding the
  // fixtures have ever shipped.
  test("Tables.events yields identical TimestampType micros across ts encodings") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-events-contract").toString
    val micros = Seq(0L, 1L, 1700000000000000L, 1700000000123456L, -1000000L)
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")

    // (a) legacy TIMESTAMP(NANOS): surfaces as a raw long under
    // nanosAsLong — a plain int64 column is the same DataFrame shape
    base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.parquet(s"$tmp/nanos/events.parquet")
    // (b) current fixtures: timestamp[us] isAdjustedToUTC=false → NTZ
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$tmp/ntz/events.parquet")
    // (c) instant-semantics timestamp[us] → TimestampType passthrough
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$tmp/tz/events.parquet")

    val loaded = Seq("nanos", "ntz", "tz").map { enc =>
      val df = tables.Tables.events(spark, s"$tmp/$enc")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc must normalize to TimestampType")
      enc -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    val expect = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(loaded("nanos") == expect)
    assert(loaded("ntz") == expect)
    assert(loaded("tz") == expect)
  }

  test("driver events fixture loads as TimestampType with rows") {
    val ev = tables.Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }

  test("binaryFile ingest round-trips every staged blob byte-exactly") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Multimodal.binaryFileIngest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // in-engine reference digests/lengths from the same sampled payloads
    val expect = tables.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        length(encode(col("text"), "utf-8")).cast("long"),
        md5(encode(col("text"), "utf-8")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == expect.toSeq,
      "binaryFile round-trip lost or corrupted a payload")
    // the result must survive its temp dir (localCheckpoint contract)
    assert(graft.ops.Multimodal.binaryFileIngest(spark, sfDir).count() == expect.length.toLong)
  }
}
