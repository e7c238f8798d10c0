package graft.ops

import graft.functions.VectorFunctions
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column.
  *
  * `ann_bruteforce`: exact cosine top-k — the correctness baseline. The
  * small query set is broadcast against the (arbitrarily large) corpus,
  * cosine runs in whole-stage codegen (`CosineSimilarityF`), and the
  * per-query top-k is a window row_number — at scale this is one scan,
  * no shuffle of the corpus (queries broadcast, partial top-k per
  * partition would be the next optimization).
  *
  * `ann_lsh`: the scale path — sign-random-projection buckets
  * (NumPlanes deterministic hyperplanes → NumPlanes-bit code);
  * candidates = same-bucket vectors (exact code only, no multi-probe),
  * then exact cosine top-k within the bucket. Approximate ⇒ rows-only
  * check; the bruteforce query is its quality oracle in spirit.
  *
  * Sims are rounded to 6dp and ranked by (rounded sim, id) so engine ULP
  * differences cannot flip ranks.
  */
object Similarity {

  val K          = 5
  val NumQueries = 20
  /** 8 planes → 256 buckets: collision odds stay useful for clustered
    * data (the fixtures' label clusters) while cutting candidates ~100×;
    * more planes would empty the buckets at these corpus sizes. */
  val NumPlanes  = 8

  private def rankedTopK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("query_id", "neighbor_id", "rank", "sim")
      .orderBy("query_id", "rank")
  }

  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val base    = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = base.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(col("qv"), col("embedding")), 6).as("sim"))
    rankedTopK(pairs)
  }

  /** deterministic pseudo-random unit-ish hyperplanes: weight(p, d) from
    * a splitmix-style integer mix — identical across runs and nodes. */
  private def planeWeight(p: Int, d: Int): Double = {
    var z = p.toLong * 2654435761L + d.toLong * 40503L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** embedding dimensionality of the fixtures (FIXTURES.md). */
  val Dim = 64

  /** NumPlanes-bit sign code of a vector under the fixed hyperplanes. */
  private def bucketCode(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val embD = emb.cast("array<double>")
    val bits = (0 until NumPlanes).map { p =>
      val weights = array((0 until Dim).map(d => lit(planeWeight(p, d))): _*)
      val dot     = aggregate(zip_with(embD, weights, (x, w) => x * w), lit(0.0), (a, v) => a + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .withColumn("bucket", bucketCode(col("embedding")))
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val pairs = base.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(col("qv"), col("embedding")), 6).as("sim"))
    rankedTopK(pairs)
  }

  /** IVF-style ANN: a coarse quantizer (here: per-label centroids — the
    * k-means step a real IVF would run; same Aggregator machinery) maps
    * every vector to its nearest centroid's inverted list; queries probe
    * only their own list (nprobe=1). The corpus shuffles once on the
    * list id; at scale each list is a partition and a query touches
    * 1/k of the data. Approximate ⇒ rows-only.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // coarse centroids (k = 10 label groups), collected: k×dim doubles
    val cents = Centroids.labelCentroids(spark, dir)
      .groupBy("label").agg(collect_list(struct(col("dim"), col("avg_val"))).as("dims"))
      .collect().map { r =>
        val arr = new Array[Double](Dim)
        r.getSeq[org.apache.spark.sql.Row](1).foreach(d => arr(d.getLong(0).toInt) = d.getDouble(1))
        (r.getLong(0), arr)
      }
    val bc = spark.sparkContext.broadcast(cents)
    val assignUdf = udf { (emb: Seq[Float]) =>
      val v = emb.toArray
      var bestId = -1L
      var bestD  = Double.MaxValue
      for ((id, c) <- bc.value) {
        var d = 0.0
        var i = 0
        val n = math.min(v.length, c.length) // tolerate short vectors
        while (i < n) { val x = v(i) - c(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; bestId = id }
      }
      bestId
    }
    val listed = base.withColumn("ivf_list", assignUdf(col("embedding")))
    val queries = listed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("ivf_list"))
    val pairs = listed.join(broadcast(queries), Seq("ivf_list"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(col("qv"), col("embedding")), 6).as("sim"))
    rankedTopK(pairs)
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("ann_bruteforce",
      s"""WITH pairs AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |               CAST(b.embedding AS DOUBLE[])), 6) AS sim
         |  FROM embeddings q JOIN embeddings b ON q.vec_id <> b.vec_id
         |  WHERE q.vec_id < $NumQueries
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM pairs
         |)
         |SELECT query_id, neighbor_id, rank, sim FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)(annBruteforce),
    QueryDef.rowsOnly("ann_lsh")(annLsh),
    QueryDef.rowsOnly("ann_ivf")(annIvf),
  )
}
