package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics — PageRank as the canonical repeated
  * join-aggregate. Complements the connected-components propagation in
  * `Dedup` (dup-cluster formation): CC iterates to a fixpoint with
  * checkpointed lineage; PageRank here runs a FIXED number of unrolled
  * iterations so the DuckDB oracle can mirror them as chained CTEs.
  *
  * Scale shape per iteration: ranks ⋈ edges on src (a shuffle-on-key
  * join — at 100 TB both sides hash-partition on the node id and the
  * partitioning is REUSED across iterations since the join key never
  * changes), then a partial-aggregated sum per dst. Nothing is
  * collected; N (the node count) rides along as a broadcast 1-row
  * aggregate exactly like tfidf's corpus count. Deep lineage is the
  * real production hazard: at 3 iterations it is harmless, beyond ~10
  * you checkpoint every few rounds exactly as `Dedup.clusterLabels`
  * does.
  *
  * Determinism contract: every rank is rounded to 9 dp after each
  * iteration, so the one float sum per node (≤ in-degree terms, each
  * term bit-identical across engines) can never drift past the
  * rounding unit; all other arithmetic is integer.
  */
object Graph {

  private val Damping = 0.85
  private val Iters   = 3

  /** Directed graph derived from orders: customer-slot → order-slot in
    * a shared mod-prime node space (a deterministic stand-in for a real
    * link graph; the reference has no graph surface and the fixtures no
    * adjacency table). Distinct edges only — PageRank is defined on the
    * simple graph. */
  private def edges(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select((col("o_custkey") % 211).as("src"), (col("o_orderkey") % 197).as("dst"))

  /** 3 unrolled PageRank iterations: r₀ = 1/N, rₜ₊₁(v) = 0.15/N +
    * 0.85·Σ_{(u,v)∈E} rₜ(u)/deg(u), dangling mass dropped (the common
    * simplification — documented, and mirrored exactly by the oracle).
    * Output: node, out-degree, final rank. */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankOn(edges(spark, dir))

  /** PageRank over an arbitrary (src, dst) edge table — split out so
    * specs can drive it with a hand-checkable graph. Normalizes to the
    * simple graph first (PageRank's domain): self-loops and duplicate
    * edges dropped in one distinct pass. */
  def pageRankOn(edgesDf: DataFrame): DataFrame = {
    val e = edgesDf
      .filter(col("src") =!= col("dst"))
      .distinct()
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n   = nodes.agg(count(lit(1)).as("n"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))

    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), round(lit(1.0) / col("n"), 9).as("r"))
    for (_ <- 1 to Iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("r") / col("d")).as("c"))
        .groupBy("node")
        .agg(sum("c").as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          round(lit(0.15) / col("n") + lit(Damping) * coalesce(col("s"), lit(0.0)), 9).as("r"))
    }
    ranks
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("d"), lit(0L)).as("out_deg"), col("r").as("rank"))
      .orderBy("node")
  }

  private val pageRankSql: String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT (o_custkey % 211) AS src, (o_orderkey % 197) AS dst
        |  FROM orders WHERE (o_custkey % 211) <> (o_orderkey % 197)
        |), nodes AS (
        |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
        |), nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |r0 AS (SELECT node, round(1.0 / nn.n, 9) AS r FROM nodes, nn)""".stripMargin
    val iters = (1 to Iters).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT x.node,
         |    round(0.15 / nn.n + 0.85 * coalesce(c.s, 0.0), 9) AS r
         |  FROM nodes x CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r / deg.d) AS s
         |    FROM edges e JOIN $prev p ON e.src = p.node
         |    JOIN deg ON e.src = deg.src GROUP BY e.dst
         |  ) c ON x.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT f.node, CAST(coalesce(deg.d, 0) AS BIGINT) AS out_deg, f.r AS rank
       |FROM r$Iters f LEFT JOIN deg ON f.node = deg.src
       |ORDER BY f.node""".stripMargin
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("pagerank", pageRankSql)(pageRank),
  )
}
