package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the custom expressions, so `spark.sql`
  * users get them as first-class functions (the relational equivalent of
  * the reference letting clients plug code into the engine).
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      exprs => RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarityF(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_jaccard",
      exprs => ArrayJaccard(exprs(0), exprs(1)), "scala_udf")
  }
}
