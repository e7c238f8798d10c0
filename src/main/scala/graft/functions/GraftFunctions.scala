package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the custom expressions, so `spark.sql`
  * users get them as first-class functions (the relational equivalent of
  * the reference letting clients plug code into the engine). Session-
  * local variant of [[GraftExtensions]] (one shared builder table) for
  * ad-hoc sessions that weren't built with the extension.
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, _, builder) =>
      reg.createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
  }
}
