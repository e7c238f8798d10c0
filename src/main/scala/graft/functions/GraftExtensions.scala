package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injector for the custom expression library —
  * the deployment path for clusters: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session gets
  * the `graft_*` SQL functions at analysis time, no per-session
  * `registerAll` call needed. Same builders as
  * [[GraftFunctions.registerAll]] (which remains for ad-hoc sessions);
  * permanent injection is what survives session pooling / Thrift-server
  * style multi-tenancy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** (identifier, info, builder) triples shared by the extension
    * injector; single source of truth for the SQL surface. */
  private[functions] val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash64"), info("graft_simhash64"),
      (e: Seq[Expression]) => SimHash64(e.head)),
    (FunctionIdentifier("graft_fingerprint"), info("graft_fingerprint"),
      (e: Seq[Expression]) => RollingHash(e.head)),
    (FunctionIdentifier("graft_cosine"), info("graft_cosine"),
      (e: Seq[Expression]) => CosineSimilarityF(e(0), e(1))),
    (FunctionIdentifier("graft_dot"), info("graft_dot"),
      (e: Seq[Expression]) => DotProductF(e(0), e(1))),
    (FunctionIdentifier("graft_jaccard"), info("graft_jaccard"),
      (e: Seq[Expression]) => ArrayJaccard(e(0), e(1))))
}
