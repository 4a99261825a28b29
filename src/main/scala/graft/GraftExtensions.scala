package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{MinHashSignature, ShingleHashes, SimHashBands}

/** Session extension wiring: registers graft's native expressions as SQL
  * functions, so `spark.sql("SELECT shingle_hashes(text) ...")` works in
  * any session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimHashBands].getName, "simhash_bands"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashBands(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "minhash_signature(arr, k) requires a literal k")
        MinHashSignature(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
