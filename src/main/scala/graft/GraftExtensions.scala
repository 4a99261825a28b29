package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.FunctionIdentifier

import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{BigramEntries, BigramHashes, BigramPairHashes,
  ByteStats, HyperplaneBuckets, InterleaveBits, MinHashSignature,
  QuantizedDot, ShingleHashes, SimHashBands, SqNorm}

/** Session extension wiring: registers EVERY graft native expression as
  * a SQL function, so `spark.sql("SELECT shingle_hashes(text) ...")`
  * (and the vector/byte kernels) work in any session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the full engine
  * surface is reachable from pure SQL, not just the Scala DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    // path-addressed maintenance DML (OPTIMIZE / MERGE INTO / VACUUM on
    // snapshot tables) as real spark.sql statements — un-owned text
    // falls through to the delegate parser verbatim
    e.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))

    def inject(name: String, cls: Class[_])(build: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), build))

    inject("shingle_hashes", classOf[ShingleHashes])(x => ShingleHashes(x.head))
    inject("simhash_bands", classOf[SimHashBands])(x => SimHashBands(x.head))
    inject("minhash_signature", classOf[MinHashSignature]) { x =>
      require(x.length == 2, "minhash_signature(arr, k)")
      MinHashSignature(x.head, litInt(x(1), "minhash_signature k"))
    }
    inject("bigram_hashes", classOf[BigramHashes])(x => BigramHashes(x.head))
    inject("bigram_entries", classOf[BigramEntries])(x => BigramEntries(x.head))
    inject("bigram_pair_hashes", classOf[BigramPairHashes])(x => BigramPairHashes(x.head))
    inject("interleave_bits", classOf[InterleaveBits]) { x =>
      require(x.length == 2, "interleave_bits(a, b)")
      InterleaveBits(x.head, x(1))
    }
    inject("quantized_dot", classOf[QuantizedDot]) { x =>
      require(x.length == 2, "quantized_dot(a, b)")
      QuantizedDot(x.head, x(1))
    }
    inject("sq_norm", classOf[SqNorm])(x => SqNorm(x.head))
    inject("byte_stats", classOf[ByteStats])(x => ByteStats(x.head))
    inject("hyperplane_buckets", classOf[HyperplaneBuckets]) { x =>
      require(x.length == 3, "hyperplane_buckets(v, tables, bits)")
      HyperplaneBuckets(x.head, litInt(x(1), "hyperplane_buckets tables"),
        litInt(x(2), "hyperplane_buckets bits"))
    }
  }
}
