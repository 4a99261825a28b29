package graft

import org.apache.spark.sql.{Column, GraftShim}

/** Column-API surface for graft's native Catalyst expressions. */
package object functions {

  /** Distinct 3-token shingle hashes of a space-separated text. */
  def shingle_hashes(c: Column): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(c)))

  /** k-permutation MinHash signature over a shingle-hash array. */
  def minhash_signature(c: Column, k: Int): Column =
    GraftShim.column(MinHashSignature(GraftShim.expression(c), k))

  /** 64-bit SimHash of a space-separated text as 4×16-bit bands. */
  def simhash_bands(c: Column): Column =
    GraftShim.column(SimHashBands(GraftShim.expression(c)))
}
